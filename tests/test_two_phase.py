"""Two-phase transfer: image K-Net pretrain checkpoint -> Video K-Net init.

Mirrors the reference workflow (README.md:59-80): pretrain the image model,
save, then --load-from it into the video model (heads remapped, tracking layers
fresh)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_knet_tpu.config import KNetConfig, VideoKNetConfig
from video_knet_tpu.models.knet import KNet
from video_knet_tpu.models.video.knet_vps import VideoKNet
from video_knet_tpu.utils.checkpoint import (
    image_to_video_params,
    merge_params,
    restore_checkpoint,
    save_checkpoint,
)


def test_image_ckpt_loads_into_video_model(tmp_path):
    img_cfg = KNetConfig(max_insts=4)
    image_model = KNet(img_cfg, train=False)
    x = jnp.zeros((1, 64, 96, 3))
    image_vars = image_model.init(jax.random.PRNGKey(1), x)
    path = save_checkpoint(str(tmp_path / "image_ckpt"),
                           {"params": image_vars["params"],
                            "batch_stats": image_vars["batch_stats"]})

    # note: the video config differs only in strides/linking; same param shapes
    vid_cfg = VideoKNetConfig(max_insts=4)
    video_model = VideoKNet(vid_cfg, train=False)
    video_vars = video_model.init(jax.random.PRNGKey(2), x, x)

    loaded = restore_checkpoint(path)
    remapped = image_to_video_params(loaded["params"])
    merged = merge_params(video_vars["params"], remapped)

    # detector weights transferred...
    np.testing.assert_allclose(
        np.asarray(merged["rpn_head"]["init_kernels"]),
        np.asarray(image_vars["params"]["rpn_head"]["init_kernels"]),
    )
    np.testing.assert_allclose(
        np.asarray(merged["mask_head_0"]["fc_mask"]["kernel"]),
        np.asarray(image_vars["params"]["roi_head"]["mask_head_0"]["fc_mask"]["kernel"]),
    )
    # ...tracking layers stay fresh (video init)
    np.testing.assert_allclose(
        np.asarray(merged["track_embed"]["fc_embed"]["kernel"]),
        np.asarray(video_vars["params"]["track_embed"]["fc_embed"]["kernel"]),
    )

    out = video_model.apply(
        {"params": merged,
         "batch_stats": merge_params(video_vars["batch_stats"],
                                     loaded["batch_stats"])},
        x, x, mutable=False,
    )
    assert np.all(np.isfinite(np.asarray(out[2])))
