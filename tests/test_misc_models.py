"""MiT backbone, deformable conv, YT-VIS converter."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mit_b0_shapes():
    from video_knet_tpu.models.mit import MixVisionTransformer

    m = MixVisionTransformer(preset="b0")
    x = jnp.zeros((1, 64, 96, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 32), (1, 8, 12, 64), (1, 4, 6, 160), (1, 2, 3, 256),
    ]


def test_deform_conv_zero_offsets_match_conv():
    """With zero offsets (the init), DeformConv == standard conv with the same
    taps/weights (up to boundary handling: bilinear zero-pad == SAME zero-pad)."""
    from video_knet_tpu.models.deform_conv import DeformConv2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 10, 4).astype(np.float32))
    m = DeformConv2d(features=6)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    w = variables["params"]["kernel"]  # [9, C, F]
    wconv = np.asarray(w).reshape(3, 3, 4, 6)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(wconv), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + variables["params"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_ytvis_converter(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from youtubevis2coco import convert

    src = {
        "videos": [
            {"id": 1, "file_names": ["v1/0.jpg", "v1/1.jpg"], "height": 8, "width": 8}
        ],
        "annotations": [
            {
                "video_id": 1,
                "category_id": 5,
                "segmentations": [{"size": [8, 8], "counts": "08"}, None],
                "bboxes": [[0, 0, 4, 4], None],
                "areas": [16, None],
            }
        ],
        "categories": [{"id": 5, "name": "x"}],
    }
    out = convert(src)
    assert len(out["images"]) == 2
    assert len(out["annotations"]) == 1  # None frame dropped
    a = out["annotations"][0]
    assert a["instance_id"] == 1 and a["image_id"] == 1

    # reader accepts the converted json
    from video_knet_tpu.data.ytvis import YouTubeVISDataset

    p = tmp_path / "c.json"
    with open(p, "w") as f:
        json.dump(out, f)
    ds = YouTubeVISDataset(str(p))
    assert len(ds) == 1 and len(ds.videos[0].frames) == 2


def test_grid_sample_matches_torch():
    """grid_sample_bilinear vs torch.nn.functional.grid_sample
    (align_corners=True, zeros padding) — the flow-warp primitive."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from video_knet_tpu.models.sfnet import grid_sample_bilinear

    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    gx = rng.uniform(-1.3, 1.3, (2, 5, 6)).astype(np.float32)
    gy = rng.uniform(-1.3, 1.3, (2, 5, 6)).astype(np.float32)
    ours = grid_sample_bilinear(jnp.asarray(x), jnp.asarray(gx), jnp.asarray(gy))
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1))
    ref = F.grid_sample(
        torch.from_numpy(x).permute(0, 3, 1, 2), grid,
        mode="bilinear", padding_mode="zeros", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_stdc_backbone_shapes():
    from video_knet_tpu.models.sfnet import STDCNet

    m = STDCNet(base=64, layers=(2, 2, 2))  # STDCNet813
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x, mutable=False)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert [o.shape[-1] for o in outs] == [64, 256, 512, 1024]


def test_upernet_align_rpn_forward():
    """ConvKernelHead with the SFNet aligned localization head
    (fpn_type='upernet_align') produces the standard RPN outputs."""
    import dataclasses

    from video_knet_tpu.config import KNetConfig
    from video_knet_tpu.models.knet import KNet

    base = KNetConfig(max_insts=4)
    cfg = dataclasses.replace(
        base, rpn=dataclasses.replace(base.rpn, fpn_type="upernet_align")
    )
    model = KNet(cfg, train=False)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    rpn_out, stage_outs = model.apply(variables, x, mutable=False)
    assert rpn_out.seg_preds.shape[-1] == cfg.num_classes
    assert np.all(np.isfinite(np.asarray(stage_outs[-1].cls_score)))


def test_aligned_module_v2():
    from video_knet_tpu.models.sfnet import AlignedModuleV2PoolingAtten

    m = AlignedModuleV2PoolingAtten(8)
    low = jnp.asarray(np.random.RandomState(0).randn(1, 16, 24, 16), jnp.float32)
    high = jnp.asarray(np.random.RandomState(1).randn(1, 8, 12, 16), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), low, high)
    y = m.apply(v, low, high)
    assert y.shape == (1, 16, 24, 16)
    assert np.all(np.isfinite(np.asarray(y)))
