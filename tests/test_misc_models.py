"""MiT backbone, deformable conv, YT-VIS converter."""

import json

import jax
import jax.numpy as jnp
import numpy as np


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
