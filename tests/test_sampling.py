"""RoIAlign / deformable sampling ops vs torchvision oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_knet_tpu.ops.sampling import bilinear_sample, ms_deform_attn_core, roi_align


def test_bilinear_sample_exact_points():
    feat = jnp.arange(12, dtype=jnp.float32).reshape(3, 4, 1)
    v = bilinear_sample(feat, jnp.array([1.0]), jnp.array([2.0]))
    assert float(v[0, 0]) == 6.0
    # midpoint between (0,0) and (0,1)
    v = bilinear_sample(feat, jnp.array([0.0]), jnp.array([0.5]))
    assert float(v[0, 0]) == 0.5
    # out of bounds -> 0 contribution
    v = bilinear_sample(feat, jnp.array([-1.0]), jnp.array([0.0]))
    assert float(v[0, 0]) == 0.0


def test_roi_align_matches_torchvision():
    tv = pytest.importorskip("torchvision.ops")
    import torch

    rng = np.random.RandomState(0)
    feat = rng.randn(16, 20, 3).astype(np.float32)
    rois = np.array([[1.0, 2.0, 14.0, 12.0], [0.0, 0.0, 8.0, 8.0]], np.float32)
    ours = roi_align(jnp.asarray(feat), jnp.asarray(rois), out_size=7,
                     sampling_ratio=2, aligned=True)
    t_feat = torch.from_numpy(feat.transpose(2, 0, 1))[None]
    t_rois = torch.cat([torch.zeros(2, 1), torch.from_numpy(rois)], dim=1)
    ref = tv.roi_align(t_feat, t_rois, output_size=7, sampling_ratio=2, aligned=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_ms_deform_attn_center_sampling():
    # one level, weights concentrated on one point at the center of a pixel
    b, q, m, l, p, d = 1, 2, 2, 1, 2, 4
    h, w = 6, 8
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(b, h, w, m, d).astype(np.float32))
    # sample exactly pixel (2, 3): normalized x = (3+0.5)/w, y = (2+0.5)/h
    loc = jnp.tile(
        jnp.asarray([[(3 + 0.5) / w, (2 + 0.5) / h]], jnp.float32), (b * q * m * l * p, 1)
    ).reshape(b, q, m, l, p, 2)
    wts = jnp.zeros((b, q, m, l, p)).at[..., 0].set(1.0)
    out = ms_deform_attn_core([v], loc, wts)
    expect = np.asarray(v[0, 2, 3]).reshape(-1)  # [M*D]
    np.testing.assert_allclose(np.asarray(out[0, 0]), expect, atol=1e-5)


def test_msdeform_pixel_decoder_shapes():
    from video_knet_tpu.models.msdeform_decoder import MSDeformAttnPixelDecoder

    feats = [
        jnp.zeros((1, 16, 24, 256)),
        jnp.zeros((1, 8, 12, 256)),
        jnp.zeros((1, 4, 6, 256)),
        jnp.zeros((1, 2, 3, 256)),
    ]
    dec = MSDeformAttnPixelDecoder(num_layers=1)
    vars_ = dec.init(jax.random.PRNGKey(0), feats)
    outs = dec.apply(vars_, feats)
    assert [o.shape for o in outs] == [f.shape for f in feats]
