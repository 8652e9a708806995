"""Oracle-fixture parity tests (VERDICT r2 item 9).

`scripts/gen_oracle_fixtures.py` (run in an environment WITH pycocotools /
torchvision) writes `tests/fixtures/oracle_fixtures.npz` holding the oracles'
exact outputs for fixed seeded inputs; these tests assert bit parity whenever
the file is present, making the "identical to pycocotools" claims verifiable
in this TPU image (which ships neither oracle package).

Independent of the fixture file, this module also cross-checks roi_align
against a from-scratch NUMPY reference written directly from the torchvision
RoIAlign(aligned=True) definition — two independently-derived implementations
agreeing is the strongest oracle available in-image — and pins hand-derived
pycocotools RLE strings (worked symbol by symbol from maskApi.c rleToString's
5-bit/continuation encoding with position>=3 delta coding).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "oracle_fixtures.npz")


def _load():
    if not os.path.exists(FIXTURES):
        pytest.skip("oracle fixture file not generated yet "
                    "(scripts/gen_oracle_fixtures.py)")
    return np.load(FIXTURES)


def test_rle_fixture_parity():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import gen_oracle_fixtures as gen
    from video_knet_tpu.data.rle import encode_mask

    fx = _load()
    if "rle_counts_0" not in fx:
        pytest.skip("fixtures lack pycocotools outputs")
    for i, m in enumerate(gen.fixture_masks()):
        ours = encode_mask(m)
        ref_counts = fx[f"rle_counts_{i}"].tobytes().decode("ascii")
        assert ours["counts"] == ref_counts, f"mask {i}"
        assert ours["size"] == list(fx[f"rle_size_{i}"])


def test_polygon_fixture_parity():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import gen_oracle_fixtures as gen
    from video_knet_tpu.data.polygon import polygons_to_mask

    fx = _load()
    if "poly_mask_0" not in fx:
        pytest.skip("fixtures lack pycocotools outputs")
    for i, (polys, h, w) in enumerate(gen.fixture_polygons()):
        ours = polygons_to_mask(polys, h, w)
        np.testing.assert_array_equal(ours.astype(np.uint8),
                                      fx[f"poly_mask_{i}"], err_msg=f"case {i}")


def test_roi_align_fixture_parity():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import gen_oracle_fixtures as gen
    from video_knet_tpu.ops.sampling import roi_align

    fx = _load()
    if "roi_align_out" not in fx:
        pytest.skip("fixtures lack torchvision outputs")
    feat, rois = gen.fixture_roi_inputs()
    ours = roi_align(
        jnp.asarray(feat[0].transpose(1, 2, 0)), jnp.asarray(rois[:, 1:]),
        out_size=7, sampling_ratio=2, aligned=True,
    )
    ref = fx["roi_align_out"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# in-image oracles (no external packages)


def _roi_align_numpy(feat, rois, out=7, s=2):
    """torchvision RoIAlign(aligned=True) written independently in numpy:
    per output bin, average s*s bilinear samples at (bin + (k+0.5)/s)/out
    positions of the half-pixel-shifted box."""
    h, w, c = feat.shape
    res = np.zeros((len(rois), out, out, c), np.float32)

    def sample(y, x):
        y0 = int(np.floor(y)); x0 = int(np.floor(x))
        acc = np.zeros(c, np.float32)
        for (yy, wy) in ((y0, 1 - (y - y0)), (y0 + 1, y - y0)):
            for (xx, wx) in ((x0, 1 - (x - x0)), (x0 + 1, x - x0)):
                # torchvision: sample points outside the map contribute 0,
                # but coords are pre-clamped to [-1, size] then clipped
                if yy < 0 or yy >= h or xx < 0 or xx >= w:
                    continue
                acc += wy * wx * feat[yy, xx]
        return acc

    for r, (x0, y0, x1, y1) in enumerate(rois):
        x0 -= 0.5; y0 -= 0.5; x1 -= 0.5; y1 -= 0.5
        bh = max(y1 - y0, 1e-6); bw = max(x1 - x0, 1e-6)
        for by in range(out):
            for bx in range(out):
                acc = np.zeros(c, np.float32)
                for ky in range(s):
                    for kx in range(s):
                        y = y0 + bh * (by + (ky + 0.5) / s) / out
                        x = x0 + bw * (bx + (kx + 0.5) / s) / out
                        # replicate torchvision's coordinate clamping
                        if y < -1.0 or y > h or x < -1.0 or x > w:
                            continue
                        acc += sample(min(max(y, 0.0), h - 1),
                                      min(max(x, 0.0), w - 1))
                res[r, by, bx] = acc / (s * s)
    return res


def test_roi_align_vs_independent_numpy_reference():
    rng = np.random.RandomState(3)
    feat = rng.randn(8, 24, 4).astype(np.float32)
    rois = np.array(
        [[2.0, 1.0, 20.0, 6.5], [0.0, 0.0, 23.0, 7.0], [5.25, 2.5, 9.75, 5.0]],
        np.float32,
    )
    from video_knet_tpu.ops.sampling import roi_align

    ours = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), out_size=7,
                  sampling_ratio=2, aligned=True)
    )
    ref = _roi_align_numpy(feat, rois)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_rle_hand_derived_strings():
    """pycocotools rleToString worked by hand (maskApi.c): 5-bit groups,
    bit 0x20 marks continuation, +48 ASCII offset, counts delta-coded from
    the 3rd element on."""
    from video_knet_tpu.data.rle import encode_mask

    # all-ones 5x4: counts [0, 20] -> '0' + (20 -> 'd' cont, 0 -> '0')
    assert encode_mask(np.ones((5, 4), np.uint8))["counts"] == "0d0"
    # all-zeros 3x3: counts [9] -> 9 -> chr(48+9) = '9'
    assert encode_mask(np.zeros((3, 3), np.uint8))["counts"] == "9"
    # single pixel at (0,0) of 2x2: counts [0,1,3] -> '0','1','3'
    #   (delta coding only starts at the 4th count, maskApi.c `if(i>2)`)
    m = np.zeros((2, 2), np.uint8)
    m[0, 0] = 1
    assert encode_mask(m)["counts"] == "013"
