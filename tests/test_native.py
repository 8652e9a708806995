"""Native C++ codec tests (built on demand; skipped if the toolchain is absent)."""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from video_knet_tpu.native.build import build


@pytest.fixture(scope="module")
def native():
    if build() is None:
        pytest.skip("native toolchain unavailable")
    from video_knet_tpu.native import png_codec

    return png_codec


def test_png_rgb_gray_16bit(native, tmp_path):
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (37, 53, 3), np.uint8)
    Image.fromarray(rgb).save(tmp_path / "a.png")
    np.testing.assert_array_equal(native.read_png(str(tmp_path / "a.png")), rgb)

    g = rng.randint(0, 255, (21, 33), np.uint8)
    Image.fromarray(g).save(tmp_path / "g.png")
    np.testing.assert_array_equal(native.read_png(str(tmp_path / "g.png")), g)

    d16 = rng.randint(0, 65535, (19, 23)).astype(np.uint16)
    Image.fromarray(d16).save(tmp_path / "d.png")
    out = native.read_png(str(tmp_path / "d.png"))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, d16)


def test_rle_native_matches_python(native):
    # force the pure-python path by computing it inline
    rng = np.random.RandomState(1)
    for _ in range(5):
        m = (rng.rand(40, 60) > 0.5).astype(np.uint8)
        flat = m.flatten(order="F")
        change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
        bounds = np.concatenate([[0], change, [flat.size]])
        ref = np.diff(bounds)
        if flat[0] == 1:
            ref = np.concatenate([[0], ref])
        np.testing.assert_array_equal(native.rle_encode_counts(m), ref)
