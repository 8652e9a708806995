"""Generate committed oracle fixtures for environments without the oracles.

Run this in ANY environment that has pycocotools and/or torchvision; it dumps
`tests/fixtures/oracle_fixtures.npz` with exact oracle outputs for the fixed
inputs the parity tests use. `tests/test_oracle_fixtures.py` asserts our
implementations reproduce them bit-for-bit whenever the file is present, so
the "identical to pycocotools" claims are checkable in this repo's TPU image
(which ships neither package) once the fixtures are committed.

Fixed inputs are generated from seeds, never stored — the fixture file only
holds oracle OUTPUTS (RLE count arrays/strings, rasterized polygon masks,
roi_align tensors).
"""

from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "oracle_fixtures.npz")


def fixture_masks():
    """The fixed binary masks the RLE parity tests encode (seeded)."""
    rng = np.random.RandomState(7)
    masks = []
    m = np.zeros((13, 17), np.uint8)
    m[2:9, 3:12] = 1
    masks.append(m)
    masks.append((rng.rand(24, 31) > 0.6).astype(np.uint8))
    masks.append(np.ones((5, 4), np.uint8))
    masks.append(np.zeros((6, 9), np.uint8))
    big = (rng.rand(64, 96) > 0.5).astype(np.uint8)
    masks.append(big)
    return masks


def fixture_polygons():
    """(polygons, h, w) cases for pycocotools frPyObjects rasterization."""
    return [
        ([[3.0, 2.0, 11.5, 2.0, 11.5, 8.25, 3.0, 8.25]], 13, 17),  # rectangle
        ([[1.0, 1.0, 14.0, 3.0, 7.5, 12.0]], 16, 16),  # triangle
        ([[2.0, 2.0, 9.0, 2.0, 9.0, 9.0, 2.0, 9.0],
          [4.0, 4.0, 7.0, 4.0, 7.0, 7.0, 4.0, 7.0]], 12, 12),  # two rings
    ]


def fixture_roi_inputs():
    rng = np.random.RandomState(3)
    feat = rng.randn(1, 8, 24, 32).astype(np.float32)  # NCHW for torchvision
    rois = np.array(
        [[0, 2.0, 3.0, 20.0, 18.0],
         [0, 0.0, 0.0, 31.0, 23.0],
         [0, 10.5, 4.25, 15.75, 9.5]], np.float32
    )  # (batch_idx, x0, y0, x1, y1)
    return feat, rois


def main():
    out: dict[str, np.ndarray] = {}
    try:
        from pycocotools import mask as cocomask

        for i, m in enumerate(fixture_masks()):
            rle = cocomask.encode(np.asfortranarray(m))
            out[f"rle_counts_{i}"] = np.frombuffer(rle["counts"], np.uint8)
            out[f"rle_size_{i}"] = np.asarray(rle["size"])
        for i, (polys, h, w) in enumerate(fixture_polygons()):
            rles = cocomask.frPyObjects(polys, h, w)
            merged = cocomask.merge(rles)
            out[f"poly_mask_{i}"] = cocomask.decode(merged)
        print("pycocotools fixtures generated")
    except ImportError:
        print("pycocotools not available — skipping RLE/polygon fixtures")
    try:
        import torch
        import torchvision.ops as tvops

        feat, rois = fixture_roi_inputs()
        ref = tvops.roi_align(
            torch.from_numpy(feat), torch.from_numpy(rois),
            output_size=7, sampling_ratio=2, aligned=True,
        )
        out["roi_align_out"] = ref.numpy()
        print("torchvision fixtures generated")
    except ImportError:
        print("torchvision not available — skipping roi_align fixture")
    if not out:
        raise SystemExit("no oracle packages available; nothing written")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, **out)
    print(f"wrote {os.path.abspath(OUT)} with {sorted(out)}")


if __name__ == "__main__":
    main()
