"""End-to-end CLI pipeline: online VPS inference -> PNG dumps -> VPQ/STQ eval.

Drives tools/test_step.py, tools/eval_dvpq.py and tools/eval_stq.py in-process
on a tiny synthetic KITTI-STEP tree — the full test-time dataflow of the
reference (tools/test_step.py then eval_dvpq_step.py/eval_dstq_step.py)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from tests.test_data import _write_fake_kitti


def _run(mod_name, argv, monkeypatch):
    import importlib

    mod = importlib.import_module(mod_name)
    monkeypatch.setattr(sys, "argv", [mod_name] + argv)
    mod.main()


@pytest.mark.slow
def test_step_then_eval(tmp_path, monkeypatch, capsys):
    _write_fake_kitti(tmp_path / "data", n_seqs=1, n_frames=3, hw=(64, 96))
    # rename split train -> val for the eval defaults
    os.rename(
        tmp_path / "data" / "video_sequence" / "train",
        tmp_path / "data" / "video_sequence" / "val",
    )
    out = tmp_path / "out"
    _run(
        "test_step",
        ["--data-root", str(tmp_path / "data"), "--split", "val",
         "--out", str(out), "--size", "64", "96"],
        monkeypatch,
    )
    seq_dir = out / "panoptic" / "0"
    assert sorted(os.listdir(seq_dir)) == [
        "000000_cat.png", "000000_ins.png",
        "000001_cat.png", "000001_ins.png",
        "000002_cat.png", "000002_ins.png",
    ]
    assert len(os.listdir(out / "final" / "0")) == 3

    _run(
        "eval_dvpq",
        [str(out), "--gt-dir", str(tmp_path / "data" / "video_sequence" / "val"),
         "--eval-frames", "1", "2"],
        monkeypatch,
    )
    printed = capsys.readouterr().out
    assert "k=1: PQ" in printed and "k=2: PQ" in printed

    _run(
        "eval_stq",
        [str(out), "--gt-dir", str(tmp_path / "data" / "video_sequence" / "val")],
        monkeypatch,
    )
    printed = capsys.readouterr().out
    assert "STQ" in printed


@pytest.mark.slow
def test_image_eval_cli(tmp_path, monkeypatch, capsys):
    """tools/test_image.py: per-class PQ/SQ/RQ over a panoptic val split
    (the reference's tools/test.py + kitti_step_dvps.py:190-318 evaluate)."""
    _write_fake_kitti(tmp_path / "data", n_seqs=1, n_frames=2, hw=(64, 96))
    os.rename(
        tmp_path / "data" / "video_sequence" / "train",
        tmp_path / "data" / "video_sequence" / "val",
    )
    _run(
        "test_image",
        ["--data-root", str(tmp_path / "data"), "--split", "val",
         "--size", "64", "96", "--max-insts", "4"],
        monkeypatch,
    )
    printed = capsys.readouterr().out
    assert "person" in printed and "ALL" in printed  # per-class table
    assert '"PQ"' in printed and '"SQ"' in printed and '"RQ"' in printed


def _write_fake_ytvis(root, hw=(64, 96)):
    import json
    import numpy as np
    from PIL import Image
    from video_knet_tpu.data.rle import encode_mask

    root.mkdir(parents=True, exist_ok=True)
    images, annotations = [], []
    img_id = 1
    for v in (1, 2):
        (root / f"v{v}").mkdir(exist_ok=True)
        for f in range(3):
            name = f"v{v}/{f}.png"
            Image.fromarray(
                np.random.RandomState(img_id).randint(0, 255, (*hw, 3), np.uint8)
            ).save(root / name)
            images.append({"id": img_id, "video_id": v, "frame_id": f,
                           "height": hw[0], "width": hw[1], "file_name": name})
            m = np.zeros(hw, np.uint8)
            m[: hw[0] // 2] = 1
            annotations.append({"id": img_id, "image_id": img_id, "video_id": v,
                                "instance_id": v, "category_id": 1,
                                "segmentation": encode_mask(m),
                                "bbox": [0, 0, hw[1], hw[0] // 2]})
            img_id += 1
    data = {"images": images, "annotations": annotations,
            "categories": [{"id": i, "name": f"c{i}"} for i in range(1, 41)],
            "videos": [{"id": 1}, {"id": 2}]}
    p = root / "valid.json"
    with open(p, "w") as fh:
        json.dump(data, fh)
    return p


@pytest.mark.slow
def test_whole_video_vis_submission(tmp_path, monkeypatch):
    import json

    ann = _write_fake_ytvis(tmp_path / "yt")
    out = tmp_path / "vis_out"
    _run(
        "test_whole_video",
        ["--ann-file", str(ann), "--img-root", str(tmp_path / "yt"),
         "--out", str(out), "--clip-len", "2", "--size", "64", "96"],
        monkeypatch,
    )
    results = json.load(open(out / "results.json"))
    assert len(results) > 0
    assert {r["video_id"] for r in results} <= {1, 2}
    assert os.path.exists(out / "submission_file.zip")
    seg = next(s for r in results for s in r["segmentations"] if s is not None)
    assert seg["size"] == [64, 96]


def test_coco_instance_cli(tmp_path, monkeypatch, capsys):
    """tools/test_coco_instance.py: COCO-format image list -> instance decode
    -> segm results json with decodable RLEs (VERDICT r2 item 8 CLI surface)."""
    import json

    from PIL import Image

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(0)
    images = []
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
            imgs / f"im{i}.png"
        )
        images.append({"id": i + 1, "file_name": f"im{i}.png",
                       "height": 48, "width": 64})
    ann = {
        "images": images,
        "categories": [{"id": c, "name": str(c)} for c in (1, 3, 7)],
        "annotations": [],
    }
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    out = tmp_path / "out"
    _run("test_coco_instance", [
        "--ann-file", str(tmp_path / "ann.json"), "--img-root", str(imgs),
        "--size", "64", "96", "--out", str(out),
    ], monkeypatch)
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["n_images"] == 2
    results = json.load(open(out / "coco_segm.json"))
    assert len(results) == 2 * 100  # max_per_img per image
    from video_knet_tpu.data.rle import decode_mask

    e = results[0]
    assert e["category_id"] in (1, 3, 7)
    assert decode_mask(e["segmentation"]).shape == (48, 64)
