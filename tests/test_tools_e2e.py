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
