"""Build the native codecs: python -m video_knet_tpu.native.build"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "png_codec.cpp")
LIB = os.path.join(HERE, "libvknet_native.so")


def build(force: bool = False) -> str | None:
    if not force and os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC, "-o", LIB, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"native build failed: {msg}", file=sys.stderr)
        return None
    return LIB


if __name__ == "__main__":
    out = build(force=True)
    print(out or "FAILED")
    sys.exit(0 if out else 1)
