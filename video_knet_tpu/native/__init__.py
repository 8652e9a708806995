"""Native (C++) data-path codecs with ctypes bindings.

`png_codec.read_png` decodes the DVPS datasets' PNGs (8-bit gray/RGB/RGBA,
16-bit gray) off the GIL; `rle_encode_counts` is the fast path behind
video_knet_tpu.data.rle. Both degrade gracefully to pure-python when the shared
library hasn't been built (python -m video_knet_tpu.native.build).
"""
