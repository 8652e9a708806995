"""video_knet_tpu: a TPU-native (JAX/XLA/Pallas) video segmentation framework.

A from-scratch rebuild of the capabilities of Video K-Net (CVPR 2022): unified
kernel-based video panoptic (VPS), video semantic (VSS), and video instance (VIS)
segmentation. Design is TPU-first: NHWC layouts, static shapes with fixed GT slots,
batched/vmapped heads, on-device Hungarian matching, and pjit data parallelism over a
`jax.sharding.Mesh`.

Reference behavior (not code) is documented against lxtGH/Video-K-Net file:line in
each module's docstrings.
"""

__version__ = "0.1.0"
