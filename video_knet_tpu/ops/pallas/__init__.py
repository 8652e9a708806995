from video_knet_tpu.ops.pallas.mask_ops import (
    fused_mask_pool,
    fused_assemble_sigmoid,
    pallas_available,
)
