from video_knet_tpu.ops.losses import (
    dice_loss,
    sigmoid_focal_loss,
    binary_cross_entropy,
    softmax_cross_entropy,
    multi_pos_cross_entropy,
    l2_track_aux_loss,
)
from video_knet_tpu.ops.hungarian import hungarian_cost_matrix
from video_knet_tpu.ops.mask_pool import mask_pool
