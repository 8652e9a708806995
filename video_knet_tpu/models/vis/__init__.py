from video_knet_tpu.models.vis.knet_vis import (
    ClipGT,
    KNetVIS,
    knet_vis_loss,
    vis_decode,
)
