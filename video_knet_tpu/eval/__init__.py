from video_knet_tpu.eval.vpq import vpq_stats, vpq_from_stats, VPQStats
from video_knet_tpu.eval.stq import STQuality, DSTQuality
from video_knet_tpu.eval.miou import ConfusionMeter
