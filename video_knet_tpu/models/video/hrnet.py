"""HRNet appearance encoder for the UniTrack zoo (hrnet_w18 / hrnet_w32).

Rebuild of unitrack/model/hrnet.py:1-610 (HighResolutionNet + the w18/w32
configs at :522-600 and get_cls_net:601): the last encoder of the frozen
appearance-model zoo (model.py:135-136 routes any 'hrnet*' model_type here
with a `return_stage` pick). Four stages of parallel multi-resolution
branches (strides 4/8/16/32) with repeated cross-resolution fusion, then the
classification head's incremental Bottleneck+downsample chain; the forward
returns `y_out[return_stage]` bilinearly resized to the stride-8 map
(hrnet.py:477-500 — the classifier/final_layer are dead code there too).

TPU-first notes: NHWC throughout; BN always in running-average mode (the zoo
is frozen at inference, model.py freezes params); every branch/module loop is
a static Python loop traced once under jit; the nearest upsample in the fuse
layers is an exact jnp.repeat (integer factors only, same as
nn.Upsample(mode='nearest')). Weights ride as a jit ARGUMENT via
appearance.make_appearance_fn (remote-compile payload rule, inference.py).
Submodules are named so utils/checkpoint.import_torch_hrnet can map the
reference state_dict mechanically (oracle-tested in tests/test_hrnet.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.models.resnet import BottleneckBlock
from video_knet_tpu.models.video.appearance import BasicBlock

Array = jax.Array

# stage layout shared by w18/w32 (unitrack/model/hrnet.py:522-600): branch
# widths are width * 2^i; (num_modules, num_blocks) per stage 2..4
HRNET_STAGES = ((1, 4), (4, 4), (3, 4))
HRNET_HEAD_CHANNELS = (32, 64, 128, 256)  # Bottleneck planes (out = 4x)


def _bn(name: str):
    return nn.BatchNorm(
        use_running_average=True, momentum=0.9, epsilon=1e-5, name=name
    )


def _conv3(features: int, stride: int, name: str, use_bias: bool = False):
    return nn.Conv(
        features, (3, 3), strides=(stride, stride),
        padding=[(1, 1), (1, 1)], use_bias=use_bias, name=name,
    )


def _nearest_up(x: Array, factor: int) -> Array:
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


class HRNetEncoder(nn.Module):
    """HighResolutionNet (hrnet.py:263-500), frozen, single NHWC output.

    width: 18 or 32 (the reference ships exactly these two configs).
    return_stage: which head accumulator to return (hrnet.py:495; UniTrack's
    args.return_stage, 2 in the module's own example — stride 16, 512 ch),
    resized bilinear (align_corners=False) to the stride-8 map.
    """

    width: int = 18
    return_stage: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.width
        widths = (w, 2 * w, 4 * w, 8 * w)

        # stem: two stride-2 3x3 convs (hrnet.py:268-274) -> stride 4
        y = _conv3(64, 2, "conv1")(x)
        y = nn.relu(_bn("bn1")(y))
        y = _conv3(64, 2, "conv2")(y)
        y = nn.relu(_bn("bn2")(y))
        y = jax.lax.stop_gradient(y)  # the whole zoo is frozen

        # stage1: 4 Bottlenecks at planes 64 -> 256 channels (hrnet.py:276-280)
        for b in range(4):
            y = BottleneckBlock(features=64, stride=1,
                                name=f"layer1_block{b}")(y)

        # transition1 (hrnet.py:282-289): 256 -> [w, 2w]; branch 0 is a 3x3
        # conv (channels differ), branch 1 a stride-2 3x3 chain from the same
        # stage-1 map
        xs = [
            nn.relu(_bn("transition1_0_bn")(
                _conv3(widths[0], 1, "transition1_0_conv")(y)
            )),
            nn.relu(_bn("transition1_1_0_bn")(
                _conv3(widths[1], 2, "transition1_1_0_conv")(y)
            )),
        ]

        # stages 2..4: (modules, blocks) per HRNET_STAGES; each new stage
        # first grows a branch from the LAST branch of the previous stage
        # (hrnet.py:453-467 applies transitions to y_list[-1]; for these
        # configs only the new branch has a transition — existing-branch
        # channels always match)
        for s, (num_modules, num_blocks) in enumerate(HRNET_STAGES, start=2):
            n_branches = s  # stage2: 2 branches ... stage4: 4 branches
            if s > 2:
                xs.append(
                    nn.relu(_bn(f"transition{s - 1}_{s - 1}_0_bn")(
                        _conv3(widths[s - 1], 2,
                               f"transition{s - 1}_{s - 1}_0_conv")(xs[-1])
                    ))
                )
            for m in range(num_modules):
                # branches (hrnet.py:145-177)
                for b in range(n_branches):
                    for k in range(num_blocks):
                        xs[b] = BasicBlock(
                            features=widths[b], stride=1,
                            name=f"stage{s}_m{m}_b{b}_block{k}",
                        )(xs[b])
                # full multi-scale fuse (hrnet.py:179-253): every output i
                # sums every branch j, upsampling (1x1 conv + bn + nearest)
                # when j > i and downsampling (stride-2 3x3 chains) when j < i
                fused = []
                for i in range(n_branches):
                    acc = None
                    for j in range(n_branches):
                        if j == i:
                            t = xs[j]
                        elif j > i:
                            t = _bn(f"stage{s}_m{m}_fuse{i}_{j}_bn")(
                                nn.Conv(widths[i], (1, 1), use_bias=False,
                                        name=f"stage{s}_m{m}_fuse{i}_{j}_conv"
                                        )(xs[j])
                            )
                            t = _nearest_up(t, 2 ** (j - i))
                            # crop to the target map (the reference center-
                            # crops odd overhangs, hrnet.py:243-248; with the
                            # even input sizes serving pads to, the upsample
                            # is exact and this is a no-op)
                            th, tw = xs[i].shape[1], xs[i].shape[2]
                            oh = (t.shape[1] - th) // 2
                            ow = (t.shape[2] - tw) // 2
                            t = t[:, oh:oh + th, ow:ow + tw, :]
                        else:  # j < i: i-j stride-2 convs
                            t = xs[j]
                            for k in range(i - j):
                                last = k == i - j - 1
                                cout = widths[i] if last else widths[j]
                                t = _bn(
                                    f"stage{s}_m{m}_fuse{i}_{j}_{k}_bn"
                                )(_conv3(
                                    cout, 2,
                                    f"stage{s}_m{m}_fuse{i}_{j}_{k}_conv",
                                )(t))
                                if not last:
                                    t = nn.relu(t)
                        acc = t if acc is None else acc + t
                    fused.append(nn.relu(acc))
                xs = fused
            xs = [jax.lax.stop_gradient(v) for v in xs]

        # classification head (hrnet.py:320-368 / 488-495): per-branch incre
        # Bottleneck to (128, 256, 512, 1024) ch, then chained stride-2
        # downsample adds; final_layer/classifier are unused by the forward
        y_out = [
            BottleneckBlock(features=HRNET_HEAD_CHANNELS[i], stride=1,
                            name=f"incre{i}_block0")(xs[i])
            for i in range(4)
        ]
        acc = y_out[0]
        outs = [acc]
        for i in range(3):
            d = _conv3(HRNET_HEAD_CHANNELS[i + 1] * 4, 2,
                       f"downsamp{i}_conv", use_bias=True)(acc)
            d = nn.relu(_bn(f"downsamp{i}_bn")(d))
            acc = y_out[i + 1] + d
            outs.append(acc)

        ret = outs[self.return_stage]
        n, th, tw, c = (ret.shape[0], outs[1].shape[1], outs[1].shape[2],
                        ret.shape[3])
        if ret.shape[1] != th or ret.shape[2] != tw:
            # F.interpolate(..., mode='bilinear', align_corners=False)
            ret = jax.image.resize(ret, (n, th, tw, c), method="linear")
        return jax.lax.stop_gradient(ret)
