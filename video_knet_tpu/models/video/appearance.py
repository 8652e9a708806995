"""UniTrack appearance-model zoo: frozen encoders for mask-pooled embeddings.

Rebuild of unitrack/model/{model.py:11 (AppearanceModel + make_encoder:88),
resnet.py:23 (torchvision ResNet with UniTrack's `modify`: stride-1 layer3/4,
remove_layers), random_feat_generator.py:15}. The "K-Net + UniTrack" baseline
(knet/video/knet_uni_track.py:13, poster table row) runs its tracker on
embeddings pooled from a SEPARATE frozen appearance network over the raw
frame — not from the learned track head — so this module is what makes that
ablation row reproducible.

TPU-first design notes: the encoder is one jitted NHWC forward with the
weight pytree as an ARGUMENT (remote-compile rule, see inference.py); BN is
always in running-average mode (the reference zoo is frozen at inference);
UniTrack's `modify` (resnet.py:27-33: every conv stride in layer3/layer4 set
to 1) keeps the feature map at output stride 8 — implemented structurally
instead of by mutating modules. The 'random' model_type reproduces
RandomFeatGenerator (the reference's only "fake backend",
random_feat_generator.py:15-34) with a counter-folded PRNG so it is
deterministic under jit.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.models.resnet import BottleneckBlock

Array = jax.Array

# torchvision stage depths (unitrack/model/resnet.py:72-82)
APPEARANCE_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
_BASIC_DEPTHS = (18, 34)


class BasicBlock(nn.Module):
    """torchvision BasicBlock (3x3 + 3x3), NHWC, frozen BN.

    Submodules are named conv1/bn1/conv2/bn2/downsample_conv/downsample_bn so
    utils/checkpoint.import_torch_resnet maps torchvision resnet18/34
    state_dicts onto it unchanged."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        # explicit (1,1) padding == torch Conv2d(padding=1): with stride 2,
        # SAME would pad (0,1) and misalign against torchvision checkpoints
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         name="bn2")(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                name="downsample_bn",
            )(residual)
        return nn.relu(y + residual)


class AppearanceResNet(nn.Module):
    """Frozen torchvision-style ResNet with UniTrack's `modify` applied.

    - layer3/layer4 run at stride 1 (unitrack/model/resnet.py:29-33), so the
      output stride stays 8 after layer2;
    - `remove_layers` drops trailing stages (model.py:141-142 via
      args.remove_layers; UniTrack configs remove 'layer4' for resnet
      encoders so embeddings come from the stride-8 layer3 map).

    Returns ONE NHWC feature map (the reference forward returns the last
    surviving stage, resnet.py:50-61).
    """

    depth: int = 18
    remove_layers: Sequence[str] = ("layer4",)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        blocks = APPEARANCE_STAGE_BLOCKS[self.depth]
        basic = self.depth in _BASIC_DEPTHS
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        y = jax.lax.stop_gradient(y)  # the whole zoo is frozen
        widths = (64, 128, 256, 512)
        for s, (w, n_blocks) in enumerate(zip(widths, blocks), start=1):
            if f"layer{s}" in self.remove_layers:
                break
            for b in range(n_blocks):
                # torchvision strides are 1,2,2,2; UniTrack's modify forces
                # layer3/layer4 back to 1 — only layer2 ever downsamples here
                stride = 2 if (b == 0 and s == 2) else 1
                if basic:
                    y = BasicBlock(features=w, stride=stride,
                                   name=f"layer{s}_block{b}")(y)
                else:
                    y = BottleneckBlock(features=w, stride=stride,
                                        use_running_average=True,
                                        name=f"layer{s}_block{b}")(y)
            y = jax.lax.stop_gradient(y)
        return y


class RandomFeatGenerator(nn.Module):
    """unitrack/model/random_feat_generator.py:15-34: uniform random features
    of shape [N, H/down_factor, W/down_factor, dim].

    Deterministic under jit: the key folds in a host-threaded counter so
    repeated calls differ (the reference draws fresh torch.rand each call)."""

    down_factor: int = 8
    dim: int = 128

    @nn.compact
    def __call__(self, x: Array, counter: Array | int = 0) -> Array:
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        key = jax.random.fold_in(jax.random.PRNGKey(0), counter)
        shape = (n, round(h / self.down_factor), round(w / self.down_factor),
                 self.dim)
        return jax.random.uniform(key, shape, jnp.float32)


def make_appearance_model(model_type: str, **kwargs) -> nn.Module:
    """unitrack/model/model.py:88 (make_encoder) — by-name zoo constructor.

    'resnet18'/'resnet34'/'resnet50' (a.k.a. the reference's random18/
    imagenet18/... — pretraining is a checkpoint concern, see
    utils/checkpoint.import_torch_resnet), 'hrnet_w18'/'hrnet_w32'
    (model.py:135-136 routes any 'hrnet' in model_type to hrnet.get_cls_net;
    pretrained checkpoints import via utils/checkpoint.import_torch_hrnet)
    and 'random'."""
    if model_type.startswith("resnet"):
        return AppearanceResNet(depth=int(model_type[len("resnet"):]), **kwargs)
    if "hrnet" in model_type:
        from video_knet_tpu.models.video.hrnet import HRNetEncoder

        return HRNetEncoder(width=int(model_type.rsplit("w", 1)[-1]), **kwargs)
    if model_type == "random":
        return RandomFeatGenerator(**kwargs)
    raise ValueError(f"unknown appearance model_type: {model_type}")


def make_appearance_fn(model: nn.Module, variables):
    """Jitted frozen forward: fn(img_nhwc) -> [N, h, w, C] feature map.

    Weights ride as a jit argument (remote-compile payload rule). The random
    generator threads a host counter so successive frames differ."""
    counter = {"n": 0}
    if isinstance(model, RandomFeatGenerator):
        @jax.jit
        def _fwd(vars_, img, c):
            return model.apply(vars_, img, c)

        def fn(img):
            c = counter["n"]
            counter["n"] += 1
            return _fwd(variables, img, jnp.asarray(c))

        return fn

    @jax.jit
    def _fwd(vars_, img):
        return model.apply(vars_, img)

    def fn(img):
        return _fwd(variables, img)

    return fn


def init_appearance(model: nn.Module, hw=(64, 64)):
    """Initialize variables for an appearance encoder (random weights — the
    'random18'/'random50' rows of the reference zoo; pretrained checkpoints
    import via utils/checkpoint.import_torch_resnet)."""
    img = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    return model.init(jax.random.PRNGKey(0), img)
