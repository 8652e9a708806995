"""Full K-Net torch-checkpoint importer: structural merge + MHA math oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def randn(*shape):
    # small weights so the 3-stage forward with a random "checkpoint" stays finite
    return torch.randn(*shape) * 0.05


def _bn(sd, pre, c):
    sd[pre + ".weight"] = randn(c)
    sd[pre + ".bias"] = randn(c)
    sd[pre + ".running_mean"] = randn(c)
    sd[pre + ".running_var"] = torch.rand(c) + 0.5


def _resnet50_sd(sd):
    sd["backbone.conv1.weight"] = randn(64, 3, 7, 7)
    _bn(sd, "backbone.bn1", 64)
    blocks = {1: (3, 64), 2: (4, 128), 3: (6, 256), 4: (3, 512)}
    for s, (n, w) in blocks.items():
        cin = 64 if s == 1 else w * 2
        for b in range(n):
            pre = f"backbone.layer{s}.{b}"
            in_c = cin if b == 0 else w * 4
            sd[pre + ".conv1.weight"] = randn(w, in_c, 1, 1)
            _bn(sd, pre + ".bn1", w)
            sd[pre + ".conv2.weight"] = randn(w, w, 3, 3)
            _bn(sd, pre + ".bn2", w)
            sd[pre + ".conv3.weight"] = randn(w * 4, w, 1, 1)
            _bn(sd, pre + ".bn3", w * 4)
            if b == 0:
                sd[pre + ".downsample.0.weight"] = randn(w * 4, in_c, 1, 1)
                _bn(sd, pre + ".downsample.1", w * 4)


def _lin(sd, pre, i, o, bias=True):
    sd[pre + ".weight"] = randn(o, i)
    if bias:
        sd[pre + ".bias"] = randn(o)


def _ln(sd, pre, c):
    sd[pre + ".weight"] = randn(c)
    sd[pre + ".bias"] = randn(c)


def _convmod(sd, pre, i, o, k=3, gn=True, bias=False):
    sd[pre + ".conv.weight"] = randn(o, i, k, k)
    if bias:
        sd[pre + ".conv.bias"] = randn(o)
    if gn:
        sd[pre + ".gn.weight"] = randn(o)
        sd[pre + ".gn.bias"] = randn(o)


def build_reference_sd(num_classes=19, num_stages=3):
    c = 256
    sd = {}
    _resnet50_sd(sd)
    for i, cin in enumerate((256, 512, 1024, 2048)):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = randn(c, cin, 1, 1)
        sd[f"neck.lateral_convs.{i}.conv.bias"] = randn(c)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = randn(c, c, 3, 3)
        sd[f"neck.fpn_convs.{i}.conv.bias"] = randn(c)
    sd["rpn_head.init_kernels.weight"] = randn(100, c, 1, 1)
    sd["rpn_head.conv_seg.weight"] = randn(num_classes, c, 1, 1)
    sd["rpn_head.conv_seg.bias"] = randn(num_classes)
    _convmod(sd, "rpn_head.loc_convs.0", c, c, k=1)
    _convmod(sd, "rpn_head.seg_convs.0", c, c, k=1)
    fpre = "rpn_head.localization_fpn"
    _convmod(sd, fpre + ".convs_all_levels.0.conv0", c, c)
    for i in range(1, 4):
        for j in range(i):
            _convmod(sd, fpre + f".convs_all_levels.{i}.conv{j}", c, c)
    _convmod(sd, fpre + ".conv_pred", c, c, k=1)
    _convmod(sd, fpre + ".aux_convs.0", c, c, k=1)
    for s in range(num_stages):
        pre = f"roi_head.mask_head.{s}"
        sd[pre + ".feat_transform.conv.weight"] = randn(c, c, 1, 1)
        sd[pre + ".feat_transform.conv.bias"] = randn(c)
        ku = pre + ".kernel_update_conv"
        _lin(sd, ku + ".dynamic_layer", c, 2 * c)
        _lin(sd, ku + ".input_layer", c, 2 * c)
        _lin(sd, ku + ".input_gate", c, c)
        _lin(sd, ku + ".update_gate", c, c)
        _lin(sd, ku + ".fc_layer", c, c)
        for ln in ("norm_in", "norm_out", "input_norm_in", "input_norm_out",
                   "fc_norm"):
            _ln(sd, f"{ku}.{ln}", c)
        sd[pre + ".attention.attn.in_proj_weight"] = randn(3 * c, c)
        sd[pre + ".attention.attn.in_proj_bias"] = randn(3 * c)
        sd[pre + ".attention.attn.out_proj.weight"] = randn(c, c)
        sd[pre + ".attention.attn.out_proj.bias"] = randn(c)
        _ln(sd, pre + ".attention_norm", c)
        _lin(sd, pre + ".ffn.layers.0.0", c, 2048)
        _lin(sd, pre + ".ffn.layers.1", 2048, c)
        _ln(sd, pre + ".ffn_norm", c)
        for br in ("cls_fcs", "mask_fcs"):
            _lin(sd, f"{pre}.{br}.0", c, c, bias=False)
            _ln(sd, f"{pre}.{br}.1", c)
        _lin(sd, pre + ".fc_cls", c, num_classes)
        _lin(sd, pre + ".fc_mask", c, c)
    return sd


def add_joint_train_sd(sd, num_stages=3):
    """Linking + track-embed keys of a joint-train VPS checkpoint
    (joint_train.py:114-126, track_heads.py:600-642; link layers replicated
    over all stages by the reference config)."""
    c = 256
    for s in range(num_stages):
        pre = f"roi_head.mask_head.{s}"
        sd[pre + ".attention_previous.attn.in_proj_weight"] = randn(3 * c, c)
        sd[pre + ".attention_previous.attn.in_proj_bias"] = randn(3 * c)
        sd[pre + ".attention_previous.attn.out_proj.weight"] = randn(c, c)
        sd[pre + ".attention_previous.attn.out_proj.bias"] = randn(c)
        _ln(sd, pre + ".attention_previous_norm", c)
        _lin(sd, pre + ".link_ffn.layers.0.0", c, 2048)
        _lin(sd, pre + ".link_ffn.layers.1", 2048, c)
        _ln(sd, pre + ".link_ffn_norm", c)
    _lin(sd, "embed_fcs.0", c, c, bias=False)
    _ln(sd, "embed_fcs.1", c)
    _lin(sd, "fc_embed", c, c)
    _lin(sd, "track_head.fcs.0", c, c)
    _lin(sd, "track_head.fcs.1", c, c)
    _lin(sd, "track_head.fc_embed", c, c)


def test_import_joint_train_full_and_strict():
    """A full joint-train state_dict (detector+link+embed) imports with ZERO
    unconsumed keys and structurally merges into VideoKNet."""
    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.utils.checkpoint import merge_params
    from video_knet_tpu.utils.torch_import import import_torch_knet

    sd = build_reference_sd()
    add_joint_train_sd(sd)
    # buffers that real torch checkpoints carry and importers must tolerate
    sd["backbone.bn1.num_batches_tracked"] = torch.tensor(100)
    params, stats = import_torch_knet(sd, strict=True)  # raises if unconsumed
    assert "track_embed" in params
    assert "attention_previous" in params["roi_head"]["mask_head_2"]
    assert "attention_previous" not in params["roi_head"]["mask_head_0"]

    cfg = VideoKNetConfig(max_insts=4)
    model = VideoKNet(cfg, train=False)
    img = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), img, img)
    video_params = dict(params)
    for name, head in video_params.pop("roi_head").items():
        video_params[name] = head
    merged = merge_params(variables["params"], video_params)
    # track-embed weights landed and round-trip numerically
    np.testing.assert_allclose(
        np.asarray(merged["track_embed"]["fc_embed"]["kernel"]),
        sd["fc_embed.weight"].numpy().T,
    )
    emb = model.apply(
        {"params": merged, "batch_stats": variables["batch_stats"]},
        jnp.ones((2, 5, 256)),
        method=lambda m, x: m.track_embed(x),
    )
    assert np.all(np.isfinite(np.asarray(emb))) and emb.shape == (2, 5, 256)


def test_import_strict_flags_unknown_keys():
    from video_knet_tpu.utils.torch_import import import_torch_knet

    sd = build_reference_sd()
    sd["rpn_head.some_new_layer.weight"] = randn(4, 4)
    with pytest.raises(KeyError):
        import_torch_knet(sd, strict=True)


def test_import_knet_structural():
    from video_knet_tpu.config import KNetConfig
    from video_knet_tpu.models.knet import KNet
    from video_knet_tpu.utils.checkpoint import merge_params
    from video_knet_tpu.utils.torch_import import import_torch_knet

    cfg = KNetConfig(max_insts=4)
    model = KNet(cfg, train=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    sd = build_reference_sd()
    params, stats = import_torch_knet(sd)
    merged = merge_params(variables["params"], params)  # raises on shape mismatch
    merged_stats = merge_params(variables["batch_stats"], stats)

    # every imported leaf must exist in the model tree (no orphan keys)
    def count(t):
        return len(jax.tree_util.tree_leaves(t))
    assert count(params) > 300

    out = model.apply(
        {"params": merged, "batch_stats": merged_stats},
        jnp.zeros((1, 64, 96, 3)), mutable=False,
    )
    for so in out[1]:
        assert np.all(np.isfinite(np.asarray(so.cls_score)))

    # spot-check: init kernels extracted from the 1x1 conv weight
    np.testing.assert_allclose(
        np.asarray(merged["rpn_head"]["init_kernels"]),
        sd["rpn_head.init_kernels.weight"].numpy()[:, :, 0, 0],
    )


def test_mha_import_matches_torch():
    """Imported attention params reproduce torch MultiheadAttention outputs."""
    import torch.nn as tnn
    from flax import linen as nn
    from video_knet_tpu.utils.torch_import import _mha

    c, heads, n, b = 32, 4, 6, 2
    torch.manual_seed(0)
    tm = tnn.MultiheadAttention(c, heads, batch_first=True)
    x = torch.randn(b, n, c)
    with torch.no_grad():
        ref, _ = tm(x, x, x, need_weights=False)

    sd = {f"attn.{k}": v for k, v in tm.state_dict().items()}
    out: dict = {}
    _mha(sd, "attn", ("mha",), out, heads)

    fm = nn.MultiHeadDotProductAttention(num_heads=heads, qkv_features=c)
    xj = jnp.asarray(x.numpy())
    y = fm.apply({"params": out["mha"]}, xj, xj)
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=2e-5)


def test_import_joint_train_swin_backbone_dispatch():
    """A joint-train checkpoint with a SWIN backbone (the Swin-B VIP-Seg /
    KITTI swin configs) routes backbone.* through import_torch_swin, imports
    strictly, and merges into VideoKNet(backbone='swin_tiny')."""
    from test_swin_import import build_official_swin_sd

    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.utils.checkpoint import merge_params
    from video_knet_tpu.utils.torch_import import import_torch_knet

    sd = build_reference_sd()
    add_joint_train_sd(sd)
    # swap the resnet backbone + its FPN laterals for swin-tiny ones
    for k in [k for k in sd if k.startswith("backbone.")]:
        del sd[k]
    swin = build_official_swin_sd("tiny")
    del swin["head.weight"], swin["head.bias"]
    del swin["norm.weight"], swin["norm.bias"]
    for i, dim in enumerate((96, 192, 384, 768)):
        swin[f"norm{i}.weight"] = randn(dim)
        swin[f"norm{i}.bias"] = randn(dim)
    sd.update({"backbone." + k: v for k, v in swin.items()})
    for i, cin in enumerate((96, 192, 384, 768)):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = randn(256, cin, 1, 1)

    params, stats = import_torch_knet(sd, strict=True)
    assert stats == {}  # layernorm backbone: no batch stats
    assert "stage2_pairs" in params["backbone"]

    cfg = VideoKNetConfig(max_insts=4, backbone="swin_tiny")
    model = VideoKNet(cfg, train=False)
    img = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), img, img)
    video_params = dict(params)
    for name, head in video_params.pop("roi_head").items():
        video_params[name] = head
    merged = merge_params(variables["params"], video_params)
    np.testing.assert_allclose(
        np.asarray(
            merged["backbone"]["stage0_pairs"]["blk0"]["attn"]["qkv"]["kernel"][0]
        ),
        sd["backbone.layers.0.blocks.0.attn.qkv.weight"].numpy().T,
    )
