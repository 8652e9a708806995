"""Official-Swin checkpoint importer: strict consumption + torch math oracles.

Covers the role of the reference's swin_converter + custom load_checkpoint
(/root/reference/swin/ckpt_convert.py:85, swin/swin_checkpoint.py:283): an
official microsoft Swin state_dict must import with zero unconsumed keys and
reproduce the torch forward math (window attention incl. relative position
bias, patch merging slice order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from video_knet_tpu.models.swin import (
    SWIN_PRESETS,
    PatchMerging,
    SwinTransformer,
    WindowAttention,
    relative_position_index,
)


def randn(*shape):
    return torch.randn(*shape) * 0.05


def _ln(sd, pre, c):
    sd[pre + ".weight"] = randn(c)
    sd[pre + ".bias"] = randn(c)


def build_official_swin_sd(preset="tiny", ws=7):
    embed_dim, depths, heads = SWIN_PRESETS[preset]
    sd = {}
    sd["patch_embed.proj.weight"] = randn(embed_dim, 3, 4, 4)
    sd["patch_embed.proj.bias"] = randn(embed_dim)
    _ln(sd, "patch_embed.norm", embed_dim)
    dim = embed_dim
    for i, (d, h) in enumerate(zip(depths, heads)):
        for j in range(d):
            pre = f"layers.{i}.blocks.{j}"
            _ln(sd, pre + ".norm1", dim)
            sd[pre + ".attn.relative_position_bias_table"] = randn(
                (2 * ws - 1) ** 2, h
            )
            sd[pre + ".attn.relative_position_index"] = torch.zeros(
                ws * ws, ws * ws, dtype=torch.long
            )
            sd[pre + ".attn.qkv.weight"] = randn(3 * dim, dim)
            sd[pre + ".attn.qkv.bias"] = randn(3 * dim)
            sd[pre + ".attn.proj.weight"] = randn(dim, dim)
            sd[pre + ".attn.proj.bias"] = randn(dim)
            _ln(sd, pre + ".norm2", dim)
            sd[pre + ".mlp.fc1.weight"] = randn(4 * dim, dim)
            sd[pre + ".mlp.fc1.bias"] = randn(4 * dim)
            sd[pre + ".mlp.fc2.weight"] = randn(dim, 4 * dim)
            sd[pre + ".mlp.fc2.bias"] = randn(dim)
        if i < len(depths) - 1:
            sd[f"layers.{i}.downsample.reduction.weight"] = randn(2 * dim, 4 * dim)
            _ln(sd, f"layers.{i}.downsample.norm", 4 * dim)
            dim *= 2
    # classification-head leftovers the importer must skip-consume
    _ln(sd, "norm", dim)
    sd["head.weight"] = randn(1000, dim)
    sd["head.bias"] = randn(1000)
    return sd


def test_import_swin_strict_and_forward():
    from video_knet_tpu.utils.checkpoint import merge_params
    from video_knet_tpu.utils.torch_import import import_torch_swin

    sd = build_official_swin_sd()
    params = import_torch_swin(sd, strict=True)  # raises on leftovers
    model = SwinTransformer(preset="tiny")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    merged = merge_params(variables["params"], params)  # shape-checked
    outs = model.apply({"params": merged}, jnp.ones((1, 64, 96, 3)))
    assert [o.shape[-1] for o in outs] == [96, 192, 384, 768]
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))
    # weights actually landed (qkv kernel is the transposed torch weight);
    # block j lives at stage{i}_pairs/blk{j%2} leading-axis j//2 (scan layout)
    np.testing.assert_allclose(
        np.asarray(merged["stage0_pairs"]["blk0"]["attn"]["qkv"]["kernel"][0]),
        sd["layers.0.blocks.0.attn.qkv.weight"].numpy().T,
    )
    np.testing.assert_allclose(
        np.asarray(merged["stage2_pairs"]["blk1"]["attn"]["proj"]["kernel"][2]),
        sd["layers.2.blocks.5.attn.proj.weight"].numpy().T,
    )


def test_import_swin_detection_prefix():
    """Detection-style checkpoints: backbone. prefix + per-stage norm{i}."""
    from video_knet_tpu.utils.torch_import import import_torch_swin

    sd = build_official_swin_sd()
    del sd["head.weight"], sd["head.bias"]
    del sd["norm.weight"], sd["norm.bias"]
    for i, dim in enumerate((96, 192, 384, 768)):
        _ln(sd, f"norm{i}", dim)
    sd = {"backbone." + k: v for k, v in sd.items()}
    params = import_torch_swin(sd, strict=True)
    for i in range(4):
        assert f"out_norm{i}" in params


def test_swin_train_mode_stochastic_depth():
    """drop_path active in train mode: stochastic across rng, identity in eval."""
    model = SwinTransformer(preset="tiny", drop_path_rate=0.5, train=True)
    x = jnp.ones((4, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    y1 = model.apply(variables, x, rngs={"dropout": jax.random.PRNGKey(2)})
    y2 = model.apply(variables, x, rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(y1[-1]), np.asarray(y2[-1]))
    # eval model shares the tree and is deterministic
    em = SwinTransformer(preset="tiny", drop_path_rate=0.5, train=False)
    e1 = em.apply(variables, x)
    e2 = em.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(e1[-1]), np.asarray(e2[-1]))


def test_swin_ape_import_and_forward():
    from video_knet_tpu.utils.checkpoint import merge_params
    from video_knet_tpu.utils.torch_import import import_torch_swin

    sd = build_official_swin_sd()
    sd["absolute_pos_embed"] = randn(1, 56 * 56, 96)  # official [1, N, C]
    params = import_torch_swin(sd, strict=True)
    assert params["absolute_pos_embed"].shape == (1, 56, 56, 96)
    model = SwinTransformer(preset="tiny", ape=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    merged = merge_params(variables["params"], params)
    outs = model.apply({"params": merged}, jnp.ones((1, 64, 96, 3)))
    assert np.all(np.isfinite(np.asarray(outs[-1])))


def test_window_attention_matches_torch():
    """Imported window-attention weights reproduce the official torch forward
    (swin_transformer.py WindowAttention: qkv -> scaled dot-product + relative
    position bias -> proj)."""
    dim, heads, ws = 96, 3, 7
    n = ws * ws
    torch.manual_seed(0)
    qkv_w, qkv_b = randn(3 * dim, dim), randn(3 * dim)
    proj_w, proj_b = randn(dim, dim), randn(dim)
    rpb = randn((2 * ws - 1) ** 2, heads)
    x = torch.randn(2, n, dim)

    with torch.no_grad():
        qkv = (x @ qkv_w.T + qkv_b).reshape(2, n, 3, heads, dim // heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (dim // heads) ** -0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        idx = torch.from_numpy(relative_position_index(ws).astype(np.int64))
        bias = rpb[idx.reshape(-1)].reshape(n, n, heads).permute(2, 0, 1)
        attn = torch.softmax(attn + bias.unsqueeze(0), -1)
        ref = (attn @ v).transpose(1, 2).reshape(2, n, dim) @ proj_w.T + proj_b

    params = {
        "qkv": {"kernel": jnp.asarray(qkv_w.numpy().T),
                "bias": jnp.asarray(qkv_b.numpy())},
        "proj": {"kernel": jnp.asarray(proj_w.numpy().T),
                 "bias": jnp.asarray(proj_b.numpy())},
        "relative_position_bias_table": jnp.asarray(rpb.numpy()),
    }
    ours = WindowAttention(dim, heads, ws).apply(
        {"params": params}, jnp.asarray(x.numpy()), None
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_patch_merging_matches_torch():
    """Slice order x0/x1/x2/x3 and norm-then-reduction match official Swin."""
    dim = 8
    torch.manual_seed(1)
    x = torch.randn(2, 6, 10, dim)
    norm_w, norm_b = randn(4 * dim) + 1.0, randn(4 * dim)
    red_w = randn(2 * dim, 4 * dim)
    with torch.no_grad():
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        cat = torch.cat([x0, x1, x2, x3], -1)
        normed = torch.nn.functional.layer_norm(cat, (4 * dim,), norm_w, norm_b)
        ref = normed @ red_w.T
    params = {
        "norm": {"scale": jnp.asarray(norm_w.numpy()),
                 "bias": jnp.asarray(norm_b.numpy())},
        "reduction": {"kernel": jnp.asarray(red_w.numpy().T)},
    }
    ours = PatchMerging(dim).apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_swin_bf16_stage_scan_dtype():
    """bf16 params + bf16 input must flow bf16 through the scanned stages.

    Regression: the shifted-window additive mask (fp32) and the drop-path
    keep divisor (fp32 scan input) promoted the shift block of each pair to
    fp32, flipping the nn.scan carry dtype mid-stage (Swin-B bf16 inference
    crashed with a scan carry type mismatch)."""
    from video_knet_tpu.utils.precision import cast_variables

    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    # eval (shift-mask path)
    model = SwinTransformer(preset="tiny", window_size=7)
    variables = cast_variables(model.init(jax.random.PRNGKey(0), x))
    outs = model.apply(variables, x.astype(jnp.bfloat16))
    assert all(o.dtype == jnp.bfloat16 for o in outs)
    # train (traced drop-path rate path)
    tm = SwinTransformer(preset="tiny", window_size=7, drop_path_rate=0.3,
                         train=True)
    tv = cast_variables(tm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    ))
    outs = tm.apply(tv, x.astype(jnp.bfloat16),
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert all(o.dtype == jnp.bfloat16 for o in outs)
