"""Swin backbone shapes, checkpoint save/restore, torch weight import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_knet_tpu.models.swin import SwinTransformer, shift_attn_mask, window_partition, window_reverse


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    wins = window_partition(x, 4)
    assert wins.shape == (2 * 4, 16, 3)
    back = window_reverse(wins, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region():
    m = shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert (m == 0).any() and (m == -100).any()


def test_swin_tiny_shapes():
    model = SwinTransformer(preset="tiny", window_size=4)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 96),
        (1, 8, 12, 192),
        (1, 4, 6, 384),
        (1, 2, 3, 768),
    ]


def test_orbax_roundtrip(tmp_path):
    from video_knet_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.int32(7)}
    path = save_checkpoint(str(tmp_path / "ckpt"), state, step=1)
    out = restore_checkpoint(path, target=state)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(out["step"]) == 7


def test_torch_resnet_import():
    torch = pytest.importorskip("torch")
    from video_knet_tpu.models.resnet import ResNet
    from video_knet_tpu.utils.checkpoint import import_torch_resnet, merge_params

    model = ResNet(depth=50, train=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    # build a torch-style state dict with the same shapes as torchvision r50
    sd = {}
    def conv(o, i, k):
        return torch.randn(o, i, k, k)
    def bn(pre, c):
        sd[pre + ".weight"] = torch.randn(c)
        sd[pre + ".bias"] = torch.randn(c)
        sd[pre + ".running_mean"] = torch.randn(c)
        sd[pre + ".running_var"] = torch.rand(c) + 0.5
    sd["conv1.weight"] = conv(64, 3, 7)
    bn("bn1", 64)
    blocks = {1: (3, 64), 2: (4, 128), 3: (6, 256), 4: (3, 512)}
    for s, (n, wdt) in blocks.items():
        cin = 64 if s == 1 else wdt * 2
        for b in range(n):
            pre = f"layer{s}.{b}"
            in_c = cin if b == 0 else wdt * 4
            sd[pre + ".conv1.weight"] = conv(wdt, in_c, 1)
            bn(pre + ".bn1", wdt)
            sd[pre + ".conv2.weight"] = conv(wdt, wdt, 3)
            bn(pre + ".bn2", wdt)
            sd[pre + ".conv3.weight"] = conv(wdt * 4, wdt, 1)
            bn(pre + ".bn3", wdt * 4)
            if b == 0:
                sd[pre + ".downsample.0.weight"] = conv(wdt * 4, in_c, 1)
                bn(pre + ".downsample.1", wdt * 4)

    params, stats = import_torch_resnet(sd, prefix="")
    merged = merge_params(variables["params"], params)
    merged_stats = merge_params(variables["batch_stats"], stats)
    # forward runs with imported weights
    out = model.apply({"params": merged, "batch_stats": merged_stats},
                      jnp.zeros((1, 64, 64, 3)))
    assert len(out) == 4
    # spot check a weight landed transposed correctly
    np.testing.assert_allclose(
        np.asarray(merged["conv1"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(merged_stats["layer3_block2"]["bn2"]["mean"]),
        sd["layer3.2.bn2.running_mean"].numpy(),
    )
