"""HRNet appearance encoder vs an independent torch transcription oracle.

models/video/hrnet.py rebuilds unitrack/model/hrnet.py:1-610; the torch net
below is transcribed here INDEPENDENTLY from the same reference (module names
kept identical to the reference's state_dict layout so
utils/checkpoint.import_torch_hrnet maps it mechanically — which is exactly
what it must do for real UniTrack hrnet checkpoints). Matching outputs
therefore pin both the architecture and the importer's name mapping at once,
same pattern as the ResNet-18 oracle in test_appearance_tta.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
tnn = torch.nn

from video_knet_tpu.models.video.appearance import (  # noqa: E402
    init_appearance,
    make_appearance_fn,
    make_appearance_model,
)
from video_knet_tpu.models.video.hrnet import HRNetEncoder  # noqa: E402
from video_knet_tpu.utils.checkpoint import import_torch_hrnet  # noqa: E402

BN_M = 0.1


def _bn(c):
    return tnn.BatchNorm2d(c, momentum=BN_M)


class TBasic(tnn.Module):
    def __init__(self, planes):
        super().__init__()
        self.conv1 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn1 = _bn(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = _bn(planes)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + x)


class TBottleneck(tnn.Module):
    def __init__(self, inplanes, planes):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = _bn(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = _bn(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = _bn(planes * 4)
        if inplanes != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, bias=False), _bn(planes * 4)
            )
        else:
            self.downsample = None

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + r)


def _conv_bn_relu(cin, cout, stride):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, 3, stride, 1, bias=False), _bn(cout),
        tnn.ReLU(False),
    )


class THRModule(tnn.Module):
    """HighResolutionModule (branches + full fuse), reference key layout."""

    def __init__(self, n_branches, widths, num_blocks):
        super().__init__()
        self.n = n_branches
        self.branches = tnn.ModuleList(
            tnn.Sequential(*[TBasic(widths[b]) for _ in range(num_blocks)])
            for b in range(n_branches)
        )
        fuse = []
        for i in range(n_branches):
            row = []
            for j in range(n_branches):
                if j > i:
                    row.append(tnn.Sequential(
                        tnn.Conv2d(widths[j], widths[i], 1, bias=False),
                        _bn(widths[i]),
                        tnn.Upsample(scale_factor=2 ** (j - i), mode="nearest"),
                    ))
                elif j == i:
                    row.append(None)
                else:
                    steps = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = widths[i] if last else widths[j]
                        if last:
                            steps.append(tnn.Sequential(
                                tnn.Conv2d(widths[j], cout, 3, 2, 1,
                                           bias=False), _bn(cout)))
                        else:
                            steps.append(_conv_bn_relu(widths[j], cout, 2))
                    row.append(tnn.Sequential(*steps))
            fuse.append(tnn.ModuleList(row))
        self.fuse_layers = tnn.ModuleList(fuse)

    def forward(self, xs):
        xs = [self.branches[b](xs[b]) for b in range(self.n)]
        out = []
        for i in range(self.n):
            y = xs[0] if i == 0 else self.fuse_layers[i][0](xs[0])
            for j in range(1, self.n):
                y = y + (xs[j] if i == j else self.fuse_layers[i][j](xs[j]))
            out.append(torch.relu(y))
        return out


class THRNet(tnn.Module):
    def __init__(self, w=18, return_stage=2):
        super().__init__()
        widths = [w, 2 * w, 4 * w, 8 * w]
        head = [32, 64, 128, 256]
        self.return_stage = return_stage
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = _bn(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = _bn(64)
        self.layer1 = tnn.Sequential(
            TBottleneck(64, 64), *[TBottleneck(256, 64) for _ in range(3)]
        )
        self.transition1 = tnn.ModuleList([
            _conv_bn_relu(256, widths[0], 1),
            tnn.Sequential(_conv_bn_relu(256, widths[1], 2)),
        ])
        self.stage2 = tnn.Sequential(THRModule(2, widths, 4))
        self.transition2 = tnn.ModuleList([
            None, None, tnn.Sequential(_conv_bn_relu(widths[1], widths[2], 2))
        ])
        self.stage3 = tnn.Sequential(*[THRModule(3, widths, 4)
                                       for _ in range(4)])
        self.transition3 = tnn.ModuleList([
            None, None, None,
            tnn.Sequential(_conv_bn_relu(widths[2], widths[3], 2)),
        ])
        self.stage4 = tnn.Sequential(*[THRModule(4, widths, 4)
                                       for _ in range(3)])
        self.incre_modules = tnn.ModuleList(
            tnn.Sequential(TBottleneck(widths[i], head[i])) for i in range(4)
        )
        self.downsamp_modules = tnn.ModuleList(
            tnn.Sequential(
                tnn.Conv2d(head[i] * 4, head[i + 1] * 4, 3, 2, 1),
                _bn(head[i + 1] * 4), tnn.ReLU(True),
            )
            for i in range(3)
        )

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.layer1(y)
        xs = [self.transition1[0](y), self.transition1[1](y)]
        xs = self.stage2(xs)
        xs = self.stage3(xs + [self.transition2[2](xs[-1])])
        xs = self.stage4(xs + [self.transition3[3](xs[-1])])
        outs = [self.incre_modules[0](xs[0])]
        for i in range(3):
            outs.append(
                self.incre_modules[i + 1](xs[i + 1])
                + self.downsamp_modules[i](outs[i])
            )
        ret = outs[self.return_stage]
        return torch.nn.functional.interpolate(
            ret, outs[1].shape[-2:], mode="bilinear"
        )


def _randomize_bn(net, seed=0):
    torch.manual_seed(seed)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)


@pytest.mark.parametrize("return_stage", [2, 3])
def test_hrnet_w18_matches_torch_oracle(return_stage):
    torch.manual_seed(1)
    net = THRNet(w=18, return_stage=return_stage).eval()
    _randomize_bn(net)

    params, stats = import_torch_hrnet(net.state_dict(), width=18)
    model = HRNetEncoder(width=18, return_stage=return_stage)
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    # stride-16 head map resized to the stride-8 one; 512/1024 ch
    assert out.shape == ref.shape == (1, 8, 12, 512 * 2 ** (return_stage - 2))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_hrnet_importer_rejects_unconsumed_keys():
    net = THRNet(w=18).eval()
    sd = dict(net.state_dict())
    sd["stage2.0.branches.0.0.conv9.weight"] = torch.zeros(1)
    with pytest.raises(KeyError):
        import_torch_hrnet(sd, width=18)


def test_hrnet_zoo_wiring():
    model = make_appearance_model("hrnet_w18", return_stage=2)
    assert isinstance(model, HRNetEncoder) and model.width == 18
    variables = init_appearance(model, hw=(64, 64))
    fn = make_appearance_fn(model, variables)
    out = np.asarray(fn(jnp.zeros((1, 64, 96, 3), jnp.float32)))
    assert out.shape == (1, 8, 12, 512)
    assert np.isfinite(out).all()
