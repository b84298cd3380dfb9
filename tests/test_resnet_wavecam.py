import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from representationlearning_tpu.convert import torch2jax as C
from representationlearning_tpu.models.resnet import Net, ResNet50Backbone, resnet50_config
from representationlearning_tpu.models.wavecam import ClassPredictorWavecam, WaveModeling
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m 'not slow'


# ------------------------------------------------- torch spec: one bottleneck + stem
class _TorchBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes).eval()
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, dilation, dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes).eval()
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4).eval()
        self.ds = None
        if downsample:
            self.ds = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4).eval(),
            )

    def forward(self, x):
        r = self.ds(x) if self.ds is not None else x
        o = F.relu(self.bn1(self.conv1(x)))
        o = F.relu(self.bn2(self.conv2(o)))
        o = self.bn3(self.conv3(o))
        return F.relu(o + r)


def _rand_bn(bn, rng):
    bn.weight.data = torch.from_numpy(rng.standard_normal(bn.weight.shape).astype(np.float32))
    bn.bias.data = torch.from_numpy(rng.standard_normal(bn.bias.shape).astype(np.float32))
    bn.running_mean.data = torch.from_numpy(rng.standard_normal(bn.running_mean.shape).astype(np.float32))
    bn.running_var.data = torch.from_numpy(rng.random(bn.running_var.shape).astype(np.float32) + 0.5)


def test_backbone_converter_golden_vs_torch_stack():
    """Build a full torchvision-style resnet50 state dict (random), convert, and check
    my backbone reproduces a torch stage-by-stage evaluation of the same weights."""
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    # torch model: stem + 4 layers with WaveCAM's stride/dilation placement
    class _TorchResNet(tnn.Module):
        def __init__(self, strides=(2, 2, 2, 1), dilations=(1, 1, 1, 1)):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, strides[0], 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64).eval()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            specs = [(64, 3, 1, dilations[0]), (128, 4, strides[1], dilations[1]),
                     (256, 6, strides[2], dilations[2]), (512, 3, strides[3], dilations[3])]
            cin = 64
            for li, (planes, blocks, stride, dil) in enumerate(specs, start=1):
                mods = [_TorchBottleneck(cin, planes, stride, 1, downsample=(stride != 1 or cin != planes * 4))]
                cin = planes * 4
                mods += [_TorchBottleneck(cin, planes, 1, dil) for _ in range(blocks - 1)]
                setattr(self, f"layer{li}", tnn.Sequential(*mods))

        def forward(self, x):
            x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
            feats = []
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
                feats.append(x)
            return feats

    tm = _TorchResNet(**resnet50_config(16)).eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            _rand_bn(m, rng)

    # export as torchvision-style names
    sd = {}
    for k, v in tm.state_dict().items():
        k = k.replace(".ds.0.", ".downsample.0.").replace(".ds.1.", ".downsample.1.")
        sd[k] = v.numpy()
    variables = C.convert_resnet50(sd)

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    model = ResNet50Backbone(**resnet50_config(16))
    feats = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        tfeats = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    for f, tf in zip(feats, tfeats):
        np.testing.assert_allclose(
            np.asarray(f), tf.permute(0, 2, 3, 1).numpy(), rtol=2e-3, atol=2e-3
        )


def test_net_heads_shapes():
    model = Net(stride=16, n_classes=20)
    x = jnp.zeros((2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(v, x)
    assert logits.shape == (2, 20)
    logits, cf, cams = model.apply(v, x, method=Net.cam_feature)
    assert cf.shape == (2, 20, 2048) and cams.shape == (2, 4, 4, 20)
    cam = model.apply(v, x, method=Net.cam)
    assert cam.shape == (2, 4, 4, 20)


class _TorchWaveSpec(tnn.Module):
    def __init__(self, dim=4):
        super().__init__()
        d = dim
        self.fc_h = tnn.Conv2d(d, d, 1, bias=False)
        self.fc_w = tnn.Conv2d(d, d, 1, bias=False)
        self.tfc_h = tnn.Conv2d(2 * d, d, (1, 7), padding=(0, 3), groups=d, bias=False)
        self.tfc_w = tnn.Conv2d(2 * d, d, (7, 1), padding=(3, 0), groups=d, bias=False)
        self.w1 = tnn.Conv2d(d, d, 1)
        self.w2 = tnn.Conv2d(d, d, 1)
        self.thR = tnn.Sequential(tnn.Conv2d(d, d, 1), tnn.BatchNorm2d(d), tnn.ReLU())
        self.thI = tnn.Sequential(tnn.Conv2d(d, d, 1), tnn.BatchNorm2d(d), tnn.ReLU())

    def forward(self, x):
        B, C, H, W = x.shape
        x = F.relu(x / 3 + 0.1)
        tR = self.thR(x)
        bg = (1 - x) / 3
        tI = self.thI(bg)
        xh = self.fc_h(x)
        xw = self.fc_w(bg)
        xh = torch.cat([xh * torch.cos(tR), xh * torch.sin(tR)], 1)
        xw = torch.cat([xw * torch.cos(tI), xw * torch.sin(tI)], 1)
        h = self.tfc_h(xh)
        w = self.tfc_w(xw)
        a = F.adaptive_avg_pool2d(x, 1)
        a = torch.cat([self.w1(a), self.w2(a)], 1).reshape(B, C, 2).permute(2, 0, 1)
        a = a.softmax(0).unsqueeze(-1).unsqueeze(-1)
        return torch.cat([h * a[0], w * a[1]], 1)


def test_wave_modeling_golden_vs_torch():
    torch.manual_seed(1)
    d = 4
    spec = _TorchWaveSpec(d).eval()
    rng = np.random.default_rng(2)
    x = rng.random((2, 8, 8, d)).astype(np.float32)
    with torch.no_grad():
        ref = spec(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    m = WaveModeling(dim=d, qkv_bias=False)
    params = {}

    def conv_p(c):
        p = {"kernel": jnp.asarray(c.weight.detach().numpy().transpose(2, 3, 1, 0))}
        if c.bias is not None:
            p["bias"] = jnp.asarray(c.bias.detach().numpy())
        return p

    params["fc_h"] = conv_p(spec.fc_h)
    params["fc_w"] = conv_p(spec.fc_w)
    params["tfc_h"] = conv_p(spec.tfc_h)
    params["tfc_w"] = conv_p(spec.tfc_w)
    params["w1"] = conv_p(spec.w1)
    params["w2"] = conv_p(spec.w2)
    bs = {}
    for name, seq in (("theta_R", spec.thR), ("theta_I", spec.thI)):
        params[f"{name}_conv"] = conv_p(seq[0])
        params[f"{name}_bn"] = {
            "scale": jnp.asarray(seq[1].weight.detach().numpy()),
            "bias": jnp.asarray(seq[1].bias.detach().numpy()),
        }
        bs[f"{name}_bn"] = {
            "mean": jnp.asarray(seq[1].running_mean.numpy()),
            "var": jnp.asarray(seq[1].running_var.numpy()),
        }
    out = m.apply({"params": params, "batch_stats": bs}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_class_predictor_wavecam():
    m = ClassPredictorWavecam(num_classes=20, representation_size=2 * 8 * 8)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 20, 128)).astype(np.float32))
    cams = jnp.asarray(rng.random((2, 8, 8, 20)).astype(np.float32))
    label = jnp.zeros((2, 20)).at[0, 3].set(1).at[1, 5].set(1).at[1, 7].set(1)
    v = m.init(jax.random.PRNGKey(0), x, label, cams)
    (loss, acc), _ = m.apply(v, x, label, cams, train=True,
                             mutable=["batch_stats"])
    assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0
