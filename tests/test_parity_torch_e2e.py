"""End-to-end checkpoint-parity tests against the REAL reference PyTorch modules
(VERDICT round-1 item 3): instantiate the reference networks from /root/reference with
seeded random weights, run their eval-mode forward in torch (CPU), convert the state
dict through `convert.torch2jax`, and require the flax forward to match numerically.

This catches converter drift AND module drift end-to-end, per model family:
  - TSCD / MiT-B1        (`SCD-AAAI2023/network/TSCD_model.py:66-89`)
  - WaveCAM ResNet-50 Net/CAM (`WaveCAM-TMM2023/net/resnet50_cam.py:31-43,109-147`)
  - RSSFormer HRNetFusion (`RSSFormer-TIP2023/module/baseline/hrnet_aux.py:70-134`)
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import ref_loader  # noqa: E402
from representationlearning_tpu.convert import torch2jax as C  # noqa: E402

TOL = 2e-4


def _nchw(x_nhwc: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def _to_nhwc(t: "torch.Tensor") -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _maxdiff(a, b) -> float:
    return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))


@pytest.mark.slow
def test_tscd_mit_b1_e2e_parity(rng):
    from representationlearning_tpu.models.tscd import TSCD

    tscd_model, _ = ref_loader.load_scd_network()
    torch.manual_seed(0)
    tm = tscd_model.TSCD("mit_b1", num_classes=21, stride=[4, 2, 2, 1], pooling="gmp")
    tm.eval()

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_seg, t_attns, t_attn_pred = tm(_nchw(x))
        t_cam, t_attn_pred2 = tm(_nchw(x), cam_only=True)

    variables = C.convert_tscd(C.state_dict_to_numpy(tm.state_dict()))
    model = TSCD(backbone="mit_b1", num_classes=21, pooling="gmp")
    j_cls, j_seg, j_attns, j_attn_pred = model.apply(variables, jnp.asarray(x))
    j_cam, _ = model.apply(variables, jnp.asarray(x), cam_only=True)

    assert _maxdiff(j_cls, t_cls.numpy()) < TOL
    assert _maxdiff(j_seg, _to_nhwc(t_seg)) < TOL
    assert _maxdiff(j_attn_pred, t_attn_pred.numpy()) < TOL
    assert _maxdiff(j_cam, _to_nhwc(t_cam)) < TOL
    # exported attention matrices (B, heads, N, Nk): our encoder exports only the
    # stage-4 maps the model consumes (`TSCD_model.py:73` uses _attns[-2:]) — compare
    # those against the reference's full export tail.
    for ja, ta in zip(j_attns[-2:], list(t_attns)[-2:]):
        assert _maxdiff(ja, ta.numpy()) < TOL


@pytest.mark.slow
def test_wavecam_resnet50_net_e2e_parity(rng):
    from representationlearning_tpu.models.resnet import Net

    rcam, _ = ref_loader.load_wavecam_net()
    torch.manual_seed(0)
    tm = rcam.Net(n_classes=20)
    tm.eval()

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits = tm(_nchw(x))

    variables = C.convert_wavecam_net(C.state_dict_to_numpy(tm.state_dict()))
    model = Net(n_classes=20)
    j_logits = model.apply(variables, jnp.asarray(x))
    assert _maxdiff(j_logits, t_logits.numpy()) < TOL


@pytest.mark.slow
def test_wavecam_cam_inference_e2e_parity(rng):
    """CAM-mode forward (`resnet50_cam.py:109-133`): flip-summed relu class maps."""
    from representationlearning_tpu.models.resnet import Net

    rcam, _ = ref_loader.load_wavecam_net()
    torch.manual_seed(0)
    tm = rcam.CAM(n_classes=20)
    tm.eval()

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    # reference CAM.forward expects the flip-pair stacked on batch and sums over it
    x_pair = np.concatenate([x, x[:, :, ::-1]], axis=0)
    with torch.no_grad():
        t_cam = tm(_nchw(x_pair))

    variables = C.convert_wavecam_net(C.state_dict_to_numpy(tm.state_dict()))
    model = Net(n_classes=20)
    j_raw = model.apply(variables, jnp.asarray(x_pair), method=model.cam)
    j_raw = jnp.maximum(j_raw, 0)  # reference applies relu before the flip-sum
    j_cam = j_raw[0] + j_raw[1, :, ::-1]
    assert _maxdiff(j_cam.transpose(2, 0, 1), t_cam.numpy()) < TOL


@pytest.mark.slow
def test_rssformer_hrnetfusion_e2e_parity(rng):
    from representationlearning_tpu.models.rssformer import HRNetFusion

    hrnet_aux = ref_loader.load_rssformer_module()
    cfg = dict(
        backbone=dict(hrnet_type="hrnetv2_w32", pretrained=False, weight_path=None,
                      norm_eval=False, frozen_stages=-1, with_cp=False),
        neck=dict(in_channels=480), classes=7,
        head=dict(in_channels=480, upsample_scale=4.0),
        loss=dict(ce=dict()),
    )
    torch.manual_seed(0)
    tm = hrnet_aux.HRNetFusion(cfg)
    tm.eval()

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_prob = tm(_nchw(x))

    variables = C.convert_rssformer(C.state_dict_to_numpy(tm.state_dict()))
    model = HRNetFusion(hrnet_type="hrnetv2_w32", classes=7)
    j_prob = model.apply(variables, jnp.asarray(x))
    assert _maxdiff(j_prob, _to_nhwc(t_prob)) < TOL


@pytest.mark.slow
def test_hrt_small_backbone_e2e_parity(rng):
    """HRFormer backbone (`hrt_backbone.py:370`, hrt_small == the reference's
    `hrnetv2_w32` builder at `:683`)."""
    from representationlearning_tpu.models.hrt import HighResolutionTransformerNet

    hrt = ref_loader.load_hrt_backbone()
    torch.manual_seed(0)
    tm = hrt.hrnetv2_w32(pretrained=False, weight_path=None, norm_eval=False,
                         frozen_stages=-1)
    tm.eval()

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_feats = tm(_nchw(x))

    v = C.convert_hrt(C.state_dict_to_numpy(tm.state_dict()))
    variables = {"params": v["params"]["backbone"],
                 "batch_stats": v["batch_stats"]["backbone"]}
    model = HighResolutionTransformerNet("hrt_small")
    j_feats = model.apply(variables, jnp.asarray(x))
    assert len(j_feats) == len(t_feats) == 4
    for jf, tf in zip(j_feats, t_feats):
        assert _maxdiff(jf, _to_nhwc(tf)) < TOL


@pytest.mark.slow
@pytest.mark.parametrize("ref_cls,attn_source,wave_mode", [
    ("WeTr2", "attns", "post_cls"),
    ("WeTr599", "x4_last", "none"),
    ("WeTr603", "x4_prev", "none"),
    ("WeTr", "x4_prev", "stage4"),
])
def test_wetr_attn_aff_zoo_e2e_parity(rng, ref_cls, attn_source, wave_mode):
    """Every constructable class of `RML/backbone/model_attn_aff.py` (the WeTr
    attention-affinity research zoo) against `WeTrAttnAff`'s two config axes.
    WeTr522 is excluded: it defines only a forward, no __init__ (dead code)."""
    from representationlearning_tpu.models.rml import WeTrAttnAff

    maa = ref_loader.load_rml_attn_aff()
    torch.manual_seed(0)
    tm = getattr(maa, ref_cls)("mit_b1", num_classes=21, stride=[4, 2, 2, 1],
                               pooling="gmp")
    tm.eval()

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_seg, t_attns, t_attn_pred = tm(_nchw(x))
        t_cam, t_attn_pred2 = tm(_nchw(x), cam_only=True)

    variables = C.convert_wetr_attn_aff(
        C.state_dict_to_numpy(tm.state_dict()),
        attn_source=attn_source, wave_mode=wave_mode)
    model = WeTrAttnAff(backbone="mit_b1", num_classes=21, pooling="gmp",
                        attn_source=attn_source, wave_mode=wave_mode)
    j_cls, j_seg, j_attns, j_attn_pred = model.apply(variables, jnp.asarray(x))
    j_cam, _ = model.apply(variables, jnp.asarray(x), cam_only=True)

    assert _maxdiff(j_cls, t_cls.numpy()) < TOL
    assert _maxdiff(j_seg, _to_nhwc(t_seg)) < TOL
    assert _maxdiff(j_attn_pred, t_attn_pred.numpy()) < TOL
    assert _maxdiff(j_cam, _to_nhwc(t_cam)) < TOL
