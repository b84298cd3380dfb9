"""PyTorch-checkpoint -> JAX param-tree converters.

The reference initializes from official SegFormer checkpoints (`pretrained/mit_b1.pth`,
head popped — `SCD-AAAI2023/network/TSCD_model.py:22-26`), torchvision ResNet-50
(`WaveCAM-TMM2023/net/resnet50.py:112-116`), and HRNetV2 ImageNet weights. Metric parity
against converted reference checkpoints (BASELINE.md north star) flows through this
module, so the layout rules are bit-audited by round-trip tests:

- Linear  torch (out, in)            -> flax Dense kernel (in, out)        [transpose]
- Conv2d  torch OIHW                 -> flax Conv HWIO                     [perm 2,3,1,0]
- Depthwise conv torch (C,1,kh,kw)   -> flax (kh,kw,1,C)                   [same perm]
- LayerNorm/BatchNorm weight         -> scale; running stats -> batch_stats collection

Input is a flat ``{name: np.ndarray}`` state dict (load .pth with
``torch.load(..., map_location='cpu')`` and call ``state_dict_to_numpy``).
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Mapping, Tuple

import numpy as np


def state_dict_to_numpy(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class NameMapper:
    """Ordered (regex -> path-builder) rules; first match wins. Unmatched names are
    collected so converters can assert full consumption."""

    def __init__(self):
        self.rules: list[tuple[re.Pattern, Callable]] = []

    def rule(self, pattern: str):
        def deco(fn):
            self.rules.append((re.compile(pattern), fn))
            return fn

        return deco

    def convert(self, sd: Mapping[str, np.ndarray], strict: bool = True):
        params: dict = {}
        batch_stats: dict = {}
        unmatched = []
        for name, w in sd.items():
            for pat, fn in self.rules:
                m = pat.fullmatch(name)
                if m:
                    res = fn(m, np.asarray(w))
                    if res is None:
                        break  # intentionally dropped
                    collection, path, val = res
                    _set(params if collection == "params" else batch_stats, path, val)
                    break
            else:
                unmatched.append(name)
        if strict and unmatched:
            raise KeyError(f"unconverted torch params: {unmatched[:10]}"
                           + (f" (+{len(unmatched)-10} more)" if len(unmatched) > 10 else ""))
        out = {"params": params}
        if batch_stats:
            out["batch_stats"] = batch_stats
        return out


# ------------------------------------------------------------------ MiT encoder mapping
def _mit_mapper(prefix: str = "") -> NameMapper:
    M = NameMapper()
    P = re.escape(prefix)

    @M.rule(P + r"patch_embed(\d)\.proj\.(weight|bias)")
    def _pe_proj(m, w):
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        w = t_conv(w) if m.group(2) == "weight" else w
        return "params", (f"patch_embed{m.group(1)}", "proj", leaf), w

    @M.rule(P + r"patch_embed(\d)\.norm\.(weight|bias)")
    def _pe_norm(m, w):
        leaf = "scale" if m.group(2) == "weight" else "bias"
        return "params", (f"patch_embed{m.group(1)}", "norm", leaf), w

    @M.rule(P + r"block(\d)\.(\d+)\.norm([12])\.(weight|bias)")
    def _blk_norm(m, w):
        leaf = "scale" if m.group(4) == "weight" else "bias"
        return "params", (f"block{m.group(1)}_{m.group(2)}", f"norm{m.group(3)}", leaf), w

    @M.rule(P + r"block(\d)\.(\d+)\.attn\.(q|kv|proj)\.(weight|bias)")
    def _blk_attn_lin(m, w):
        leaf = "kernel" if m.group(4) == "weight" else "bias"
        w = t_linear(w) if m.group(4) == "weight" else w
        return "params", (f"block{m.group(1)}_{m.group(2)}", "attn", m.group(3), leaf), w

    @M.rule(P + r"block(\d)\.(\d+)\.attn\.sr\.(weight|bias)")
    def _blk_attn_sr(m, w):
        leaf = "kernel" if m.group(3) == "weight" else "bias"
        w = t_conv(w) if m.group(3) == "weight" else w
        return "params", (f"block{m.group(1)}_{m.group(2)}", "attn", "sr", leaf), w

    @M.rule(P + r"block(\d)\.(\d+)\.attn\.norm\.(weight|bias)")
    def _blk_attn_norm(m, w):
        leaf = "scale" if m.group(3) == "weight" else "bias"
        return "params", (f"block{m.group(1)}_{m.group(2)}", "attn", "norm", leaf), w

    @M.rule(P + r"block(\d)\.(\d+)\.mlp\.fc([12])\.(weight|bias)")
    def _blk_fc(m, w):
        leaf = "kernel" if m.group(4) == "weight" else "bias"
        w = t_linear(w) if m.group(4) == "weight" else w
        return "params", (f"block{m.group(1)}_{m.group(2)}", "mlp", f"fc{m.group(3)}", leaf), w

    @M.rule(P + r"block(\d)\.(\d+)\.mlp\.dwconv\.dwconv\.(weight|bias)")
    def _blk_dw(m, w):
        leaf = "kernel" if m.group(3) == "weight" else "bias"
        w = t_conv(w) if m.group(3) == "weight" else w
        return "params", (f"block{m.group(1)}_{m.group(2)}", "mlp", "dwconv", "Conv_0", leaf), w

    @M.rule(P + r"norm(\d)\.(weight|bias)")
    def _stage_norm(m, w):
        leaf = "scale" if m.group(2) == "weight" else "bias"
        return "params", (f"norm{m.group(1)}", leaf), w

    @M.rule(r"head\.(weight|bias)")
    def _drop_head(m, w):
        return None  # reference pops these (`TSCD_model.py:23-25`)

    return M


def convert_mit(sd: Mapping[str, np.ndarray], strict: bool = True) -> dict:
    """Official SegFormer mit_b0..b5 checkpoint -> MixVisionTransformer variables."""
    return _mit_mapper("").convert(sd, strict=strict)


# ---------------------------------------------------------------------- TSCD full model
def convert_tscd(sd: Mapping[str, np.ndarray], strict: bool = True) -> dict:
    """Trained TSCD checkpoint (`torch.save(tscd.state_dict())`,
    `SCD-AAAI2023/scripts/dist_train_voc.py:417`) -> TSCD variables."""
    M = _mit_mapper("encoder.")

    def nest(res, under):
        if res is None:
            return None
        coll, path, w = res
        return coll, (under,) + path, w

    # re-scope encoder rules under "encoder"
    enc_rules = list(M.rules)
    M.rules = [(pat, (lambda fn: lambda m, w: nest(fn(m, w), "encoder"))(fn)) for pat, fn in enc_rules]

    @M.rule(r"decoder\.linear_c([1-4])\.proj\.(weight|bias)")
    def _dec_mlp(m, w):
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        w = t_linear(w) if m.group(2) == "weight" else w
        return "params", ("decoder", f"linear_c{m.group(1)}", leaf), w

    @M.rule(r"decoder\.linear_fuse\.conv\.weight")
    def _dec_fuse_conv(m, w):
        return "params", ("decoder", "linear_fuse", "conv", "kernel"), t_conv(w)

    @M.rule(r"decoder\.linear_fuse\.bn\.(weight|bias)")
    def _dec_fuse_bn(m, w):
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return "params", ("decoder", "linear_fuse", "bn", leaf), w

    @M.rule(r"decoder\.linear_fuse\.bn\.running_(mean|var)")
    def _dec_fuse_bn_stats(m, w):
        return "batch_stats", ("decoder", "linear_fuse", "bn", m.group(1)), w

    @M.rule(r"decoder\.linear_fuse\.bn\.num_batches_tracked")
    def _drop_nbt(m, w):
        return None

    @M.rule(r"decoder\.linear_pred\.(weight|bias)")
    def _dec_pred(m, w):
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        w = t_conv(w) if m.group(1) == "weight" else w
        return "params", ("decoder", "linear_pred", leaf), w

    @M.rule(r"attn_proj\.(weight|bias)")
    def _attn_proj(m, w):
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        w = t_conv(w) if m.group(1) == "weight" else w
        return "params", ("attn_proj", leaf), w

    @M.rule(r"classifier\.weight")
    def _cls(m, w):
        return "params", ("classifier", "kernel"), t_conv(w)

    return M.convert(sd, strict=strict)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # strip DDP "module." prefixes (RSSFormer `eval.py:31-38` remove_module_prefix)
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }
    return state_dict_to_numpy(sd)


# ------------------------------------------------------------------- ResNet-50 mapping
def _resnet50_mapper(prefix: str = "") -> NameMapper:
    """torchvision-style resnet50 names (used by WaveCAM `net/resnet50.py:112-116`)."""
    M = NameMapper()
    P = re.escape(prefix)

    @M.rule(P + r"conv1\.weight")
    def _stem_conv(m, w):
        return "params", ("conv1", "kernel"), t_conv(w)

    @M.rule(P + r"bn1\.(weight|bias)")
    def _stem_bn(m, w):
        leaf = "scale" if m.group(1) == "weight" else "bias"
        return "params", ("bn1", leaf), w

    @M.rule(P + r"bn1\.running_(mean|var)")
    def _stem_bn_stats(m, w):
        return "batch_stats", ("bn1", m.group(1)), w

    @M.rule(P + r"layer(\d)\.(\d+)\.conv([123])\.weight")
    def _blk_conv(m, w):
        return "params", (f"layer{m.group(1)}_{m.group(2)}", f"conv{m.group(3)}", "kernel"), t_conv(w)

    @M.rule(P + r"layer(\d)\.(\d+)\.bn([123])\.(weight|bias)")
    def _blk_bn(m, w):
        leaf = "scale" if m.group(4) == "weight" else "bias"
        return "params", (f"layer{m.group(1)}_{m.group(2)}", f"bn{m.group(3)}", leaf), w

    @M.rule(P + r"layer(\d)\.(\d+)\.bn([123])\.running_(mean|var)")
    def _blk_bn_stats(m, w):
        return "batch_stats", (f"layer{m.group(1)}_{m.group(2)}", f"bn{m.group(3)}", m.group(4)), w

    @M.rule(P + r"layer(\d)\.(\d+)\.downsample\.0\.weight")
    def _ds_conv(m, w):
        return "params", (f"layer{m.group(1)}_{m.group(2)}", "downsample_conv", "kernel"), t_conv(w)

    @M.rule(P + r"layer(\d)\.(\d+)\.downsample\.1\.(weight|bias)")
    def _ds_bn(m, w):
        leaf = "scale" if m.group(3) == "weight" else "bias"
        return "params", (f"layer{m.group(1)}_{m.group(2)}", "downsample_bn", leaf), w

    @M.rule(P + r"layer(\d)\.(\d+)\.downsample\.1\.running_(mean|var)")
    def _ds_bn_stats(m, w):
        return "batch_stats", (f"layer{m.group(1)}_{m.group(2)}", "downsample_bn", m.group(3)), w

    @M.rule(r"(fc\.(weight|bias)|.*num_batches_tracked)")
    def _drop_fc(m, w):
        return None

    return M


def convert_resnet50(sd: Mapping[str, np.ndarray], strict: bool = True) -> dict:
    """Plain torchvision resnet50 checkpoint -> ResNet50Backbone variables."""
    return _resnet50_mapper("").convert(sd, strict=strict)


def convert_wavecam_net(sd: Mapping[str, np.ndarray], strict: bool = True) -> dict:
    """WaveCAM Net / Net_CAM / CAM checkpoints (`net/resnet50_cam.py:9-44`):
    resnet under `resnet50.`, plus `classifier`; duplicate module references
    (stage*/backbone*/newly_added) and the unused `bg` head are dropped."""
    M = _resnet50_mapper("resnet50.")

    def nest(res):
        if res is None:
            return None
        coll, path, w = res
        return coll, ("resnet50",) + path, w

    M.rules = [(pat, (lambda fn: lambda m, w: nest(fn(m, w)))(fn)) for pat, fn in M.rules]

    @M.rule(r"classifier\.weight")
    def _cls(m, w):
        return "params", ("classifier", "kernel"), t_conv(w)

    @M.rule(r"(bg\.weight|stage\d\..*|backbone\..*|newly_added\..*)")
    def _drop_dupes(m, w):
        return None

    return M.convert(sd, strict=strict)
