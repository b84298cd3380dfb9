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
def _encoder_scoped_mit_mapper() -> NameMapper:
    """A `_mit_mapper` whose outputs are re-scoped under the "encoder" subtree
    (the TSCD/RML/WeTr wrappers all hold the MiT as `self.encoder`)."""
    M = _mit_mapper("encoder.")

    def nest(res, under):
        if res is None:
            return None
        coll, path, w = res
        return coll, (under,) + path, w

    enc_rules = list(M.rules)
    M.rules = [(pat, (lambda fn: lambda m, w: nest(fn(m, w), "encoder"))(fn)) for pat, fn in enc_rules]
    return M


def _add_segformer_decoder_rules(M: NameMapper) -> None:
    """`decoder.*` rules for the SegFormerHead shared by TSCD and the WeTr zoo
    (`SCD-AAAI2023/network/segformer_head.py` == `RML/backbone/segformer_head.py`)."""

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


def convert_tscd(sd: Mapping[str, np.ndarray], strict: bool = True) -> dict:
    """Trained TSCD checkpoint (`torch.save(tscd.state_dict())`,
    `SCD-AAAI2023/scripts/dist_train_voc.py:417`) -> TSCD variables."""
    M = _encoder_scoped_mit_mapper()
    _add_segformer_decoder_rules(M)

    @M.rule(r"attn_proj\.(weight|bias)")
    def _attn_proj(m, w):
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        w = t_conv(w) if m.group(1) == "weight" else w
        return "params", ("attn_proj", leaf), w

    @M.rule(r"classifier\.weight")
    def _cls(m, w):
        return "params", ("classifier", "kernel"), t_conv(w)

    return M.convert(sd, strict=strict)


def _add_patm_rules(M: NameMapper, prefix: str = "wave") -> None:
    """PATM wave-block rules (`RML/backbone/wavemlp.py:133-185`, mode='fc'):
    1x1 convs (fc_h/fc_w/fc_c/theta_*_conv/proj), grouped 1x7 / 7x1 token-FC
    convs (tfc_h/tfc_w), and the two-conv reweight Mlp -> reweight_fc{1,2}."""
    P = re.escape(prefix)

    @M.rule(P + r"\.(fc_[hwc]|theta_[hw]_conv|proj|tfc_[hw])\.(weight|bias)")
    def _wave_conv(m, w):
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        w = t_conv(w) if m.group(2) == "weight" else w
        return "params", (prefix, m.group(1), leaf), w

    @M.rule(P + r"\.reweight\.fc([12])\.(weight|bias)")
    def _wave_reweight(m, w):
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        w = t_conv(w) if m.group(2) == "weight" else w
        return "params", (prefix, f"reweight_fc{m.group(1)}", leaf), w


def convert_wetr_attn_aff(sd: Mapping[str, np.ndarray], attn_source: str,
                          wave_mode: str, strict: bool = True) -> dict:
    """`RML/backbone/model_attn_aff.py` WeTr-zoo checkpoint -> `WeTrAttnAff`
    variables. `attn_source`/`wave_mode` name the grid point (see the module
    docstring, `models/rml.py::WeTrAttnAff`); params the variant defines but its
    live forward never uses (WeTr599/603's `wave` and `classifier2`) are dropped."""
    M = _encoder_scoped_mit_mapper()
    _add_segformer_decoder_rules(M)

    if wave_mode == "none":
        @M.rule(r"(wave\..*|classifier2\.weight)")
        def _drop_dead(m, w):
            return None
    else:
        _add_patm_rules(M, "wave")
        if wave_mode == "post_cls":
            @M.rule(r"classifier2\.weight")
            def _cls2(m, w):
                return "params", ("classifier2", "kernel"), t_conv(w)
        else:
            @M.rule(r"classifier2\.weight")
            def _drop_cls2(m, w):
                return None

    @M.rule(r"attn_proj(1?)\.(weight|bias)")
    def _attn_proj(m, w):
        name = f"attn_proj{m.group(1)}"
        if m.group(1) and attn_source == "attns":
            return None  # attn_proj1 unused when the affinity head reads raw attns
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        w = t_conv(w) if m.group(2) == "weight" else w
        return "params", (name, leaf), w

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


# ------------------------------------------------------------ HRNetV2 / RSSFormer
def convert_hrnet(sd: Mapping[str, np.ndarray], strict: bool = True,
                  prefix: str = "") -> dict:
    """mmlab HRNetV2 (w18/32/40/48) checkpoints, plus the RSSFormer transformer blocks
    when present (`_hrnet_rssformer.py`), -> HighResolutionNet variables.

    Name map: stage{s}.{m}.X -> stage{s}_m{m}/X, branches.{b}.{k} -> branch{b}_block{k},
    fuse_layers.{i}.{j} -> fuse{i}_{j}, transition{t}.{i} -> transition{t}/t{i}_*,
    layer1.{b} -> layer1_{b}; conv OIHW->HWIO, Linear transposed, BN stats ->
    batch_stats.
    """
    M = NameMapper()
    P = re.escape(prefix)

    def bn_leaf(which, w):
        if which in ("weight", "bias"):
            return "params", ("scale" if which == "weight" else "bias"), w
        return "batch_stats", ("mean" if which == "running_mean" else "var"), w

    def emit_bn(base_path, which, w):
        coll, leaf, w = bn_leaf(which, w)
        return coll, base_path + (leaf,), w

    BN = r"(weight|bias|running_mean|running_var)"

    # stem
    @M.rule(P + r"conv([12])\.weight")
    def _stem_conv(m, w):
        return "params", ("backbone", f"conv{m.group(1)}", "kernel"), t_conv(w)

    @M.rule(P + r"bn([12])\." + BN)
    def _stem_bn(m, w):
        return emit_bn(("backbone", f"bn{m.group(1)}"), m.group(2), w)

    # layer1 bottlenecks
    @M.rule(P + r"layer1\.(\d)\.conv([123])\.weight")
    def _l1_conv(m, w):
        return "params", ("backbone", f"layer1_{m.group(1)}", f"conv{m.group(2)}", "kernel"), t_conv(w)

    @M.rule(P + r"layer1\.(\d)\.bn([123])\." + BN)
    def _l1_bn(m, w):
        return emit_bn(("backbone", f"layer1_{m.group(1)}", f"bn{m.group(2)}"), m.group(3), w)

    @M.rule(P + r"layer1\.(\d)\.downsample\.0\.weight")
    def _l1_ds_conv(m, w):
        return "params", ("backbone", f"layer1_{m.group(1)}", "downsample_conv", "kernel"), t_conv(w)

    @M.rule(P + r"layer1\.(\d)\.downsample\.1\." + BN)
    def _l1_ds_bn(m, w):
        return emit_bn(("backbone", f"layer1_{m.group(1)}", "downsample_bn"), m.group(2), w)

    # transitions: existing-branch Sequential(conv, bn, relu) -> t{i}_conv / t{i}_bn
    @M.rule(P + r"transition(\d)\.(\d)\.0\.weight")
    def _tr_conv(m, w):
        return "params", ("backbone", f"transition{m.group(1)}", f"t{m.group(2)}_conv", "kernel"), t_conv(w)

    @M.rule(P + r"transition(\d)\.(\d)\.1\." + BN)
    def _tr_bn(m, w):
        return emit_bn(("backbone", f"transition{m.group(1)}", f"t{m.group(2)}_bn"), m.group(3), w)

    # transitions: new-branch nested Sequential(.{j}.0 conv / .{j}.1 bn)
    @M.rule(P + r"transition(\d)\.(\d)\.(\d)\.0\.weight")
    def _tr_new_conv(m, w):
        return "params", ("backbone", f"transition{m.group(1)}", f"t{m.group(2)}_conv{m.group(3)}", "kernel"), t_conv(w)

    @M.rule(P + r"transition(\d)\.(\d)\.(\d)\.1\." + BN)
    def _tr_new_bn(m, w):
        return emit_bn(("backbone", f"transition{m.group(1)}", f"t{m.group(2)}_bn{m.group(3)}"), m.group(4), w)

    # stage branches (BasicBlocks)
    @M.rule(P + r"stage(\d)\.(\d)\.branches\.(\d)\.(\d)\.conv([12])\.weight")
    def _br_conv(m, w):
        s, mm, b, k, c = m.groups()
        return "params", ("backbone", f"stage{s}_m{mm}", f"branch{b}_block{k}", f"conv{c}", "kernel"), t_conv(w)

    @M.rule(P + r"stage(\d)\.(\d)\.branches\.(\d)\.(\d)\.bn([12])\." + BN)
    def _br_bn(m, w):
        s, mm, b, k, c, which = m.groups()
        return emit_bn(("backbone", f"stage{s}_m{mm}", f"branch{b}_block{k}", f"bn{c}"), which, w)

    @M.rule(P + r"stage(\d)\.(\d)\.branches\.(\d)\.(\d)\.downsample\.0\.weight")
    def _br_ds_conv(m, w):
        s, mm, b, k = m.groups()
        return "params", ("backbone", f"stage{s}_m{mm}", f"branch{b}_block{k}", "downsample_conv", "kernel"), t_conv(w)

    @M.rule(P + r"stage(\d)\.(\d)\.branches\.(\d)\.(\d)\.downsample\.1\." + BN)
    def _br_ds_bn(m, w):
        s, mm, b, k, which = m.groups()
        return emit_bn(("backbone", f"stage{s}_m{mm}", f"branch{b}_block{k}", "downsample_bn"), which, w)

    # fuse layers: j > i Sequential(conv, bn, up) ; j < i nested (.{k}.0/.{k}.1)
    @M.rule(P + r"stage(\d)\.(\d)\.fuse_layers\.(\d)\.(\d)\.0\.weight")
    def _fuse_up_conv(m, w):
        s, mm, i, j = m.groups()
        return "params", ("backbone", f"stage{s}_m{mm}", f"fuse{i}_{j}", "conv", "kernel"), t_conv(w)

    @M.rule(P + r"stage(\d)\.(\d)\.fuse_layers\.(\d)\.(\d)\.1\." + BN)
    def _fuse_up_bn(m, w):
        s, mm, i, j, which = m.groups()
        return emit_bn(("backbone", f"stage{s}_m{mm}", f"fuse{i}_{j}", "bn"), which, w)

    @M.rule(P + r"stage(\d)\.(\d)\.fuse_layers\.(\d)\.(\d)\.(\d)\.0\.weight")
    def _fuse_down_conv(m, w):
        s, mm, i, j, k = m.groups()
        return "params", ("backbone", f"stage{s}_m{mm}", f"fuse{i}_{j}", f"conv{k}", "kernel"), t_conv(w)

    @M.rule(P + r"stage(\d)\.(\d)\.fuse_layers\.(\d)\.(\d)\.(\d)\.1\." + BN)
    def _fuse_down_bn(m, w):
        s, mm, i, j, k, which = m.groups()
        return emit_bn(("backbone", f"stage{s}_m{mm}", f"fuse{i}_{j}", f"bn{k}"), which, w)

    # RSSFormer transformer block inside each module
    T = r"stage(\d)\.(\d)\.transformer\."

    @M.rule(P + T + r"norm([12])\.(weight|bias)")
    def _tf_ln(m, w):
        s, mm, n, which = m.groups()
        leaf = "scale" if which == "weight" else "bias"
        return "params", ("backbone", f"stage{s}_m{mm}", "transformer", f"norm{n}", leaf), w

    @M.rule(P + T + r"attn\.atrous_block([12])\.conv1\.weight")
    def _tf_sa(m, w):
        s, mm, n = m.groups()
        return "params", ("backbone", f"stage{s}_m{mm}", "transformer", "attn",
                          f"atrous_block{n}", "conv1", "kernel"), t_conv(w)

    @M.rule(P + T + r"attn\.weight_levels\.(weight|bias)")
    def _tf_wl(m, w):
        s, mm, which = m.groups()
        leaf = "kernel" if which == "weight" else "bias"
        w = t_conv(w) if which == "weight" else w
        return "params", ("backbone", f"stage{s}_m{mm}", "transformer", "attn",
                          "weight_levels", leaf), w

    @M.rule(P + T + r"attn\.attn\.(q_proj|k_proj|v_proj|out_proj)\.(weight|bias)")
    def _tf_mha(m, w):
        s, mm, proj, which = m.groups()
        leaf = "kernel" if which == "weight" else "bias"
        w = t_linear(w) if which == "weight" else w
        return "params", ("backbone", f"stage{s}_m{mm}", "transformer", "attn", "attn",
                          proj, leaf), w

    @M.rule(P + T + r"mlp\.(fc1|fc2|dw|dw6|dw12)\.(weight|bias)")
    def _tf_mlp_conv(m, w):
        s, mm, conv, which = m.groups()
        leaf = "kernel" if which == "weight" else "bias"
        w = t_conv(w) if which == "weight" else w
        return "params", ("backbone", f"stage{s}_m{mm}", "transformer", "mlp", conv, leaf), w

    @M.rule(P + T + r"mlp\.norm([123])\." + BN)
    def _tf_mlp_bn(m, w):
        s, mm, n, which = m.groups()
        return emit_bn(("backbone", f"stage{s}_m{mm}", "transformer", "mlp", f"norm{n}"), which, w)

    @M.rule(r".*num_batches_tracked")
    def _drop_nbt2(m, w):
        return None

    @M.rule(r"(incre_modules|downsamp_modules|final_layer|classifier)\..*")
    def _drop_cls_head(m, w):
        return None  # imagenet classification head of mmlab checkpoints

    return M.convert(sd, strict=strict)


def convert_rssformer(sd: Mapping[str, np.ndarray], strict: bool = True) -> dict:
    """Full HRNetFusion checkpoint (`module/baseline/hrnet_aux.py:70-134`): backbone
    under `backbone.hrnet.` (HRNetEncoder wraps the net), neck/head/headaux on top."""
    M = NameMapper()

    @M.rule(r"neck\.fuse_conv\.0\.(weight|bias)")
    def _neck_conv(m, w):
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        w = t_conv(w) if m.group(1) == "weight" else w
        return "params", ("neck", "conv", leaf), w

    @M.rule(r"neck\.fuse_conv\.1\.(weight|bias|running_mean|running_var)")
    def _neck_bn(m, w):
        which = m.group(1)
        if which in ("weight", "bias"):
            return "params", ("neck", "bn", "scale" if which == "weight" else "bias"), w
        return "batch_stats", ("neck", "bn", "mean" if which == "running_mean" else "var"), w

    @M.rule(r"head\.0\.(weight|bias)")
    def _head(m, w):
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        w = t_conv(w) if m.group(1) == "weight" else w
        return "params", ("head_conv", leaf), w

    @M.rule(r"headaux\.0\.(weight|bias)")
    def _headaux(m, w):
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        w = t_linear(w) if m.group(1) == "weight" else w
        return "params", ("headaux", leaf), w

    @M.rule(r".*num_batches_tracked")
    def _drop_nbt(m, w):
        return None

    top = {k: v for k, v in sd.items()
           if k.startswith(("neck.", "head.", "headaux."))}
    out = M.convert(top, strict=strict)

    # everything else is the encoder; strip whatever wrapper prefix it carries
    enc = {}
    for k, v in sd.items():
        if k.startswith(("neck.", "head.", "headaux.", "loss.")):
            continue
        for pre in ("backbone.hrnet.", "backbone.model.", "backbone.encoder.", "backbone."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        enc[k] = v
    enc_out = convert_hrnet(enc, strict=strict)
    params = out.get("params", {})
    params.update(enc_out.get("params", {}))
    res = {"params": params}
    bs = {}
    bs.update(out.get("batch_stats", {}))
    bs.update(enc_out.get("batch_stats", {}))
    if bs:
        res["batch_stats"] = bs
    return res


# ------------------------------------------------------------ HRFormer (HRT) backbone
def convert_hrt(sd: Mapping[str, np.ndarray], strict: bool = True,
                prefix: str = "") -> dict:
    """HRFormer checkpoints (`hrt_backbone.py:370-696`) -> HighResolutionTransformerNet
    variables (under `backbone/` like convert_hrnet, so it plugs into HRNetFusion).

    Branch blocks map `branches.{b}.{k}.{norm1, attn.attn.*_proj}`; the reference's
    `norm2` is dead (its FFN is commented out, `transformer_block.py:104`) and dropped.
    Fuse j<i chains are depthwise-separable: `.{k}.{0 dw,1 bn,2 pw,3 bn}`.
    """
    M = NameMapper()
    P = re.escape(prefix)
    BN = r"(weight|bias|running_mean|running_var)"

    def bn_emit(base_path, which, w):
        if which in ("weight", "bias"):
            return "params", base_path + ("scale" if which == "weight" else "bias",), w
        return "batch_stats", base_path + ("mean" if which == "running_mean" else "var",), w

    @M.rule(P + r"conv([12])\.weight")
    def _stem_conv(m, w):
        return "params", ("backbone", f"conv{m.group(1)}", "kernel"), t_conv(w)

    @M.rule(P + r"bn([12])\." + BN)
    def _stem_bn(m, w):
        return bn_emit(("backbone", f"bn{m.group(1)}"), m.group(2), w)

    @M.rule(P + r"layer1\.(\d)\.conv([123])\.weight")
    def _l1_conv(m, w):
        return "params", ("backbone", f"layer1_{m.group(1)}", f"conv{m.group(2)}", "kernel"), t_conv(w)

    @M.rule(P + r"layer1\.(\d)\.bn([123])\." + BN)
    def _l1_bn(m, w):
        return bn_emit(("backbone", f"layer1_{m.group(1)}", f"bn{m.group(2)}"), m.group(3), w)

    @M.rule(P + r"layer1\.(\d)\.downsample\.0\.weight")
    def _l1_ds_conv(m, w):
        return "params", ("backbone", f"layer1_{m.group(1)}", "downsample_conv", "kernel"), t_conv(w)

    @M.rule(P + r"layer1\.(\d)\.downsample\.1\." + BN)
    def _l1_ds_bn(m, w):
        return bn_emit(("backbone", f"layer1_{m.group(1)}", "downsample_bn"), m.group(2), w)

    @M.rule(P + r"transition(\d)\.(\d)\.0\.weight")
    def _tr_conv(m, w):
        return "params", ("backbone", f"transition{m.group(1)}", f"t{m.group(2)}_conv", "kernel"), t_conv(w)

    @M.rule(P + r"transition(\d)\.(\d)\.1\." + BN)
    def _tr_bn(m, w):
        return bn_emit(("backbone", f"transition{m.group(1)}", f"t{m.group(2)}_bn"), m.group(3), w)

    @M.rule(P + r"transition(\d)\.(\d)\.(\d)\.0\.weight")
    def _tr_new_conv(m, w):
        return "params", ("backbone", f"transition{m.group(1)}", f"t{m.group(2)}_conv{m.group(3)}", "kernel"), t_conv(w)

    @M.rule(P + r"transition(\d)\.(\d)\.(\d)\.1\." + BN)
    def _tr_new_bn(m, w):
        return bn_emit(("backbone", f"transition{m.group(1)}", f"t{m.group(2)}_bn{m.group(3)}"), m.group(4), w)

    # transformer branch blocks
    @M.rule(P + r"stage(\d)\.(\d)\.branches\.(\d)\.(\d)\.norm1\.(weight|bias)")
    def _blk_norm1(m, w):
        s, mm, b, k, which = m.groups()
        leaf = "scale" if which == "weight" else "bias"
        return "params", ("backbone", f"stage{s}_m{mm}", f"branch{b}_block{k}", "norm1", leaf), w

    @M.rule(P + r"stage(\d)\.(\d)\.branches\.(\d)\.(\d)\.norm2\.(weight|bias)")
    def _blk_norm2(m, w):
        return None  # dead parameters: the reference FFN is commented out

    @M.rule(P + r"stage(\d)\.(\d)\.branches\.(\d)\.(\d)\.attn\.attn\.(q_proj|k_proj|v_proj|out_proj)\.(weight|bias)")
    def _blk_attn(m, w):
        s, mm, b, k, proj, which = m.groups()
        leaf = "kernel" if which == "weight" else "bias"
        w = t_linear(w) if which == "weight" else w
        return "params", ("backbone", f"stage{s}_m{mm}", f"branch{b}_block{k}", "attn",
                          "attn", proj, leaf), w

    # fuse j > i: Sequential(1x1 conv, BN, Upsample)
    @M.rule(P + r"stage(\d)\.(\d)\.fuse_layers\.(\d)\.(\d)\.0\.weight")
    def _fuse_up_conv(m, w):
        s, mm, i, j = m.groups()
        return "params", ("backbone", f"stage{s}_m{mm}", f"fuse{i}_{j}", "conv", "kernel"), t_conv(w)

    @M.rule(P + r"stage(\d)\.(\d)\.fuse_layers\.(\d)\.(\d)\.1\." + BN)
    def _fuse_up_bn(m, w):
        s, mm, i, j, which = m.groups()
        return bn_emit(("backbone", f"stage{s}_m{mm}", f"fuse{i}_{j}", "bn"), which, w)

    # fuse j < i: nested Sequential(.{k}.{0 dw,1 bn,2 pw,3 bn})
    @M.rule(P + r"stage(\d)\.(\d)\.fuse_layers\.(\d)\.(\d)\.(\d)\.0\.weight")
    def _fuse_dw(m, w):
        s, mm, i, j, k = m.groups()
        return "params", ("backbone", f"stage{s}_m{mm}", f"fuse{i}_{j}", f"dw{k}", "kernel"), t_conv(w)

    @M.rule(P + r"stage(\d)\.(\d)\.fuse_layers\.(\d)\.(\d)\.(\d)\.1\." + BN)
    def _fuse_dwbn(m, w):
        s, mm, i, j, k, which = m.groups()
        return bn_emit(("backbone", f"stage{s}_m{mm}", f"fuse{i}_{j}", f"dwbn{k}"), which, w)

    @M.rule(P + r"stage(\d)\.(\d)\.fuse_layers\.(\d)\.(\d)\.(\d)\.2\.weight")
    def _fuse_pw(m, w):
        s, mm, i, j, k = m.groups()
        return "params", ("backbone", f"stage{s}_m{mm}", f"fuse{i}_{j}", f"pw{k}", "kernel"), t_conv(w)

    @M.rule(P + r"stage(\d)\.(\d)\.fuse_layers\.(\d)\.(\d)\.(\d)\.3\." + BN)
    def _fuse_pwbn(m, w):
        s, mm, i, j, k, which = m.groups()
        return bn_emit(("backbone", f"stage{s}_m{mm}", f"fuse{i}_{j}", f"pwbn{k}"), which, w)

    @M.rule(r".*num_batches_tracked")
    def _drop_nbt(m, w):
        return None

    @M.rule(r"(incre_modules|downsamp_modules|final_layer|classifier)\..*")
    def _drop_head(m, w):
        return None  # env-gated imagenet head

    return M.convert(sd, strict=strict)
