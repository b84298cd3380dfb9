"""Round-trip tests for the torch->jax converter: synthesize a torch-named state dict
from a flax init by inverting the layout rules, convert, and require exact equality of
the whole tree (so every name and every transpose is audited)."""
import jax
import jax.numpy as jnp
import numpy as np

from representationlearning_tpu.convert import torch2jax as C
from representationlearning_tpu.models.mit import make_mit
from representationlearning_tpu.models.tscd import TSCD


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _inv_linear(w):
    return w.T


def _inv_conv(w):
    return w.transpose(3, 2, 0, 1)


def _mit_torch_names(flat, prefix=""):
    """Invert the converter's MiT mapping: flax path -> torch name + inverse transform."""
    sd = {}
    for path, w in flat.items():
        p = list(path)
        if p[0].startswith("patch_embed"):
            if p[1] == "proj":
                leaf = "weight" if p[-1] == "kernel" else "bias"
                sd[f"{prefix}{p[0]}.proj.{leaf}"] = _inv_conv(w) if leaf == "weight" else w
            else:
                leaf = "weight" if p[-1] == "scale" else "bias"
                sd[f"{prefix}{p[0]}.norm.{leaf}"] = w
        elif p[0].startswith("block"):
            stage, idx = p[0][5:].split("_")
            base = f"{prefix}block{stage}.{idx}"
            if p[1] in ("norm1", "norm2"):
                leaf = "weight" if p[-1] == "scale" else "bias"
                sd[f"{base}.{p[1]}.{leaf}"] = w
            elif p[1] == "attn":
                if p[2] in ("q", "kv", "proj"):
                    leaf = "weight" if p[-1] == "kernel" else "bias"
                    sd[f"{base}.attn.{p[2]}.{leaf}"] = _inv_linear(w) if leaf == "weight" else w
                elif p[2] == "sr":
                    leaf = "weight" if p[-1] == "kernel" else "bias"
                    sd[f"{base}.attn.sr.{leaf}"] = _inv_conv(w) if leaf == "weight" else w
                elif p[2] == "norm":
                    leaf = "weight" if p[-1] == "scale" else "bias"
                    sd[f"{base}.attn.norm.{leaf}"] = w
            elif p[1] == "mlp":
                if p[2] in ("fc1", "fc2"):
                    leaf = "weight" if p[-1] == "kernel" else "bias"
                    sd[f"{base}.mlp.{p[2]}.{leaf}"] = _inv_linear(w) if leaf == "weight" else w
                else:  # dwconv
                    leaf = "weight" if p[-1] == "kernel" else "bias"
                    sd[f"{base}.mlp.dwconv.dwconv.{leaf}"] = _inv_conv(w) if leaf == "weight" else w
        elif p[0].startswith("norm"):
            leaf = "weight" if p[-1] == "scale" else "bias"
            sd[f"{prefix}{p[0]}.{leaf}"] = w
    return sd


def test_mit_converter_roundtrip():
    m = make_mit("mit_b0")
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    flat = _flatten(variables["params"])
    sd = _mit_torch_names(flat)
    sd["head.weight"] = np.zeros((1000, 256), np.float32)  # must be dropped
    sd["head.bias"] = np.zeros((1000,), np.float32)
    out = C.convert_mit(sd)
    flat2 = _flatten(out["params"])
    assert set(flat2) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(flat[k], flat2[k], err_msg=str(k))


def test_tscd_converter_roundtrip():
    model = TSCD(backbone="mit_b0", num_classes=21)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    pflat = _flatten(variables["params"])
    sflat = _flatten(variables.get("batch_stats", {}))

    sd = {}
    sd.update(_mit_torch_names({k[1:]: v for k, v in pflat.items() if k[0] == "encoder"},
                               prefix="encoder."))
    for path, w in pflat.items():
        p = list(path)
        if p[0] == "decoder":
            if p[1].startswith("linear_c"):
                leaf = "weight" if p[-1] == "kernel" else "bias"
                sd[f"decoder.{p[1]}.proj.{leaf}"] = _inv_linear(w) if leaf == "weight" else w
            elif p[1] == "linear_fuse":
                if p[2] == "conv":
                    sd["decoder.linear_fuse.conv.weight"] = _inv_conv(w)
                else:
                    leaf = "weight" if p[-1] == "scale" else "bias"
                    sd[f"decoder.linear_fuse.bn.{leaf}"] = w
            elif p[1] == "linear_pred":
                leaf = "weight" if p[-1] == "kernel" else "bias"
                sd[f"decoder.linear_pred.{leaf}"] = _inv_conv(w) if leaf == "weight" else w
        elif p[0] == "attn_proj":
            leaf = "weight" if p[-1] == "kernel" else "bias"
            sd[f"attn_proj.{leaf}"] = _inv_conv(w) if leaf == "weight" else w
        elif p[0] == "classifier":
            sd["classifier.weight"] = _inv_conv(w)
    for path, w in sflat.items():
        sd[f"decoder.linear_fuse.bn.running_{'mean' if path[-1]=='mean' else 'var'}"] = w
    sd["decoder.linear_fuse.bn.num_batches_tracked"] = np.array(0)

    out = C.convert_tscd(sd)
    flat2 = _flatten(out["params"])
    assert set(flat2) == set(pflat)
    for k in pflat:
        np.testing.assert_array_equal(pflat[k], flat2[k], err_msg=str(k))
    bs2 = _flatten(out["batch_stats"])
    assert set(bs2) == set(sflat)

    # converted tree must run
    logits, seg, attns, ap = model.apply(out, jnp.zeros((1, 32, 32, 3)))
    assert logits.shape == (1, 20)


def test_converter_strict_raises_on_unknown():
    import pytest

    with pytest.raises(KeyError):
        C.convert_mit({"bogus.weight": np.zeros((2, 2), np.float32)})


def test_module_prefix_strip(tmp_path):
    import torch

    sd = {"module.norm1.weight": torch.ones(4), "norm1.bias": torch.zeros(4)}
    p = tmp_path / "ck.pth"
    torch.save(sd, p)
    out = C.load_torch_checkpoint(str(p))
    assert set(out) == {"norm1.weight", "norm1.bias"}
