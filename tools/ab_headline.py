"""On-chip A/B for the headline config (TSCD/MiT-B1 512^2 batch 8 predict):
act_dtype f32 vs bf16 residual-stream residency, fused_blocks on/off.

Usage: python tools/ab_headline.py [--variants f32,bf16,xla_f32,xla_bf16]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="f32,bf16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--no-s2d", action="store_true")
    ap.add_argument("--no-presr", action="store_true")
    ap.add_argument("--taps", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import device_seconds_per_call
    from representationlearning_tpu.models.tscd import TSCD
    from representationlearning_tpu.ops.pallas import mit_block as MB
    from representationlearning_tpu.models import mit as MIT

    # isolation monkeypatches (A/B only): --no-s2d reverts the space-to-depth
    # stem; --no-presr sends sr>1 blocks back to the XLA reference path (the
    # round-3 fused coverage)
    if args.no_s2d:
        # same params, plain strided-conv lowering (what the stem did pre-s2d)
        from representationlearning_tpu.ops import image as IMG

        def plain_conv(x, kernel, bias=None, stride=4, padding=3, dtype=None):
            out = jax.lax.conv_general_dilated(
                x, kernel, (stride, stride),
                [(padding, padding), (padding, padding)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return out + bias if bias is not None else out
        IMG.space_to_depth_conv = plain_conv
        MIT.space_to_depth_conv = plain_conv  # in case of from-import
    if args.taps:
        # round-3 behavior: sr>1 blocks run the in-kernel sr-taps pallas path
        orig_fused_t = MB.fused_block

        def taps_fused(x, p, *, H, W, sr, nh, dtype=jnp.float32, export=False):
            B, N, C = x.shape
            hid = p["fc1_kernel"].shape[1]
            Nk = (H // sr) * (W // sr) if sr > 1 else N
            if (jax.default_backend() == "tpu"
                    and MB._vmem_fits(N, C, hid, Nk, nh, export)
                    and (not export or sr == 1)):
                return MB.fused_block_pallas(x, p, H=H, W=W, sr=sr, nh=nh,
                                             dtype=dtype, export=export)
            return MB.fused_block_reference(x, p, H=H, W=W, sr=sr, nh=nh,
                                            dtype=dtype, export=export)
        MB.fused_block = taps_fused
    if args.no_presr:
        orig_fused = MB.fused_block

        def no_presr(x, p, *, H, W, sr, nh, dtype=jnp.float32, export=False):
            if sr > 1:
                return MB.fused_block_reference(x, p, H=H, W=W, sr=sr, nh=nh,
                                                dtype=dtype, export=export)
            return orig_fused(x, p, H=H, W=W, sr=sr, nh=nh, dtype=dtype,
                              export=export)
        MB.fused_block = no_presr
        MIT.fused_block = no_presr if hasattr(MIT, "fused_block") else None

    batch = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32)

    spec = {
        "f32": dict(fused_blocks=True, act_dtype=None),
        "bf16": dict(fused_blocks=True, act_dtype=jnp.bfloat16),
        "xla_f32": dict(fused_blocks=False, act_dtype=None),
        "xla_bf16": dict(fused_blocks=False, act_dtype=jnp.bfloat16),
        # r5: grouped-taps stem (transpose-free s2d; ops/image.py::
        # grouped_taps_conv) — fused K=s*s*C contraction vs split K=s*C terms
        "bf16_taps": dict(fused_blocks=True, act_dtype=jnp.bfloat16,
                          taps_stem=True),
        "bf16_taps_split": dict(fused_blocks=True, act_dtype=jnp.bfloat16,
                                taps_stem=True),
    }
    variables = None
    ref_out = None
    for name in args.variants.split(","):
        kw = spec[name]
        if name.endswith("_split"):
            from representationlearning_tpu.ops import image as IMG
            orig_gtc = IMG.grouped_taps_conv

            def split_gtc(x, k, b=None, stride=4, padding=3, dtype=None,
                          split_r=False, _o=orig_gtc):
                return _o(x, k, b, stride=stride, padding=padding,
                          dtype=dtype, split_r=True)
            MIT.grouped_taps_conv = split_gtc
            IMG.grouped_taps_conv = split_gtc
        model = TSCD(backbone="mit_b1", num_classes=21, dtype=jnp.bfloat16, **kw)
        if variables is None:
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

        def fwd(v, xx, model=model):
            return model.apply(v, xx)[1].mean().astype(jnp.float32)

        @jax.jit
        def chained(v, xx, k, fwd=fwd):
            return jax.lax.fori_loop(
                0, k, lambda i, c: fwd(v, xx + c * 1e-12), jnp.float32(0.0))

        def run(v, xx, k, chained=chained):
            return float(chained(v, xx, k))

        out = float(jax.jit(fwd)(variables, x))
        if ref_out is None:
            ref_out = out
        sec = device_seconds_per_call(run, variables, x)
        print(f"{name}: {batch / sec:.1f} tiles/s  ({sec * 1e3:.2f} ms/call)  "
              f"out={out:.6f} (ref {ref_out:.6f})", flush=True)


if __name__ == "__main__":
    main()
