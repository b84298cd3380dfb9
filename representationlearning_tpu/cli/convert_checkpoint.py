"""PyTorch checkpoint -> JAX variables converter CLI.

Covers the reference's checkpoint surface (SURVEY.md §5): official SegFormer
mit_b0..b5 (`pretrained/mit_b1.pth`), trained TSCD (`weight/tscd_model.pth`),
torchvision / WaveCAM ResNet-50 stage checkpoints, mmlab HRNetV2 and trained
RSSFormer HRNetFusion. DDP `module.` prefixes are stripped automatically.

Usage:
    python -m representationlearning_tpu.cli.convert_checkpoint \
        --family {mit,tscd,resnet50,wavecam_net,hrnet,rssformer} \
        --src /path/model.pth --dst out.npy [--report]

The output .npy holds {"params": ..., "batch_stats": ...} numpy trees loadable with
`np.load(dst, allow_pickle=True).item()` and usable directly as flax variables.
"""
from __future__ import annotations

import argparse

import numpy as np

from ..convert import torch2jax as C

FAMILIES = {
    "mit": C.convert_mit,
    "tscd": C.convert_tscd,
    "resnet50": C.convert_resnet50,
    "wavecam_net": C.convert_wavecam_net,
    "hrnet": C.convert_hrnet,
    "rssformer": C.convert_rssformer,
}


def _tree_stats(tree, prefix=""):
    n, total = 0, 0
    for k, v in tree.items():
        if isinstance(v, dict):
            a, b = _tree_stats(v)
            n += a
            total += b
        else:
            n += 1
            total += int(np.prod(v.shape))
    return n, total


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=sorted(FAMILIES), required=True)
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--no-strict", action="store_true",
                    help="ignore torch params with no mapping instead of raising")
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args(argv)

    sd = C.load_torch_checkpoint(args.src)
    variables = FAMILIES[args.family](sd, strict=not args.no_strict)
    np.save(args.dst, variables, allow_pickle=True)

    if args.report:
        for coll in ("params", "batch_stats"):
            if coll in variables:
                n, total = _tree_stats(variables[coll])
                print(f"{coll}: {n} tensors, {total:,} values")
        print(f"torch entries consumed: {len(sd)}")
    print(f"wrote {args.dst}")
    return variables


if __name__ == "__main__":
    main()
