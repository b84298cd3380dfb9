"""Achieved-TF/s breakdown from an xplane trace: groups device ops by HLO
category (convolution fusion, custom/pallas, loop fusion, data formatting, ...)
and reports per-group total ms, XLA-counted FLOPs, achieved TF/s and bytes.
Usage: python tools/tfs_breakdown.py <logdir> [top_n]
"""
from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from xplane import load_xplanes  # noqa: E402


def breakdown(logdir, top_n=15):
    xs = load_xplanes(logdir)
    groups = collections.defaultdict(lambda: [0, 0, 0, 0])  # ps, flops, bytes, n
    ops = collections.defaultdict(lambda: [0, 0, 0, 0])
    for plane in xs.planes:
        nm = plane.name.lower()
        if "tpu" not in nm and "device" not in nm:
            continue
        emeta = plane.event_metadata
        smeta = plane.stat_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = emeta[ev.metadata_id]
                cat, fl, by = "?", 0, 0
                for st in list(ev.stats) + list(m.stats):
                    key = smeta[st.metadata_id].name if st.metadata_id in smeta else ""
                    if key == "hlo_category":
                        cat = st.str_value
                    elif key == "flops":
                        fl = st.int64_value
                    elif key == "raw_bytes_accessed":
                        by = st.int64_value
                for d, k in ((groups, cat), (ops, m.display_name or m.name)):
                    d[k][0] += ev.duration_ps
                    d[k][1] += fl
                    d[k][2] += by
                    d[k][3] += 1
    total_ps = sum(v[0] for v in groups.values())
    print(f"total device ms: {total_ps/1e9:.2f}")
    print(f"{'ms':>9} {'%':>5} {'TF/s':>7} {'GB/s':>7} {'calls':>6}  category")
    for cat, (ps, fl, by, n) in sorted(groups.items(), key=lambda kv: -kv[1][0]):
        sec = ps / 1e12
        tfs = fl / sec / 1e12 if sec else 0
        gbs = by / sec / 1e9 if sec else 0
        print(f"{ps/1e9:9.2f} {100*ps/max(total_ps,1):5.1f} {tfs:7.1f} {gbs:7.0f} {n:6d}  {cat}")
    print("\nTop ops by time (achieved TF/s):")
    for op, (ps, fl, by, n) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:top_n]:
        sec = ps / 1e12
        tfs = fl / sec / 1e12 if sec else 0
        gbs = by / sec / 1e9 if sec else 0
        print(f"{ps/1e9:9.2f} ms {tfs:7.1f} TF/s {gbs:7.0f} GB/s {n:5d}  {op[:80]}")


if __name__ == "__main__":
    breakdown(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 15)
