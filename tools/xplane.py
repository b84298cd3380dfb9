"""Parse a jax.profiler xplane.pb trace into a per-op duration histogram.

Usage:
    with jax.profiler.trace(logdir): ...run steps...
    python tools/xplane.py <logdir> [top_n]

Aggregates XLA-op events on the device plane(s) by op-name prefix/fusion name,
printing total ms, call count, and share — the histogram format PERF.md uses.
Requires tensorflow's xplane_pb2 (pure-python protobuf fallback is set below,
the bundled plugin's generated protos predate protoc 3.19).
"""
from __future__ import annotations

import os

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import collections
import glob
import sys


def load_xplanes(logdir):
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def device_op_histogram(logdir, merge_fusion_digits=True):
    """Return {op_name: (total_ps, count)} for XLA ops on TPU/device planes."""
    xspace = load_xplanes(logdir)
    hist = collections.defaultdict(lambda: [0, 0])
    total_ps = 0
    for plane in xspace.planes:
        name = plane.name.lower()
        # device planes: "/device:TPU:0" or "TPU:0"-style; skip host threads
        if "tpu" not in name and "device" not in name and "gpu" not in name:
            continue
        if "host" in name and "tpu" not in name:
            continue
        emeta = plane.event_metadata
        for line in plane.lines:
            # ONLY the serial compute line — 'Async XLA Ops' is the DMA-engine
            # line whose events OVERLAP compute (summing it double-counts)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = emeta[ev.metadata_id]
                op = m.display_name or m.name
                if merge_fusion_digits:
                    op = _canon(op)
                hist[op][0] += ev.duration_ps
                hist[op][1] += 1
                total_ps += ev.duration_ps
    return hist, total_ps


def _canon(op):
    # strip trailing .N / numeric suffixes so fusion.123 buckets merge
    import re

    op = re.sub(r"\.\d+$", "", op)
    op = re.sub(r"\d+$", "", op)
    return op


def print_histogram(logdir, top_n=30):
    hist, total_ps = device_op_histogram(logdir)
    rows = sorted(hist.items(), key=lambda kv: -kv[1][0])
    total_ms = total_ps / 1e9
    print(f"total device op time: {total_ms:.2f} ms over {len(rows)} op buckets")
    print(f"{'ms':>9}  {'%':>5}  {'calls':>6}  op")
    for op, (ps, n) in rows[:top_n]:
        ms = ps / 1e9
        print(f"{ms:9.3f}  {100*ps/max(total_ps,1):5.1f}  {n:6d}  {op[:110]}")
    return rows, total_ms


if __name__ == "__main__":
    print_histogram(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
