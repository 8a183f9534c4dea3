"""Aggregate a jax.profiler xplane trace into per-op device time.

Usage: python scripts/analyze_trace.py <trace_dir> [top_n]

Finds the newest *.xplane.pb under <trace_dir>, reads the TPU device
plane(s), and prints the top ops by total self-duration, grouped by a
coarse op-category prefix (fusion/convolution/dot/copy/...).
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys


def load_xspace(path):
    from tensorflow.core.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = load_xspace(paths[-1])
    print("planes:", [p.name for p in xs.planes])

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = collections.Counter()
        counts = collections.Counter()
        total_ps = 0
        for line in plane.lines:
            # XLA Ops / XLA Modules lines carry per-op events
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps
                counts[name] += 1
                total_ps += ev.duration_ps
        if not totals:
            continue
        print(f"\n=== plane {plane.name}: total {total_ps/1e12*1000:.2f} ms over lines={len(plane.lines)}")
        cat = collections.Counter()
        for name, ps in totals.items():
            prefix = re.split(r"[.\d]", name, 1)[0]
            cat[prefix] += ps
        print("--- by category:")
        for name, ps in cat.most_common(15):
            print(f"  {ps/1e9:10.3f} ms  {100*ps/max(total_ps,1):5.1f}%  {name}")
        print(f"--- top {top_n} ops:")
        for name, ps in totals.most_common(top_n):
            print(f"  {ps/1e9:10.3f} ms  x{counts[name]:<4d} {100*ps/max(total_ps,1):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
