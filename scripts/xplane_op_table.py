"""Device-op attribution table from a JAX xprof trace (VERDICT r3 #5).

Parses a `*.xplane.pb` directly (the installed tensorboard profiler
wheel can't — its pywrap lacks xspace_to_tools_data) and aggregates the
TPU device plane's "XLA Ops" line into (op name, HLO category) ->
total ms / count / share, writing a JSON table next to the trace and a
markdown summary to stdout.

Usage:  python scripts/xplane_op_table.py <trace_dir_or_pb> [out.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict


def find_pb(path: str) -> str:
    if path.endswith(".pb"):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return hits[-1]


def op_table(pb_path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(pb_path, "rb") as f:
        xs.ParseFromString(f.read())
    plane = next((p for p in xs.planes if "TPU" in p.name
                  and sum(len(l.events) for l in p.lines)), None)
    if plane is None:
        raise RuntimeError(
            f"no TPU device plane with events in {pb_path}: "
            f"{[p.name for p in xs.planes]}")

    smeta = {k: v.name for k, v in plane.stat_metadata.items()}
    agg = defaultdict(lambda: [0, 0.0])     # (name, cat) -> [count, ps]
    line_used = None
    for line in plane.lines:
        # the op-level line is the busiest; module/step lines nest it
        if line_used is None or (len(line.events)
                                 > len(line_used.events)):
            line_used = line
    for ev in line_used.events:
        md = plane.event_metadata[ev.metadata_id]
        cat = ""
        for st in list(ev.stats) + list(md.stats):
            if smeta.get(st.metadata_id, "") == "hlo_category":
                cat = (st.str_value
                       or plane.stat_metadata[st.ref_value].name
                       if st.ref_value else st.str_value)
        agg[(md.name, cat)][0] += 1
        agg[(md.name, cat)][1] += ev.duration_ps

    total_ps = sum(v[1] for v in agg.values()) or 1
    rows = [
        {"op": name, "category": cat, "count": c,
         "total_ms": round(ps / 1e9, 3),
         "share_pct": round(100.0 * ps / total_ps, 2)}
        for (name, cat), (c, ps) in agg.items()
    ]
    rows.sort(key=lambda r: -r["total_ms"])
    by_cat = defaultdict(float)
    for r in rows:
        by_cat[r["category"] or "uncategorized"] += r["share_pct"]
    return {
        "trace": pb_path,
        "line": line_used.name,
        "device_total_ms": round(total_ps / 1e9, 3),
        "by_category_pct": {k: round(v, 2) for k, v in
                            sorted(by_cat.items(), key=lambda kv: -kv[1])},
        "top_ops": rows[:60],
    }


def main():
    pb = find_pb(sys.argv[1] if len(sys.argv) > 1 else "logs/xprof")
    out = sys.argv[2] if len(sys.argv) > 2 else None
    table = op_table(pb)
    if out:
        with open(out, "w") as f:
            json.dump(table, f, indent=1)
    print(f"# device-op table: {pb}")
    print(f"line={table['line']} total={table['device_total_ms']} ms")
    print("by category:", json.dumps(table["by_category_pct"]))
    print(f"{'ms':>10} {'%':>6} {'count':>8}  op")
    for r in table["top_ops"][:30]:
        print(f"{r['total_ms']:>10.3f} {r['share_pct']:>6.2f} "
              f"{r['count']:>8}  {r['op'][:90]}")


if __name__ == "__main__":
    main()
