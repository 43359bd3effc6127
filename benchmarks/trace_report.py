"""Bucketed device-time report from a jax.profiler xplane trace.

Usage: python benchmarks/trace_report.py [trace_dir] [n_iters]

Feeds the xplane written by `jax.profiler.trace` (default
/tmp/hier_trace, the path benchmarks/trace_hier.py uses) through
xprof's framework_op_stats converter, then prints the per-op table and
a bucketed rollup (pix/box/vert/horiz/wta/lr/speckle/glue). Durations
are divided by ``n_iters`` (the number of traced dispatches, default 3
to match trace_hier.py) so the table reads as per-dispatch ms.
"""

from __future__ import annotations

import collections
import json
import pathlib
import sys


BUCKETS = [
    # (bucket, substrings matched against the lowercased op name). XLA op
    # names carry the enclosing jit() scope, so kernels bucket by their
    # wrapper function; the three reduce kernels (vert/horiz/wta) share
    # one jit scope and appear as a single bucket at this granularity
    # (use the hlo_stats tool for the per-fusion split).
    ("pix", ("banded_pixel_cost_pack",)),
    ("box", ("aligned_box_packed",)),
    ("downsample", ("downsample_box_pack",)),
    ("reduce(vert+horiz+wta)", ("banded_reduce_pack)/pallas_call",)),
    ("stats-slice", ("banded_reduce_pack)/slice",)),
    ("lr", ("lr_fail_pallas", "lr_kernel")),
    ("speckle", ("speckle_filter",)),
    ("sgm(full-D)", ("sgm_reduce", "cost_pallas", "fused_cost")),
]


def main() -> None:
    from xprof.convert import raw_to_tool_data

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hier_trace"
    iters = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    paths = [str(p) for p in pathlib.Path(trace_dir).rglob("*.xplane.pb")]
    if not paths:
        print(f"no .xplane.pb under {trace_dir}")
        return
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "framework_op_stats", {})
    tables = json.loads(data.decode() if isinstance(data, bytes) else data)
    table = tables[0] if isinstance(tables, list) else tables
    col_ids = [c["id"] for c in table["cols"]]

    def row_dict(r):
        return {
            cid: (cell or {}).get("v") for cid, cell in zip(col_ids, r["c"])
        }

    ops: dict[str, float] = collections.defaultdict(float)
    on_device = 0.0
    idle = 0.0
    for raw in table["rows"]:
        row = row_dict(raw)
        if str(row.get("host_or_device", "")).lower().startswith("host"):
            continue
        name = str(row.get("operation", "?"))
        dev_us = float(row.get("total_self_time") or 0.0)
        if name == "IDLE":
            # Dispatch/tunnel gaps between the traced calls, not program
            # time — report separately so buckets read as device busy.
            idle += dev_us / 1e3
            continue
        ops[name] += dev_us / 1e3
        on_device += dev_us / 1e3

    print(f"# device op table (self-time ms per dispatch, {len(paths)} xspace)")
    for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms / iters:9.3f}  {name[:110]}")

    bucket_ms = collections.defaultdict(float)
    for name, ms in ops.items():
        low = name.lower()
        for bucket, keys in BUCKETS:
            if any(k in low for k in keys):
                bucket_ms[bucket] += ms
                break
        else:
            bucket_ms["xla-glue"] += ms
    print("\n# buckets, ms per dispatch")
    for bucket, ms in sorted(bucket_ms.items(), key=lambda kv: -kv[1]):
        print(f"{ms / iters:9.3f}  {bucket}")
    print(f"{on_device / iters:9.3f}  TOTAL device busy")
    print(f"{idle / iters:9.3f}  (idle between traced dispatches, excluded)")


if __name__ == "__main__":
    main()
