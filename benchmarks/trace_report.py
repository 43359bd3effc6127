"""Bucketed device-time report from a jax.profiler xplane trace.

Usage: python benchmarks/trace_report.py [trace_dir] [n_iters]

Walks the xplane protobuf written by `jax.profiler.trace` (default
/tmp/hier_trace, the path benchmarks/trace_hier.py uses), finds the TPU
device plane(s), sums event durations by op name, and prints a table
plus a bucketed rollup (pix/box/vert/horiz/wta/lr/speckle/coarse/glue).
Durations are divided by ``n_iters`` (the number of traced dispatches,
default 3 to match trace_hier.py) so the table reads as per-dispatch ms.

If the remote-TPU tunnel delivered no device lanes, the report says so
(host-only planes are ignored rather than misread as device time).
"""

from __future__ import annotations

import collections
import gzip
import pathlib
import sys

from xprof.protobuf import xplane_pb2


BUCKETS = [
    # (bucket, substrings matched against the lowercased op/kernel name)
    ("pix", ("pix_kernel",)),
    ("box", ("box_kernel",)),
    ("downsample", ("downsample_kernel",)),
    ("vert", ("vert_kernel",)),
    ("horiz", ("horiz_kernel",)),
    ("wta", ("wta_kernel",)),
    ("lr", ("lr_kernel",)),
    ("speckle", ("while",)),  # speckle is the only while-loop on the TPU path
]


def load_xspaces(trace_dir: str):
    root = pathlib.Path(trace_dir)
    for p in sorted(root.rglob("*.xplane.pb")):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(p.read_bytes())
        yield p, xs
    for p in sorted(root.rglob("*.xplane.pb.gz")):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(gzip.decompress(p.read_bytes()))
        yield p, xs


def device_op_times(xs) -> dict[str, float]:
    """op/kernel name -> total duration in ms, from device planes only."""
    out: dict[str, float] = collections.defaultdict(float)
    for plane in xs.planes:
        name = plane.name.lower()
        if not ("/device:tpu" in name or name.startswith("tpu") or "axon" in name):
            continue
        if "host" in name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()} if hasattr(
            plane.event_metadata, "values"
        ) else {}
        if not meta:
            meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; step/module lines double-count.
            if "step" in lname or "module" in lname:
                continue
            for ev in line.events:
                out[meta.get(ev.metadata_id, str(ev.metadata_id))] += (
                    ev.duration_ps / 1e9
                )
    return dict(out)


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hier_trace"
    iters = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    total: dict[str, float] = collections.defaultdict(float)
    n_spaces = 0
    for path, xs in load_xspaces(trace_dir):
        ops = device_op_times(xs)
        if ops:
            n_spaces += 1
            for k, v in ops.items():
                total[k] += v
    if not total:
        print("no device planes found — the tunnel delivered a host-only trace")
        return

    rows = sorted(total.items(), key=lambda kv: -kv[1])
    print(f"# device op table ({n_spaces} xspace file(s)), ms per dispatch")
    for name, ms in rows[:40]:
        print(f"{ms / iters:9.3f}  {name}")

    bucket_ms = collections.defaultdict(float)
    for name, ms in total.items():
        low = name.lower()
        for bucket, keys in BUCKETS:
            if any(k in low for k in keys):
                bucket_ms[bucket] += ms
                break
        else:
            bucket_ms["xla-glue"] += ms
    print("\n# buckets, ms per dispatch")
    tot = 0.0
    for bucket, ms in sorted(bucket_ms.items(), key=lambda kv: -kv[1]):
        print(f"{ms / iters:9.3f}  {bucket}")
        tot += ms
    print(f"{tot / iters:9.3f}  TOTAL device busy")


if __name__ == "__main__":
    main()
