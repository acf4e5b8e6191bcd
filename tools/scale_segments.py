#!/usr/bin/env python3
"""Segment-slope table for a SCALE_ZIPF witness series.

Usage: tools/scale_segments.py <witness> [factor ...]
  e.g. tools/scale_segments.py substrk20 30 100 300 1000
       tools/scale_segments.py winnowcap 30 100 1000
       tools/scale_segments.py ""        10 30 100 1000   # plain zipf series

Reads SCALE_ZIPF_{factor}x[_{witness}].json records and prints, per
operator, the full-span slope and the per-decade SEGMENT slopes of the
SHUFFLE-VOLUME ratio (the machine/heap-independent linearity witness:
slope = log(r2/r1)/log(f2/f1), 1.0 = exactly linear). Wall-time ratios
ride alongside with each record's heap stamp, because wall swings ±2×
with heap/GC regime alone (measured, SCALE.md round 8) — slope claims
key on shuffle bytes. Records with different io_codec are flagged:
cross-codec BYTE comparisons are invalid (in-record ratios are always
same-codec and stay valid).

Dev/report tool — the shipped Scala engine never depends on this.
"""
import json
import math
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    witness = sys.argv[1]
    factors = [int(f) for f in sys.argv[2:]]
    suffix = f"_{witness}" if witness else ""
    recs = {}
    for f in factors:
        name = f"SCALE_ZIPF_{f}x{suffix}.json"
        try:
            recs[f] = json.load(open(name))
        except FileNotFoundError:
            print(f"  (missing {name} — skipped)")
    if not recs:
        return 1
    codecs = {f: r.get("io_codec", "lz4") for f, r in recs.items()}
    if len(set(codecs.values())) > 1:
        print(f"WARNING: mixed io_codec across records: {codecs} — "
              "cross-record byte columns are not comparable")
    ops = sorted({op for r in recs.values() for op in r["queries"]})
    for op in ops:
        pts = [(f, recs[f]["queries"][op]) for f in sorted(recs)
               if op in recs[f]["queries"]]
        if len(pts) < 2:
            continue
        print(f"\n{op}")
        print(f"  {'factor':>7} {'shuffle_ratio':>13} {'slope_seg':>9} "
              f"{'wall_ratio':>10} {'heap_mb':>8} {'timed_clean':>11}")
        prev = None
        for f, q in pts:
            sr = q.get("shuffle_ratio")
            seg = ""
            if prev is not None and sr and prev[1]:
                seg = f"{math.log(sr / prev[1]) / math.log(f / prev[0]):.3f}"
            load = recs[f].get("load", {})
            timed = load.get("timed_steal_max")
            clean = ("yes" if (timed is not None and timed <= 0.5 and
                               load.get("timed_foreign_max", 0) <= 0.5)
                     else ("n/a(pre-r13)" if timed is None else "NO"))
            print(f"  {f:>7} {sr if sr else float('nan'):>13.3f} {seg:>9} "
                  f"{q['ratio']:>10.3f} {recs[f].get('heap_max_mb', 0):>8} "
                  f"{clean:>11}")
            if sr:
                prev = (f, sr)
        f0, q0 = pts[0]
        f1, q1 = pts[-1]
        if q0.get("shuffle_ratio") and q1.get("shuffle_ratio"):
            full = (math.log(q1["shuffle_ratio"] / q0["shuffle_ratio"]) /
                    math.log(f1 / f0))
            print(f"  full-span slope ({f0}x -> {f1}x): {full:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
