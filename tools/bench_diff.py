#!/usr/bin/env python3
"""Per-query bench regression diff between two committed bench records.

Usage: python3 tools/bench_diff.py bench_r08.json bench_r09.json [min_delta_sec]

Prints queries present in both (sorted by delta, worst first), then
queries only in one record (added/removed). Medians are already
warmed-up per-query medians, so a delta here is a plan change, not
noise — but treat sub-0.3 s deltas as within host jitter anyway.
"""
import json
import sys


def main(old_path, new_path, min_delta=0.3):
    old_rec = json.load(open(old_path))
    new_rec = json.load(open(new_path))
    old = old_rec["queries"]
    new = new_rec["queries"]
    both = sorted(set(old) & set(new), key=lambda q: new[q] - old[q],
                  reverse=True)
    moved = [(q, old[q], new[q]) for q in both
             if abs(new[q] - old[q]) >= min_delta]
    print(f"# {old_path} -> {new_path}")
    print(f"shared={len(both)} added={len(set(new) - set(old))} "
          f"removed={len(set(old) - set(new))} "
          f"total {sum(old.values()):.2f}s -> {sum(new.values()):.2f}s")
    # host-health control (records since r15 carry it): stream-gate
    # drift that moves WITH the floor is host noise, against a flat
    # floor an engine regression — condition the x_stream_* movers
    # below on this line before reading them as regressions
    floors = [r.get("stream_floor") for r in (old_rec, new_rec)]
    if any(f is not None for f in floors):
        def fmt(f): return "n/a" if f is None else f"{f:.3f}s"
        s_old = sum(v for k, v in old.items() if k.startswith("x_stream_"))
        s_new = sum(v for k, v in new.items() if k.startswith("x_stream_"))
        print(f"stream_floor {fmt(floors[0])} -> {fmt(floors[1])}  "
              f"(stream-family sum {s_old:.2f}s -> {s_new:.2f}s)")
    # floor-NORMALIZED stream number (records since r16 carry it): the
    # engine share of the stream family after subtracting the measured
    # per-micro-batch harness floor — the round-over-round comparable
    # that does not ride datacenter weather
    adj = [r.get("total_stream_adjusted") for r in (old_rec, new_rec)]
    if any(a is not None for a in adj):
        def fmta(a): return "n/a" if a is None else f"{a:.2f}s"
        print(f"stream engine share (floor-adjusted) "
              f"{fmta(adj[0])} -> {fmta(adj[1])}")
    # the round-over-round comparable: sums over the SHARED query set
    # only (an added/removed gate must not masquerade as a regression/
    # improvement) — cite THESE numbers in round notes, so any reader
    # can regenerate them from the committed bench_r*.json with this
    # one command
    print(f"shared-set sum {sum(old[q] for q in both):.2f}s -> "
          f"{sum(new[q] for q in both):.2f}s "
          f"(delta {sum(new[q] - old[q] for q in both):+.2f}s)")
    if moved:
        print(f"\n## movers (|delta| >= {min_delta}s)")
        for q, a, b in moved:
            print(f"{b - a:+7.2f}s  {a:7.2f} -> {b:7.2f}  {q}")
    added = sorted(set(new) - set(old), key=lambda q: -new[q])
    if added:
        print("\n## added")
        for q in added:
            print(f"         {new[q]:7.2f}           {q}")
    removed = sorted(set(old) - set(new))
    if removed:
        print("\n## removed")
        for q in removed:
            print(f"         {old[q]:7.2f}           {q}")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__.strip(), file=sys.stderr)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 0.3)
