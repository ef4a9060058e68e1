#!/usr/bin/env python3
"""Round-over-round bench adjudication (the SCALE §6 discipline):
compare two bench_out.json artifacts and list every query whose wall
or shuffle-record signature moved beyond a threshold. Walls on this
box are noisy (BENCH_STABILITY.md) — the discipline is that every
RECORD mover must be named and attributed to a code change, while
wall-only movers with zero record movement read as box drift.

Usage: python3 tools/bench_adjudicate.py <prev.json> <cur.json> [ratio]
Prints a JSON summary: totals, per-query wall/record movers (ratio
defaults to 1.3), added/removed queries.
"""
import json
import sys


def main():
    prev_f, cur_f = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    prev = json.load(open(prev_f))
    cur = json.load(open(cur_f))
    pq, cq = prev["queries"], cur["queries"]
    pr = prev.get("shuffle_records", {})
    cr = cur.get("shuffle_records", {})
    common = sorted(set(pq) & set(cq))

    def movers(a, b):
        out = []
        for q in common:
            x, y = a.get(q), b.get(q)
            if x is None or y is None:
                continue
            lo, hi = min(x, y), max(x, y)
            # tiny absolute values are ratio-noise, not signal
            if hi > max(lo, 1e-9) * thresh and hi - lo > (
                    0.25 if a is pq else 1000):
                out.append({"query": q, "prev": x, "cur": y,
                            "ratio": round(y / x, 3) if x else None})
        return sorted(out, key=lambda m: -(m["ratio"] or 0))

    wall = movers(pq, cq)
    rec = movers(pr, cr)
    ratios = sorted(cq[q] / pq[q] for q in common if pq[q] > 0)
    # an empty common-query set or a zero prev total must read as "no
    # comparison", not crash the adjudication (ADVICE_r19)
    summary = {
        "prev_total": prev["value"], "cur_total": cur["value"],
        "total_ratio": (round(cur["value"] / prev["value"], 4)
                        if prev["value"] else None),
        "n_common": len(common),
        "median_query_ratio": (round(ratios[len(ratios) // 2], 4)
                               if ratios else None),
        "added": sorted(set(cq) - set(pq)),
        "removed": sorted(set(pq) - set(cq)),
        "record_movers": rec,
        "wall_movers_with_zero_record_movement": [
            m for m in wall
            if m["query"] not in {r["query"] for r in rec}],
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
