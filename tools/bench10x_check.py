#!/usr/bin/env python3
"""Full-suite 10x superlinearity check (dev tool only).

Usage: python3 tools/bench10x_check.py BENCH_quiet_rNN.json BENCH_10x_rNN.json
       [--ratio 15] [--floor 0.25]

Compares every query's 10x qmin against its sf0.1 qmin and flags anything
slower than --ratio x. Sub-second sf0.1 entries are floored at --floor
seconds before the division: a 0.05 s query growing to 1 s is 20 "x" of
pure job-floor noise, not a scale problem — the flag exists to catch the
query that was 2 s and became 40 s.

Exit code 1 if any query is flagged; prints a JSON summary either way.
"""
import json
import sys


def main():
    base_path, ten_path = sys.argv[1], sys.argv[2]
    args = sys.argv[3:]
    ratio = float(args[args.index("--ratio") + 1]) if "--ratio" in args else 15.0
    floor = float(args[args.index("--floor") + 1]) if "--floor" in args else 0.25
    base = json.load(open(base_path))
    ten = json.load(open(ten_path))
    b, t = base["qmin"], ten["qmin"]
    shared = sorted(set(b) & set(t))
    missing = sorted(set(b) ^ set(t))
    flagged = {}
    ratios = {}
    for q in shared:
        if b[q] < 0 or t[q] < 0:
            flagged[q] = {"note": "failed run", "sf01": b[q], "x10": t[q]}
            continue
        r = t[q] / max(b[q], floor)
        ratios[q] = round(r, 2)
        if r > ratio:
            flagged[q] = {"sf01": b[q], "x10": t[q], "ratio": round(r, 1)}
    top = dict(sorted(ratios.items(), key=lambda kv: -kv[1])[:15])
    out = {
        "n_shared": len(shared),
        "missing": missing,
        "ratio_limit": ratio,
        "sub_second_floor": floor,
        "total_sf01": round(sum(v for v in b.values() if v >= 0), 1),
        "total_10x": round(sum(v for v in t.values() if v >= 0), 1),
        "n_flagged": len(flagged),
        "flagged": flagged,
        "top_ratios": top,
    }
    print(json.dumps(out, indent=1, sort_keys=True))
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
