#!/usr/bin/env python3
"""DuckDB comparator timings for the oracle suite (dev tool only).

Usage:
  python3 tools/duck_bench.py <sfDir> <oracle_sql.json> --out DUCK_rNN.json
      [--reps 3] [--threads 1] [--timeout 300] [--exclude a,b,c]

Runs every oracle SQL against the sf parquet tables in DuckDB with the
given thread count and records the per-query median wall seconds — the
like-for-like denominator for BENCH_rNN's Spark medians (same queries,
same data, same box). Each query runs in its OWN subprocess so a
non-terminating plan is killed at --timeout and recorded as such instead
of hanging the sweep.

No queries are excluded by default since round 10: the dedup_clusters*
oracles now close their components with a bounded unrolled hash-min chain
(self-poisoning on non-convergence) instead of the recursive-CTE
transitive closure that could not complete at sf0.1, and the heavy shared
CTE stages carry MATERIALIZED hints so DuckDB 1.0 stops re-inlining the
pair pipeline per reference. --exclude a,b,c still skips named queries.
"""
import json
import statistics
import subprocess
import sys
import time

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

DEFAULT_EXCLUDE = set()
EXCLUDE_NOTE = "excluded via --exclude"


def run_one(sf_dir, threads, reps):
    import duckdb
    sql = sys.stdin.read()
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times = []
    for _ in range(reps):
        t0 = time.monotonic()
        con.sql(sql).fetchall()
        times.append(time.monotonic() - t0)
    print(json.dumps({"median": statistics.median(times), "times": times}))


def main():
    if sys.argv[1] == "--run-one":
        run_one(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out = reps = threads = timeout = None
    exclude = set(DEFAULT_EXCLUDE)
    args = sys.argv[3:]
    opts = {}
    i = 0
    while i < len(args):
        if "=" in args[i]:
            k, v = args[i].split("=", 1)
        else:
            k = args[i]
            i += 1
            if i >= len(args):
                sys.exit(f"error: {k} needs a value")
            v = args[i]
        opts[k.lstrip("-")] = v
        i += 1
    out = opts.get("out", "duck_bench.json")
    reps = int(opts.get("reps", "3"))
    threads = int(opts.get("threads", "1"))
    timeout = float(opts.get("timeout", "300"))
    if "exclude" in opts:
        exclude = set(x for x in opts["exclude"].split(",") if x)

    oracle = json.load(open(oracle_path))
    results = {}
    for name, sql in sorted(oracle.items()):
        if name in exclude:
            results[name] = {"status": "excluded", "note": EXCLUDE_NOTE}
            print(f"SKIP {name} (excluded)", flush=True)
            continue
        try:
            p = subprocess.run(
                [sys.executable, __file__, "--run-one", sf_dir,
                 str(threads), str(reps)],
                input=sql.encode(), capture_output=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            results[name] = {"status": "timeout", "limit_sec": timeout}
            print(f"TIMEOUT {name} (> {timeout}s)", flush=True)
            continue
        if p.returncode != 0:
            err = p.stderr.decode(errors="replace").strip().splitlines()
            results[name] = {"status": "error", "err": err[-1] if err else "?"}
            print(f"ERROR {name}: {results[name]['err']}", flush=True)
            continue
        r = json.loads(p.stdout)
        results[name] = {"status": "ok", "sec": round(r["median"], 4),
                         "times": [round(t, 4) for t in r["times"]]}
        print(f"OK   {name} {r['median']:.3f}s", flush=True)

    ok = {k: v["sec"] for k, v in results.items() if v["status"] == "ok"}
    doc = {
        "sf": sf_dir,
        "threads": threads,
        "reps": reps,
        "n_queries": len(oracle),
        "n_ok": len(ok),
        "n_excluded": sum(1 for v in results.values() if v["status"] == "excluded"),
        "total_ok_sec": round(sum(ok.values()), 3),
        "queries": results,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"\nwrote {out}: {len(ok)} ok, total {doc['total_ok_sec']}s "
          f"({threads} thread(s), {reps} reps)")


if __name__ == "__main__":
    main()
