#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
           [--exclude a,b,c] [--only a,b,c]

--only restricts the check to the named queries (for Verify runs that used
the query-filter argument and so wrote only a subset of outputs).

Loads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB with the sf parquet tables
registered as views, and compares row count, sorted column names, and a
row-wise hash of values (columns sorted by name — mirroring the driver).

--exclude skips the DuckDB oracle for the named queries (the cluster
queries' recursive-CTE closure effectively never finishes at sf0.1).
Excluded dedup_clusters* queries are instead checked by an independent
python union-find over the Spark-emitted dedup_minhash_pairs parquet:
every doc's comp must be the min id of its connected component and
keeper must equal (doc_id == comp).
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        # canonicalize -0.0 and format compactly; both engines produce
        # binary-identical doubles so repr is stable
        if v == 0.0:
            v = 0.0
        return repr(v)
    return repr(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    import hashlib
    h = hashlib.sha256()
    for row in rows:
        h.update("|".join(norm(row[i]) for i in order).encode())
        h.update(b"\n")
    return h.hexdigest()


def unionfind_check(con, out_dir, name):
    """Independent closure check for a dedup_clusters* output: union-find
    over Spark's own verified pair list, then comp == min(component) and
    keeper == (doc_id == comp) for every doc. Requires the
    dedup_minhash_pairs parquet next to the clusters output, and every pair
    endpoint to appear in the clusters rows — violations raise ValueError
    (reported as a clean FAIL by the caller)."""
    pairs = con.sql(
        f"SELECT doc_a, doc_b FROM '{out_dir}/dedup_minhash_pairs/*.parquet'").fetchall()
    rows = con.sql(
        f"SELECT doc_id, comp, keeper FROM '{out_dir}/{name}/*.parquet'").fetchall()
    parent = {d: d for d, _, _ in rows}
    for a, b in pairs:
        for e in (a, b):
            if e not in parent:
                raise ValueError(
                    f"pair endpoint {e} missing from {name} output")

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for d in parent:
        r = find(d)
        expected[r] = min(expected.get(r, r), d)
    bad = sum(1 for d, comp, keeper in rows
              if comp != expected[find(d)] or keeper != (d == comp))
    return len(rows), bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    exclude = set()
    only = None

    def flag_value(arg):
        if "=" in arg:
            return arg.split("=", 1)[1]
        i = sys.argv.index(arg) + 1
        if i >= len(sys.argv):
            sys.exit(f"error: {arg} needs a value (comma-separated query names)")
        return sys.argv[i]

    for arg in sys.argv[3:]:
        if arg.startswith("--exclude"):
            exclude = set(x for x in flag_value(arg).split(",") if x)
        elif arg.startswith("--only"):
            only = set(x for x in flag_value(arg).split(",") if x)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        if name in exclude:
            if name.startswith("dedup_clusters"):
                try:
                    n, bad = unionfind_check(con, out_dir, name)
                except Exception as e:
                    print(f"FAIL {name}: union-find check errored: {e}")
                    fail += 1
                    continue
                if bad:
                    print(f"FAIL {name}: union-find check, {bad}/{n} rows wrong")
                    fail += 1
                else:
                    print(f"OK   {name} ({n} rows, python union-find)")
                    ok += 1
            else:
                print(f"SKIP {name} (excluded)")
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = list(spark_rel.columns)
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            fail += 1
            continue
        try:
            duck_rel = con.sql(sql)
            duck_cols = list(duck_rel.columns)
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            fail += 1
            continue
        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rows spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            hs = table_hash(spark_rows, spark_cols)
            hd = table_hash(duck_rows, duck_cols)
            if hs != hd:
                problems.append("value hash mismatch")
                # show first differing row
                order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
                for i, (rs, rd) in enumerate(zip(spark_rows, duck_rows)):
                    a = [norm(rs[j]) for j in order_s]
                    b = [norm(rd[j]) for j in order_d]
                    if a != b:
                        problems.append(f"first diff row {i}: spark={a} duck={b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            fail += 1
        else:
            print(f"OK   {name} ({len(spark_rows)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
