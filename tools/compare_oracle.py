#!/usr/bin/env python3
"""Dev-only pre-flight check (NOT part of the library): replicate the
driver's DuckDB-oracle comparison against a graft.Verify output dir.

Usage: python3 tools/compare_oracle.py [--json OUT.json] <sfDir> <verifyOutDir> [query ...]

--json writes a driver-format artifact (rows_match/schema_match/
hash_match/spark_rows/oracle_rows/err per query) alongside the text
report — used for the committed CORRECTNESS_sf1 evidence (VERDICT r17
#4: hash-check the decade corpus, don't just time it).
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["lineitem", "orders", "customer", "supplier", "part", "nation",
          "region", "events", "documents", "embeddings"]


def main():
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    import os
    # resource bounds for decade-corpus oracle replays (DUCKDB_MEM e.g.
    # "48GB", DUCKDB_THREADS e.g. "8"): DuckDB's default 80%-of-RAM limit
    # over-commits when Spark JVMs share the box, and heavy CTE chains
    # then die on bad_alloc instead of spilling. A bounded limit + a
    # temp_directory with space makes them spill and finish.
    if os.environ.get("DUCKDB_MEM"):
        con.sql(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
    if os.environ.get("DUCKDB_THREADS"):
        con.sql(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    tmp = os.environ.get("DUCKDB_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.sql(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single-file parquet; Spark-written corpora
        # (the synthetic sf1) are directories of part files — glob those
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    report = {}

    def rec(name, rows_match, schema_match, hash_match, spark_rows,
            oracle_rows, err):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            rec(name, False, False, False, None, None, f"oracle error: {e}")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            rec(name, False, False, False, None, len(want),
                f"spark output missing: {e}")
            n_bad += 1
            continue
        w = want.reindex(sorted(want.columns), axis=1)
        g = got.reindex(sorted(got.columns), axis=1)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            rec(name, len(w) == len(g), False, False, len(g), len(w), None)
            n_bad += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            rec(name, False, True, False, len(g), len(w), None)
            n_bad += 1
            continue
        # dtype-kind mismatch (int vs float) stringifies differently under
        # the driver's value hash ("7" vs "7.0") even when values compare
        # equal — flag it. DuckDB sum(int)->HUGEINT->float64 is the usual way
        # this happens; cast oracle integer sums to BIGINT.
        kind_bad = [(c, str(w[c].dtype), str(g[c].dtype)) for c in w.columns
                    if w[c].dtype.kind != g[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype kind mismatch (oracle, spark): {kind_bad}")
            rec(name, True, False, False, len(g), len(w),
                f"dtype kind mismatch: {kind_bad}")
            n_bad += 1
            continue
        # row-order-independent exact compare
        ws = w.sort_values(list(w.columns)).reset_index(drop=True)
        gs = g.sort_values(list(g.columns)).reset_index(drop=True)
        bad_cols = []
        for c in w.columns:
            a, b = ws[c], gs[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                bad_cols.append((c, a[i], b[i], int((~eq).sum())))
        if bad_cols:
            print(f"FAIL {name}: value diffs {bad_cols[:3]}")
            rec(name, True, True, False, len(g), len(w),
                f"value diffs: {bad_cols[:3]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(w)} rows)")
            rec(name, True, True, True, len(g), len(w), None)
            n_ok += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out}")
    print(f"\n{n_ok} ok, {n_bad} failing")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
