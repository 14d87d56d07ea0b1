#!/usr/bin/env python3
"""Dev-only pre-flight check (NOT part of the library): replicate the
driver's DuckDB-oracle comparison against a graft.Verify output dir.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["lineitem", "orders", "customer", "supplier", "part", "nation",
          "region", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        w = want.reindex(sorted(want.columns), axis=1)
        g = got.reindex(sorted(got.columns), axis=1)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_bad += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
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
            n_bad += 1
        else:
            print(f"ok   {name} ({len(w)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failing")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
