#!/usr/bin/env python3
"""Dev-only: compare ONE Verify dump against its DuckDB oracle (the
check.py comparison factored to a single query so a driver loop can run
each with its own timeout/progress — sf1-scale oracles can be hours).

Usage: python3 scripts/check_one.py <sfDir> <outDir> <queryName>
Exit 0 pass, 1 mismatch, 2 error.
"""
import json
import sys

import duckdb
import pandas as pd

SF_DIR, OUT_DIR, NAME = sys.argv[1], sys.argv[2], sys.argv[3]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
# spill to the system temp dir, not cwd/.tmp — an sf1-scale oracle can
# write tens of GB of temp and must not land inside the repo
con.execute("SET temp_directory = '/tmp/duckdb_spill'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
if NAME not in oracle:
    print(f"SKIP {NAME} (no oracle)")
    sys.exit(0)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


try:
    want = con.execute(oracle[NAME]).df()
    got = con.execute(
        f"SELECT * FROM read_parquet('{OUT_DIR}/{NAME}/*.parquet')").df()
    w, g = canon(want), canon(got)
    if list(w.columns) != list(g.columns):
        print(f"FAIL {NAME}: columns {list(g.columns)} != {list(w.columns)}")
        sys.exit(1)
    if len(w) != len(g):
        print(f"FAIL {NAME}: rows {len(g)} != {len(w)}")
        sys.exit(1)
    for c in w.columns:
        wv, gv = w[c], g[c]
        if str(wv.dtype) != str(gv.dtype):
            print(f"FAIL {NAME}: dtype[{c}] got {gv.dtype} want {wv.dtype}")
            sys.exit(1)
        try:
            eq = (wv.fillna("~N") == gv.fillna("~N")) if wv.dtype == object else \
                 ((wv == gv) | (wv.isna() & gv.isna()))
        except Exception:
            eq = wv.astype(str) == gv.astype(str)
        n_bad = int((~eq).sum())
        if n_bad:
            i = (~eq).idxmax()
            print(f"FAIL {NAME}: values[{c}] {n_bad} mismatches, "
                  f"first idx {i}: got {gv[i]!r} want {wv[i]!r}")
            sys.exit(1)
    print(f"PASS {NAME} ({len(g)} rows)")
    sys.exit(0)
except SystemExit:
    raise
except Exception as e:
    print(f"ERROR {NAME}: {type(e).__name__}: {str(e)[:300]}")
    sys.exit(2)
