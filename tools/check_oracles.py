#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness check: run
graft.Verify output against DuckDB oracles and diff. Usage:
  python3 tools/check_oracles.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    def connect():
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        return con
    con = connect()
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); failures += 1; continue
        try:
            got = pq.read_table(files[0]).to_pandas()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"[ERR ] {name}: {str(e).splitlines()[0]}")
            failures += 1
            con = connect()  # a fatal error poisons the connection
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"[COLS] {name}: spark={list(g.columns)} duck={list(w.columns)}")
            failures += 1; continue
        if len(g) != len(w):
            print(f"[ROWS] {name}: spark={len(g)} duck={len(w)}"); failures += 1; continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"[ OK ] {name}: {len(g)} rows")
        except AssertionError as e:
            print(f"[DIFF] {name}: {str(e).splitlines()[0]}")
            mask = (g != w) & ~(g.isna() & w.isna())
            bad = mask.any(axis=1)
            print(pd.concat([g[bad].head(3).add_suffix("_spark"),
                             w[bad].head(3).add_suffix("_duck")], axis=1))
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracles match")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
