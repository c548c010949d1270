#!/usr/bin/env python3
"""Dev-only local oracle harness (mirrors the driver's t2 check).

NOT part of the shipped library — uses driver-side-only deps (duckdb,
pandas, pyarrow). Usage:

    python3 tools/check.py <sfDir> <outDir>

where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.
Compares each <outDir>/<name> parquet against the oracle SQL in
<outDir>/oracle_sql.json run by DuckDB over the same sfDir tables.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # row-order-insensitive compare: sort by all columns
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet in {res_dir}")
            fails += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files])
            exp = con.execute(sql).df()
            # norm() sorts by all columns — an unhashable (array) column
            # must fail THIS query, not crash the whole harness
            g, x = norm(got), norm(exp)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            fails += 1
            continue
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(x.columns)}")
            fails += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(x)}")
            fails += 1
            continue
        mism = []
        for c in g.columns:
            a, b = g[c], x[c]
            try:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                idx = (~eq).nonzero()[0][:3]
                mism.append((c, [(int(i), a.iloc[i], b.iloc[i]) for i in idx]))
        if mism:
            print(f"FAIL {name}: value mismatches:")
            for c, rows in mism:
                for i, av, bv in rows:
                    print(f"    col={c} row={i} spark={av!r} oracle={bv!r}")
            fails += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
    # non-oracled queries: rows-only
    for res_dir in sorted(glob.glob(os.path.join(out_dir, "q_*"))):
        name = os.path.basename(res_dir)
        if name in oracle:
            continue
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'ROWS' if n > 0 else 'FAIL'} {name}: {n} rows (no oracle)")
        if n == 0:
            fails += 1
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
