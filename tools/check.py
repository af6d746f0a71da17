#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB-oracle compare.

NOT part of the engine (driver-side python only). Usage:
    python3 tools/check.py <sfDir> <outDir>
where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query: load Spark result parquet, run oracle SQL in DuckDB over
the same tables, sort columns by name, sort rows, compare exactly; report
row/schema/value-hash mismatch plus max float deltas to diagnose.
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        # normalize date-ish columns (parquet date32 loads as object of
        # datetime.date; duckdb .df() gives datetime64) to one dtype
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and all(
                type(v).__name__ == "date" for v in df[c].dropna().head(5)):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(x)}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], x[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                av = a.astype(float).to_numpy()
                bv = b.astype(float).to_numpy()
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
                if not eq.all():
                    d = np.nanmax(np.abs(av - bv))
                    bad.append(f"{c}: {int((~eq).sum())} diffs, maxabs={d:.3e}")
            else:
                if not a.astype(str).equals(b.astype(str)):
                    n_bad = int((a.astype(str) != b.astype(str)).sum())
                    i = (a.astype(str) != b.astype(str)).idxmax()
                    bad.append(f"{c}: {n_bad} diffs, first at row {i}: "
                               f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r}")
            # dtype check (schema-ish)
            if str(a.dtype) != str(b.dtype):
                bad.append(f"{c}: dtype spark={a.dtype} oracle={b.dtype}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
