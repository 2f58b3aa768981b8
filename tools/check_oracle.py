#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over views named
after the parquet tables in <sfDir>, canonicalizes both frames
(columns sorted by name, rows sorted), and reports match/mismatch.

Dev tool only — not part of the shipped library.
"""
import json, os, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = n_rowsonly = 0
    for name in names:
        spark_df = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            status = "ROWS-ONLY" if len(spark_df) > 0 else "ROWS-ONLY-EMPTY!"
            n_rowsonly += 1
            print(f"  {status:18s} {name} ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  ORACLE-SQL-ERR     {name}: {e}")
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"  COLS-MISMATCH      {name}: spark={list(a.columns)} duck={list(b.columns)}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"  ROWS-MISMATCH      {name}: spark={len(a)} duck={len(b)}")
            n_bad += 1
            continue
        # value compare, exact (mirror a hash compare)
        mismatch_cols = []
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype != bv.dtype:
                try:
                    bv = bv.astype(av.dtype)
                except Exception:
                    mismatch_cols.append((c, "dtype", str(av.dtype), str(bv.dtype)))
                    continue
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = (~eq).idxmax()
                mismatch_cols.append((c, "value", av[i], bv[i]))
        if mismatch_cols:
            print(f"  VALUE-MISMATCH     {name}: {mismatch_cols[:3]}")
            n_bad += 1
        else:
            n_ok += 1
            print(f"  OK                 {name} ({len(a)} rows)")
    print(f"\n{n_ok} ok, {n_bad} bad, {n_rowsonly} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
