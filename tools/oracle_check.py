#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py [sfDir] [outDir] [--skip-verify]

1. Runs `sbt "runMain graft.Verify <sfDir> <outDir>"` (unless --skip-verify,
   which reuses an existing dump).
2. For each query in <outDir>/oracle_sql.json: registers every testdata
   parquet as a DuckDB view, runs the oracle SQL, loads the Spark parquet
   result, sorts columns by name and rows by all columns, and compares
   values exactly (hash over canonical repr).

This is a dev tool only — the engine itself has no Python dependency.
"""
import hashlib
import json
import os
import subprocess
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def frame_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        h.update(col.encode())
        for v in df[col].tolist():
            h.update(repr(v).encode())
    return h.hexdigest()[:16]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-3000:], r.stderr[-3000:])
            sys.exit(1)

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_ok = 0
    spark_only = []
    dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracle) - dumped):
        print(f"FAIL {name}: no Spark dump (Verify errored — see its stderr)")
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.read_parquet(d)
        if name not in oracle:
            spark_only.append((name, len(spark_df)))
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        s, dk = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(dk.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(dk.columns)}")
            continue
        if len(s) != len(dk):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(dk)}")
            continue
        hs, hd = frame_hash(s), frame_hash(dk)
        if hs == hd:
            print(f"OK   {name}: {len(s)} rows, hash {hs}")
            n_ok += 1
        else:
            print(f"FAIL {name}: hash mismatch ({hs} vs {hd})")
            diff = (s != dk) & ~(s.isna() & dk.isna())
            bad = diff.any(axis=1)
            print(pd.concat([s[bad].head(5).add_suffix("_spark"),
                             dk[bad].head(5).add_suffix("_duck")], axis=1))
    for name, rows in spark_only:
        print(f"ROWS {name}: {rows} rows (no oracle — rows-only check)")
    print(f"\n{n_ok}/{len(oracle)} oracle queries match")
    sys.exit(0 if n_ok == len(oracle) else 2)


if __name__ == "__main__":
    main()
