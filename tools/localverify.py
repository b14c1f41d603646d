#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare the
graft.Verify parquet dumps against the DuckDB oracle SQL at a given
scale factor. Dev-only tool (the engine itself is pure Scala/Spark).

Usage: python3 tools/localverify.py [sfDir] [outDir]
Run graft.Verify first:  sbt "runMain graft.Verify <sfDir> <outDir>"
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            oracle = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        spark = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)])
        ok, msg = compare(spark, oracle)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(spark)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


def compare(spark: pd.DataFrame, oracle: pd.DataFrame):
    scols, ocols = sorted(spark.columns), sorted(oracle.columns)
    if scols != ocols:
        return False, f"schema mismatch: spark={scols} oracle={ocols}"
    if len(spark) != len(oracle):
        return False, f"row count: spark={len(spark)} oracle={len(oracle)}"
    spark = spark[scols].reset_index(drop=True)
    oracle = oracle[scols].reset_index(drop=True)
    for c in scols:
        s, o = spark[c], oracle[c]
        # The driver hashes RENDERED values, so int64 vs float64 (the DuckDB
        # HUGEINT gotcha: SUM() over ints) diverges even when values match.
        # Mirror that strictness: numeric kind must agree exactly.
        if s.dtype.kind in "iuf" and o.dtype.kind in "iuf" \
                and (s.dtype.kind == "f") != (o.dtype.kind == "f"):
            return False, (f"col {c}: dtype kind mismatch spark={s.dtype} "
                           f"oracle={o.dtype} (driver hash would fail; "
                           f"CAST the oracle output)")
        if s.dtype.kind in "fc" or o.dtype.kind in "fc":
            s = s.astype(float)
            o = o.astype(float)
            neq = ~((s.isna() & o.isna()) | (s == o))
        else:
            try:
                o = o.astype(s.dtype)
            except (TypeError, ValueError):
                pass
            neq = ~((s.isna() & o.isna()) | (s.astype(object) == o.astype(object)))
        if neq.any():
            i = int(np.argmax(neq.values))
            return False, (f"col {c}: {int(neq.sum())}/{len(s)} mismatches; "
                           f"first at row {i}: spark={s.iloc[i]!r} oracle={o.iloc[i]!r}")
    return True, ""


if __name__ == "__main__":
    main()
