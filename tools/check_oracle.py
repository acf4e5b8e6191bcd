#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (graft.Verify output), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: columns sorted by name, rows sorted by all columns, exact value
equality (with a report of max float deltas when inexact).

Dev-only tool — the shipped Scala engine never depends on this.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries where an empty result IS the expected answer (must agree with
# SparkEntrySpec's mayBeEmpty set — the smoke test and the gate share
# this contract).
MAY_BE_EMPTY = {"rel_join_anti"}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # bytes → hex for stable compare
            if df[c].map(lambda v: isinstance(v, bytes)).any():
                df[c] = df[c].map(lambda v: v.hex() if isinstance(v, bytes) else v)
            if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
                df[c] = df[c].map(lambda v: json.dumps(list(v)) if isinstance(v, (list, np.ndarray)) else v)
            # pyarrow materializes parquet date32 as object-of-datetime.date
            # while duckdb's DATE fetches as datetime64[us]; both are DATE in
            # their engines (driver-green in r05) — normalize, narrowly: only
            # datetime.date, never datetime.datetime (a date-vs-timestamp
            # schema divergence must still trip the strict dtype check).
            import datetime as _dt
            if df[c].map(lambda v: type(v) is _dt.date).any():
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype in (np.int32, np.int16, np.int8, np.uint32):
            df[c] = df[c].astype(np.int64)
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    names = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for name in names:
        try:
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                ignore_index=True)
        except Exception as e:
            results[name] = f"READ-FAIL: {e}"
            continue
        if name not in oracles:
            # A rows-only query returning ZERO rows is the exact failure
            # mode that previously hid two broken queries — the gate
            # itself rejects it (not just the SparkEntrySpec smoke test).
            if len(spark_df) == 0:
                results[name] = "rows-only EMPTY — vacuous query"
            else:
                results[name] = f"rows-only: {len(spark_df)} rows"
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL: {e}"
            continue
        # Empty == empty proves nothing: a query and twin broken the
        # same way (bad keyword, over-tight threshold) would "match" on
        # zero rows. Only queries where emptiness IS the expected answer
        # may pass empty.
        if len(spark_df) == 0 and len(duck_df) == 0 and name not in MAY_BE_EMPTY:
            results[name] = "EMPTY-BOTH — vacuous twin comparison"
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"COL-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}"
            continue
        bad = []
        for c in a.columns:
            av, bv = a[c], b[c]
            # Dtype-strict: the driver hashes value REPRESENTATIONS, so an
            # int64 column vs a float64 column (e.g. an uncast HUGEINT or
            # DECIMAL(38,x) in the twin) is a driver-side FAIL even when
            # every value compares equal. Mirror that here, AFTER canon's
            # int32→int64 / float32→float64 upcasts. This caught nothing
            # locally in round 5 and shipped 4 red rows — never again.
            if str(av.dtype) != str(bv.dtype):
                bad.append(f"{c}: DTYPE-MISMATCH spark={av.dtype} duck={bv.dtype}")
                continue
            if av.dtype == np.float64 or bv.dtype == np.float64:
                av_ = av.astype(np.float64).to_numpy()
                bv_ = bv.astype(np.float64).to_numpy()
                both_nan = np.isnan(av_) & np.isnan(bv_)
                eq = (av_ == bv_) | both_nan
                if not eq.all():
                    delta = np.nanmax(np.abs(av_ - bv_))
                    bad.append(f"{c}: {int((~eq).sum())} diffs, max_delta={delta:.3e}")
            else:
                try:
                    neq = ~((av == bv) | (av.isna() & bv.isna()))
                except Exception:
                    neq = av.astype(str) != bv.astype(str)
                if neq.any():
                    i = int(np.argmax(neq.to_numpy()))
                    bad.append(f"{c}: {int(neq.sum())} diffs e.g. row{i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
        results[name] = "OK" if not bad else "VALUE-MISMATCH " + "; ".join(bad[:3])

    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only:"))
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" else ("INFO" if v.startswith("rows-only:") else "FAIL")
        print(f"[{flag}] {k}: {v}")
    print(f"\n{n_ok}/{len(results)} ok")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
