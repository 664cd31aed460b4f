#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run each oracle SQL
in DuckDB over the same parquet tables, compare to the Spark result dump
(column-name-sorted, row-sorted, exact match with a float fallback report).

Usage: python3 tools/selfcheck.py <sfdir> <verify_outdir>
"""
import json, math, sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA mismatch: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS mismatch: spark={len(spark_df)} duck={len(duck_df)}"
    a, b = canon(spark_df), canon(duck_df)
    bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        # Dtype-drift gate: the driver's hash is TYPE-sensitive, so an
        # integer column on one side vs a float on the other (e.g. a
        # DuckDB HUGEINT window sum serialized as float64 against a Spark
        # BIGINT) hash-fails even when every value compares equal. The
        # old float-fallback path silently passed exactly that case
        # (q_token_budget, round 6). NULL-bearing int columns legitimately
        # arrive as float64 from BOTH engines, so only flag when the
        # integer side is genuinely integer-typed.
        ik, fk = ("iu", "f")
        if (av.dtype.kind in ik and bv.dtype.kind in fk) or \
           (av.dtype.kind in fk and bv.dtype.kind in ik):
            bad.append(
                f"{c}: DTYPE drift spark={av.dtype} duck={bv.dtype} "
                f"(driver hash is type-sensitive — cast the oracle)")
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float); bv = bv.astype(float)
            neq = ~((av == bv) | (av.isna() & bv.isna()) |
                    (abs(av - bv) <= 1e-9 * (1 + abs(bv))))
        else:
            try:
                neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
            except Exception:
                neq = av.astype(str) != bv.astype(str)
        n = int(neq.sum())
        if n:
            i = neq.idxmax()
            bad.append(f"{c}: {n} diffs (e.g. spark={a[c][i]!r} duck={b[c][i]!r})")
        else:
            # exact-bit check for floats (driver may hash exact)
            if av.dtype.kind == "f":
                ex = ~((a[c].astype(float) == b[c].astype(float)) |
                       (a[c].isna() & b[c].isna()))
                if int(ex.sum()):
                    bad.append(f"{c}: OK@1e-9 but {int(ex.sum())} not bit-exact")
    return "; ".join(bad) if bad else None


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    import glob, os
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(f"{outdir}/{d}"))
    fails = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"  {name:20s} rows-only: {len(spark_df)} rows "
                  f"{'OK' if len(spark_df) > 0 else 'EMPTY!'}")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
            err = compare(name, spark_df, duck_df)
        except Exception as e:
            err = f"oracle error: {e}"
        if err:
            fails += 1
            print(f"  {name:20s} FAIL  {err}")
        else:
            print(f"  {name:20s} OK    ({len(spark_df)} rows)")
    print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    return fails


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
