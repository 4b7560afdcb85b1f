#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same testdata, sorts
columns by name and rows by all columns, and compares values exactly.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints (duckdb may give int32 vs spark int64 etc.)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            pass
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(set(oracle) | {p.split("/")[-1] for p in glob.glob(f"{outdir}/*") if not p.endswith(".json")})
    nfail = 0
    for name in names:
        try:
            spark_df = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); nfail += 1; continue
        if name not in oracle:
            print(f"WEAK {name}: rows-only, {len(spark_df)} rows" + (" (EMPTY!)" if len(spark_df)==0 else ""))
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); nfail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); nfail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); nfail += 1; continue
        bad = []
        # the driver hashes RAW values: a DuckDB float64 column (e.g.
        # HUGEINT sums through the pandas bridge) against a Spark
        # integer column hashes 25.0 vs 25 and fails even though the
        # canonicalized compare below would pass — flag the dtype split
        # itself (the round-4 q103/q109 failure mode).
        for c in spark_df.columns:
            if c in duck_df.columns:
                sd, dd = spark_df[c].dtype, duck_df[c].dtype
                if pd.api.types.is_integer_dtype(sd) and pd.api.types.is_float_dtype(dd):
                    bad.append(f"{c}: DTYPE spark {sd} vs duck {dd} "
                               "(driver hash would fail; CAST the oracle aggregate)")
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                eq = ((av.isna() & bv.isna()) | (av == bv))
            else:
                eq = (av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str))
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append(f"{c}: row{i} {av[i]!r} vs {bv[i]!r} ({int((~eq).sum())} diffs)")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3])); nfail += 1
        else:
            print(f"OK   {name}: {len(a)} rows, {len(a.columns)} cols")
    print(("ALL GREEN" if nfail == 0 else f"{nfail} FAILURES"))
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
