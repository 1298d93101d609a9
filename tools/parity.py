#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads the Verify dump (<outDir>/<name>/ parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the raw testdata tables, and compares: columns
sorted by name, rows compared exactly (NaN==NaN), dtypes value-compatible.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
        except (TypeError, ValueError):
            return False
    if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
        return int(a) == int(b)
    if isinstance(a, (pd.Timestamp, np.datetime64)) or isinstance(b, (pd.Timestamp, np.datetime64)):
        return pd.Timestamp(a) == pd.Timestamp(b)
    return str(a) == str(b)

def compare(name, spark_df, duck_df):
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        return f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"
    if len(s) != len(d):
        return f"FAIL {name}: rows {len(s)} vs {len(d)}"
    for col in s.columns:
        sa, da = s[col].values, d[col].values
        for i in range(len(sa)):
            if not cell_eq(sa[i], da[i]):
                return (f"FAIL {name}: col {col} row {i}: "
                        f"spark={sa[i]!r} duck={da[i]!r}")
    return f"OK   {name} ({len(s)} rows)"

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:  # optional subset: comma-separated names
        keep = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    failures = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); failures += 1; continue
        r = compare(name, spark_df, duck_df)
        print(r)
        if r.startswith("FAIL"):
            failures += 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracle)} oracled queries)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
