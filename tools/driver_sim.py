#!/usr/bin/env python3
"""Simulate the DRIVER's comparator as described in VERDICT.md r2 ("What's
wrong"): the driver reads the Spark result parquet with pandas (Decimal stays
a Decimal object; arrays stay numpy arrays) and the DuckDB oracle result via
.df() (DECIMAL becomes float64), sorts columns by name, sorts rows, and
compares *stringified* values. This is the path where decimal-vs-float
trailing-zero asymmetry and unhashable-array crashes live — the r2 local
comparator (check_oracle.py, uniform duckdb->arrow on both sides) could not
see either. Run this against any Verify dump before trusting the round.

Usage: python3 tools/driver_sim.py <sfDir> <verifyOutDir> [nameRegex]
"""
import sys, os, json, re, hashlib
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def frame_hash(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.md5()
    for _, row in df.iterrows():
        h.update(("|".join("NULL" if v is None or (isinstance(v, float) and v != v) else str(v)
                           for v in row) + "\n").encode())
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    pat = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    npass = nfail = 0
    for name in sorted(oracle):
        if pat and not pat.search(name):
            continue
        try:
            spark_df = pd.read_parquet(os.path.join(out_dir, name))
            duck_df = con.execute(oracle[name]).df()
            hs, hd = frame_hash(spark_df), frame_hash(duck_df)
            ok = hs == hd and len(spark_df) == len(duck_df)
            print(f"{'PASS' if ok else 'FAIL'} {name} ({len(spark_df)} vs {len(duck_df)} rows)")
            npass += ok; nfail += not ok
        except Exception as e:
            nfail += 1
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    print(f"\n{npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
