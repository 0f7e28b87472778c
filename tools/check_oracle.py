#!/usr/bin/env python3
"""Local development harness mirroring the driver's correctness gate:
run each oracle SQL in DuckDB against the fixture parquet, load the
Spark-written result parquet, sort columns by name, and compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # decimals, timestamps, bytes → stable string forms
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return str(v.normalize()) if v == v.to_integral_value() else str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetch_arrow_table()
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        wrows = [tuple(canon(r[c]) for c in wcols) for r in want.to_pylist()]
        grows = [tuple(canon(r[c]) for c in gcols) for r in got.to_pylist()]
        if len(wrows) != len(grows):
            print(f"FAIL {name}: row count oracle={len(wrows)} spark={len(grows)}")
            n_fail += 1
            continue
        if wrows == grows:
            print(f"PASS {name} ({len(wrows)} rows, ordered)")
            n_pass += 1
        elif sorted(map(repr, wrows)) == sorted(map(repr, grows)):
            print(f"WARN {name}: rows match only as a multiset (ordering differs)")
            n_pass += 1
        else:
            diffs = [(i, w, g) for i, (w, g) in enumerate(zip(wrows, grows)) if w != g][:3]
            print(f"FAIL {name}: value mismatch; first diffs:")
            for i, w, g in diffs:
                print(f"  row {i}:\n    oracle={w}\n    spark ={g}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} total with oracle")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
