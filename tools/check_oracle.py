#!/usr/bin/env python3
"""Local development harness mirroring the driver's correctness gate:
run each oracle SQL in DuckDB against the fixture parquet, load the
Spark-written result parquet, sort columns by name, and compare.

Strictness contract (round-2 hardening, VERDICT.md r1 item 3): the driver's
hash compare is *physical-type* strict — 900 (int64) != 900.0 (double) and
DECIMAL(28,2) != DECIMAL(38,2) even when every value is numerically equal.
This gate therefore:
  1. compares the arrow schema types column-by-column (both sides are read
     through DuckDB -> arrow, so representations are uniform);
  2. compares values as (type-tag, canonical-form) pairs, never bare Python
     values (Python == coerces across int/float/bool/Decimal);
  3. allows the multiset (order-insensitive) fallback ONLY for oracle SQL
     without a top-level ORDER BY — an ordered query whose ordering drifts
     is a FAIL, not a WARN.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math, re
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    """Type-tagged canonical form: equal only when type class AND value agree."""
    import decimal, datetime
    if v is None:
        return None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else repr(v))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))  # str keeps scale: 900.00 stays distinct from 900.0
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("ts", str(v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", v.hex())
    if isinstance(v, list):
        return ("list", tuple(canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, canon(x)) for k, x in v.items())))
    return ("str", v) if isinstance(v, str) else (type(v).__name__, str(v))

def has_toplevel_order_by(sql):
    """True if ORDER BY appears at paren depth 0 (outside subqueries/OVER()).
    String literals are blanked first so parens/keywords inside them (e.g.
    replace(c, '(', '')) cannot corrupt the depth tracking."""
    depth = 0
    s = re.sub(r"'(?:[^']|'')*'", "''", sql.lower())
    for m in re.finditer(r"[()]|order\s+by", s):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return True
    return False

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
        # OutputPolicy hazards (round-3): the REAL driver reads the Spark
        # parquet through pandas and the oracle through .df(), stringifying
        # values — decimal columns hash-fail on trailing scale zeros and
        # array/struct columns crash its sort. This uniform arrow path can't
        # reproduce that, so reject the types outright (mirrors Verify's
        # Scala-side lint; tools/driver_sim.py models the driver directly).
        hazards = [f"{f.name}: {f.type}" for f in got.schema
                   if str(f.type).startswith(("decimal", "list", "struct", "map",
                                              "large_list", "fixed_size_list",
                                              # float32 shortest-repr / raw-bytes
                                              # stringification drift (ADVICE r3);
                                              # arrow float64 prints as "double"
                                              # so "float" matches only 16/32-bit
                                              "float", "halffloat", "binary",
                                              "large_binary"))]
        if hazards:
            print(f"FAIL {name}: driver-unstable output types: {hazards}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        # physical (arrow) type check per column — the driver hash is type-strict
        wtypes = {f.name: str(f.type) for f in want.schema}
        gtypes = {f.name: str(f.type) for f in got.schema}
        type_diffs = [(c, wtypes[c], gtypes[c]) for c in wcols if wtypes[c] != gtypes[c]]
        if type_diffs:
            print(f"FAIL {name}: arrow types differ:")
            for c, wt, gt in type_diffs:
                print(f"  {c}: oracle={wt} spark={gt}")
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
        elif not has_toplevel_order_by(sql) and sorted(map(repr, wrows)) == sorted(map(repr, grows)):
            print(f"WARN {name}: unordered oracle; rows match as a multiset")
            n_pass += 1
        else:
            diffs = [(i, w, g) for i, (w, g) in enumerate(zip(wrows, grows)) if w != g][:3]
            # diagnosis: ordering-only drift (values equal as a multiset)
            # reads very differently from a value mismatch — say which
            kind = ("ordering differs but values match as a multiset"
                    if sorted(map(repr, wrows)) == sorted(map(repr, grows))
                    else "value mismatch")
            print(f"FAIL {name}: {kind}; first diffs:")
            for i, w, g in diffs:
                print(f"  row {i}:\n    oracle={w}\n    spark ={g}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} total with oracle")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
