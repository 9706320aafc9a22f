#!/usr/bin/env python3
"""Dev-side mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/diff_oracle.py <sfdir> <verify_out_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB with views named
after the fixture tables, and compares values exactly (bit-exact for
floats — same bar as the driver's hash compare).
"""
import json, math, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # SKIP: whitespace-separated query names whose ORACLE side is
    # quadratic (brute-force all-pairs in DuckDB) — used for sf0.1 runs
    # where the oracle, not our engine, is the bottleneck
    skip = set(os.environ.get("SKIP", "").split())
    failures = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name}")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            failures += 1
            continue
        g, w = got[gcols], want[wcols]
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        # Type-strict: the driver's hash renders values, so int64 vs
        # float64 (e.g. DuckDB HUGEINT SUM vs Spark BIGINT) is a FAIL
        # even when the numbers are equal. Compare dtype classes first.
        tbad = [(c, str(g[c].dtype), str(w[c].dtype)) for c in gcols
                if dtype_class(g[c].dtype) != dtype_class(w[c].dtype)]
        if tbad:
            print(f"FAIL {name}: dtype class mismatch {tbad}")
            failures += 1
            continue
        bad = []
        for c in gcols:
            for i, (a, b) in enumerate(zip(g[c].tolist(), w[c].tolist())):
                if not eq(a, b):
                    bad.append((c, i, a, b))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    return failures


def dtype_class(dt) -> str:
    k = getattr(dt, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in "mM":
        return "datetime"
    return "other"


def eq(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        na = a is None or (isinstance(a, float) and math.isnan(a))
        nb = b is None or (isinstance(b, float) and math.isnan(b))
        return na == nb
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)  # bit-exact, no tolerance
    return a == b


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
