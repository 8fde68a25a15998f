#!/usr/bin/env python3
"""Local dev harness emulating the driver's correctness gate.

Usage: python3 tools/compare.py [sfdir] [outdir]
  1) expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have been run
  2) runs each oracle_sql.json query in DuckDB over the sfdir parquet tables
  3) compares with the Spark result parquet: schema (column names), row count,
     and exact values after sorting columns by name and rows by all columns.

Dev-only tooling (driver-side python stack); the shipped library is Scala.
"""
import sys, os, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    """Canonical comparable string per value: unifies None/NaN, int vs
    integral float (nullable bigint becomes float64 in pandas), decimal vs
    float. Non-integral floats compare by exact repr (bitwise determinism is
    the contract)."""
    import decimal, datetime
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "␀"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return str(int(v)) if v.is_integer() else repr(v)
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        try:
            want = con.execute(sql).fetchdf()
            got = duckdb.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
            wcols, gcols = sorted(want.columns), sorted(got.columns)
            if wcols != gcols:
                print(f"FAIL {name}: columns differ\n  oracle={wcols}\n  spark ={gcols}")
                n_fail += 1; continue
            if len(want) != len(got):
                print(f"FAIL {name}: rows oracle={len(want)} spark={len(got)}")
                n_fail += 1; continue
            wrows = sorted(tuple(norm(v) for v in row) for row in want[wcols].itertuples(index=False, name=None))
            grows = sorted(tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False, name=None))
            if wrows == grows:
                print(f"PASS {name} ({len(want)} rows)")
                n_pass += 1
            else:
                bad = [(a, b) for a, b in zip(wrows, grows) if a != b][:3]
                print(f"FAIL {name}: values differ; first diffs:")
                for a, b in bad:
                    print(f"  oracle={a}\n  spark ={b}")
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
