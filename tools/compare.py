#!/usr/bin/env python3
"""Local dev harness emulating the driver's correctness gate — STRICT.

Usage: python3 tools/compare.py [sfdir] [outdir]
  1) expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have been run
  2) runs each oracle_sql.json query in DuckDB over the sfdir parquet tables
  3) compares with the Spark result parquet at the ARROW level:
     - physical schema per column (decimal precision/scale, timestamp unit,
       integer width) must be identical
     - values compare exactly: decimals as exact Decimal (scale included),
       floats by bit pattern, timestamps as raw epoch ints in their unit

Round-1 lesson (VERDICT r1): the old harness normalized Decimal->float and
int<->integral-float, which is strictly looser than the driver's hash gate —
it predicted 34/34 where the driver saw 25/35. No normalization here.

Dev-only tooling (driver-side python stack); the shipped library is Scala.
"""
import sys, os, json, math, struct, decimal
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_type(t: pa.DataType) -> str:
    """Canonical type string; strict on decimal precision/scale, timestamp
    unit AND timezone marking. Round-2 lesson: the driver schema-fails
    Spark's UTC-adjusted timestamp[us, tz=UTC] against DuckDB's naive
    timestamp[us] — queries must emit timestamp_ntz. No unification here."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


def forbidden_output_type(t: pa.DataType) -> str | None:
    """Output physical types the driver cannot gate cleanly, regardless of
    whether the oracle agrees (round-2 lessons):
    - list columns crash the driver's pandas sort (unhashable ndarray) —
      reshape to scalars (explode);
    - decimal columns hash differently driver-side even at matching
      precision — emit canonical double;
    - tz-marked timestamps never match DuckDB's naive ones — cast to
      timestamp_ntz."""
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list (driver compare crashes on ndarray cells)"
    if pa.types.is_decimal(t):
        return "decimal (driver hash diverges; emit canonical double)"
    if pa.types.is_timestamp(t) and t.tz is not None:
        return "tz-marked timestamp (oracle is naive; cast to timestamp_ntz)"
    return None


def col_values(arr: pa.ChunkedArray):
    t = arr.type
    if pa.types.is_timestamp(t):
        # raw epoch count in the column's own unit; unit equality is already
        # enforced by the schema check
        return arr.cast(pa.int64()).to_pylist()
    return arr.to_pylist()


def typed(v) -> str:
    """Exact value representation: no cross-type unification."""
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else "f:" + struct.pack("<d", v).hex()
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(typed(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    return f"s:{v}"


def table_rows(tbl: pa.Table, cols):
    data = [col_values(tbl.column(c)) for c in cols]
    return sorted(tuple(typed(col[i]) for col in data) for i in range(tbl.num_rows))


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        try:
            want = con.execute(sql).arrow()
            got = pq.read_table(spark_dir)
            wcols, gcols = sorted(want.column_names), sorted(got.column_names)
            if wcols != gcols:
                print(f"FAIL {name}: columns differ\n  oracle={wcols}\n  spark ={gcols}")
                n_fail += 1
                continue
            banned = [f"{c}: {why}" for c in gcols
                      if (why := forbidden_output_type(got.schema.field(c).type))]
            if banned:
                print(f"FAIL {name}: driver-ungateable output type: " + "; ".join(banned))
                n_fail += 1
                continue
            schema_diffs = []
            for c in wcols:
                wt = canon_type(want.schema.field(c).type)
                gt = canon_type(got.schema.field(c).type)
                if wt != gt:
                    schema_diffs.append(f"{c}: oracle={wt} spark={gt}")
            if schema_diffs:
                print(f"FAIL {name}: physical schema differs: " + "; ".join(schema_diffs))
                n_fail += 1
                continue
            if want.num_rows != got.num_rows:
                print(f"FAIL {name}: rows oracle={want.num_rows} spark={got.num_rows}")
                n_fail += 1
                continue
            wrows = table_rows(want, wcols)
            grows = table_rows(got, gcols)
            if wrows == grows:
                print(f"PASS {name} ({want.num_rows} rows)")
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
