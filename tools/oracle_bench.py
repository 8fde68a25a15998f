#!/usr/bin/env python3
"""Per-query DuckDB oracle timings (VERDICT r13 task #7): time the DuckDB
replay of selected oracle queries over a given SF dir, so "graft vs a
single-node embedded engine" is a tracked PER-QUERY series (sf0.1 and the
synthetic sf10) instead of a two-point note. Results go to stdout as one
JSON line; merge into BASELINE_MEASURED.json's `per_query` section.

Usage:
  python3 tools/oracle_bench.py <sfdir> <oracle_sql.json> <q1,q2,..> [timeout_s]

Dev-only tooling (driver-side python stack); the shipped library is Scala.
"""
import sys, os, json, time, threading
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def connect(sfdir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # spark-written table = a directory of parts
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def time_query(sfdir: str, sql: str, timeout_s: float):
    """Wall-clock one full materialization; a watchdog interrupts DuckDB at
    the timeout (the honest 'single-node engine did not finish' datum)."""
    con = connect(sfdir)
    hit = {"timeout": False}

    def kill():
        hit["timeout"] = True
        con.interrupt()

    t = threading.Timer(timeout_s, kill)
    t.start()
    t0 = time.monotonic()
    try:
        n = len(con.execute(sql).fetchall())
        return round(time.monotonic() - t0, 2), n
    except Exception as e:
        if hit["timeout"]:
            return f"timeout>{timeout_s:g}s", None
        return f"error: {e}"[:200], None
    finally:
        t.cancel()
        con.close()


def main():
    sfdir, oracle_path, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    timeout_s = float(sys.argv[4]) if len(sys.argv) > 4 else 900.0
    oracle = json.load(open(oracle_path))
    out = {}
    for name in names:
        sec, rows = time_query(sfdir, oracle[name], timeout_s)
        out[name] = {"duckdb_sec": sec, "rows": rows}
        print(f"# {name}: {sec} ({rows} rows)", file=sys.stderr)
    print(json.dumps({"sf": sfdir, "timeout_s": timeout_s, "oracle": out}))


if __name__ == "__main__":
    main()
