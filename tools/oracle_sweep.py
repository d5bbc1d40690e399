#!/usr/bin/env python
"""Driver-style correctness sweep: run every __spark_entry__.queries() entry
AND its oracle_sql() twin (DuckDB over the same parquet), compare row count,
schema (column names sorted), and a value hash with columns sorted by name —
a local pre-flight for CORRECTNESS_r{N}.json.

Usage: python tools/oracle_sweep.py [sf_dir] [query ...]
       (default sf_dir /root/testdata/sf0.01; no query names = all)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)  # DuckDB literals like 100.0 surface as Decimal
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="seconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return hashlib.md5(bytes(v)).hexdigest()
    return str(v)


def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    import duckdb

    import __spark_entry__ as entry
    from imagor_spark.engine.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark(app_name="oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            sql = oracles.get(name)
            if sql is None:
                print(f"  {name}: rows={len(srows)} (NO ORACLE — rows-only) "
                      f"[{time.time() - t0:.1f}s]")
                continue
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            ok_rows = len(srows) == len(orows)
            ok_schema = sorted(scols) == sorted(ocols)
            sh = frame_fingerprint(scols, srows)
            oh = frame_fingerprint(ocols, orows)
            ok_hash = sh == oh
            status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
            print(f"  {name}: {status} rows {len(srows)}/{len(orows)} "
                  f"schema={'=' if ok_schema else sorted(scols)} "
                  f"hash={'=' if ok_hash else (sh[:8] + '!=' + oh[:8])} "
                  f"[{time.time() - t0:.1f}s]", flush=True)
            if status == "FAIL":
                bad.append(name)
        except Exception as exc:
            print(f"  {name}: ERROR {type(exc).__name__}: {exc}", flush=True)
            bad.append(name)
    print(f"\n{'ALL GREEN' if not bad else 'FAILURES: ' + ', '.join(bad)}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
