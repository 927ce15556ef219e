"""Driver-contract simulator: run every queries() entry on Spark and its
oracle_sql() on DuckDB at sf0.01, compare row-count + schema +
order-insensitive value-hash (columns sorted by name, like the driver).

Usage: python tools/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # shortest repr round-trips doubles exactly
        return repr(v)
    if isinstance(v, int):
        # unify 3 and 3.0 across engines when a col is int here, dbl there
        return repr(float(v)) if False else str(v)
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:
            print(f"{name}: SPARK ERROR {type(exc).__name__}: {exc}")
            bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: {len(rows)} rows (no oracle) [{dt:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:
            print(f"{name}: ORACLE ERROR {exc}")
            bad += 1
            continue
        schema_ok = sorted(map(str.lower, cols)) == sorted(
            map(str.lower, ocols)
        )
        n_ok = len(rows) == len(orows)
        h_ok = table_hash(cols, rows) == table_hash(ocols, orows)
        status = "OK" if (schema_ok and n_ok and h_ok) else "FAIL"
        if status == "FAIL":
            bad += 1
        print(
            f"{name}: {status} rows={len(rows)}/{len(orows)} "
            f"schema={'ok' if schema_ok else f'{cols} vs {ocols}'} "
            f"hash={'ok' if h_ok else 'MISMATCH'} [{dt:.1f}s]"
        )
        if not h_ok and n_ok and schema_ok:
            # show a sample diff to debug
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            a = sorted(
                tuple(canon(r[i]) for i in order) for r in rows
            )
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            b = sorted(
                tuple(canon(r[i]) for i in oorder) for r in orows
            )
            for x, y in zip(a, b):
                if x != y:
                    print(f"   spark={x}\n   duck ={y}")
                    break
    print("RESULT:", "ALL OK" if bad == 0 else f"{bad} FAILURES")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
