#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given scale factor, compares row count, column names and an
order-insensitive value hash (columns sorted by name, values
canonicalized), and prints a per-query PASS/FAIL table.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from data_ingestion_framework_spark import registry  # noqa: E402
from data_ingestion_framework_spark.session import get_spark  # noqa: E402

registry.load_all_queries()


def _canon_value(v) -> str:
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def frame_digest(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in registry.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = 0
    for name, fn in sorted(registry.QUERIES.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name:32s} spark error: {e}")
            failures += 1
            continue
        oracle = registry.ORACLES.get(name)
        if oracle is None:
            print(f"rows  {name:32s} {len(srows):>8d} rows (no oracle) {time.time()-t0:5.1f}s")
            continue
        try:
            res = con.execute(oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            # The driver fetches through a pandas-style path where DuckDB
            # HUGEINT (uncast integer SUM) float-izes and hash-mismatches
            # Spark's bigint even though fetchall() returns exact ints.
            # Mirror that trap locally: any HUGEINT output column is a FAIL.
            dtypes = con.execute(f"DESCRIBE ({oracle})").fetchall()
            huge = [r[0] for r in dtypes if "HUGEINT" in str(r[1]).upper()]
        except Exception as e:
            print(f"FAIL  {name:32s} duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if huge:
            problems.append(f"HUGEINT oracle cols (driver float-izes): {huge}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sh, dh = frame_digest(scols, srows), frame_digest(dcols, drows)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
                # show a few differing lines for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                s_set = {("\x1f".join(_canon_value(r[i]) for i in order_s)) for r in srows}
                d_set = {("\x1f".join(_canon_value(r[i]) for i in order_d)) for r in drows}
                for line in list(s_set - d_set)[:3]:
                    print(f"        spark-only: {line[:160]!r}")
                for line in list(d_set - s_set)[:3]:
                    print(f"        duck-only:  {line[:160]!r}")
        if problems:
            print(f"FAIL  {name:32s} {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS  {name:32s} {len(srows):>8d} rows {time.time()-t0:5.1f}s")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
