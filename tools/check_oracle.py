"""Self-check harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vrod_spark.session import get_spark
from vrod_spark.sources.tables import TABLE_NAMES


#: DuckDB result types whose pandas/Arrow representation matches the
#: corresponding Spark dtype on the driver's fetch path. Anything else
#: (HUGEINT, DECIMAL, FLOAT, unsigned ints) round-trips lossily or as a
#: different dtype class and hash-mismatches even when values agree —
#: the q28b/q49 r8-r10 bug class. Single source of truth: the
#: tests/test_oracle_types.py guard imports this set.
DRIVER_SAFE_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
    "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN",
}


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(rows, colnames) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    from vrod_spark.queries import ORACLES, QUERIES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or sorted(QUERIES)
    spark = get_spark("oracle-check")
    con = duck_connect(sf_dir)
    failures = 0
    for name in names:
        fn = QUERIES[name]
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in ORACLES:
            print(f"{name}: rows-only check — {len(srows)} rows")
            continue
        drel = con.execute(ORACLES[name])
        dcols = [d[0] for d in drel.description]
        drows = drel.fetchall()
        problems = []
        # Driver-visible type hygiene: the real gate fetches via
        # pandas/Arrow, where DuckDB HUGEINT/DECIMAL render as float64
        # and hash-mismatch Spark's int64 even when fetchall() values
        # (lossless Python ints) agree.  Guard on the relation types so
        # this tool sees what the driver sees (VERDICT r10 #1/#2).
        dtypes = [str(t) for t in con.sql(ORACLES[name]).types]
        unsafe = [
            f"{c}:{t}"
            for c, t in zip(dcols, dtypes)
            if t not in DRIVER_SAFE_TYPES
        ]
        if unsafe:
            problems.append(
                f"driver-unsafe oracle types {unsafe} (add ::BIGINT casts)"
            )
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sc, dc = canon(srows, scols), canon(drows, dcols)
            if sc != dc:
                diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures += 1
            print(f"{name}: FAIL — {'; '.join(problems)}")
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
