"""Driver-replica 50-gate pass (r14 close protocol, now a tool).

Replicates the DRIVER's session shape, not our factory's: a subprocess
launched from a non-repo cwd (workers must not inherit the repo on
sys.path — the UDF pickle-by-reference trap), plain
``SparkSession.builder.getOrCreate()`` with only master + UI settings
(so Arrow stays OFF, shuffle.partitions stays 200, session TZ stays the
system zone), importing ``__spark_entry__`` exactly as the driver does,
and comparing every ``queries()`` entry against its DuckDB oracle with
the same canonicalization as tools/check_oracle.py. Queries without an
oracle twin get the driver's weaker rows-only check.

Run: ``python tools/driver_replica.py [sf_dir]``.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BODY = r"""
import os, sys
repo = sys.argv[1]
sf_dir = sys.argv[2]
sys.path.insert(0, repo)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as E
from tools.check_oracle import canon, duck_connect

queries = E.queries()
oracles = E.oracle_sql()
con = duck_connect(sf_dir)
fails = []
for name in sorted(queries):
    try:
        df = queries[name](spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        if name not in oracles:
            status = f"rows-only ({len(rows)} rows)"
            ok = True
        else:
            res = con.execute(oracles[name])
            want = canon(res.fetchall(), [d[0] for d in res.description])
            got = canon(rows, cols)
            ok = got == want
            status = f"OK ({len(rows)} rows)" if ok else "HASH MISMATCH"
        print(f"{name}: {status}", flush=True)
        if not ok:
            fails.append(name)
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
        fails.append(name)
spark.stop()
print(f"{len(queries) - len(fails)}/{len(queries)} passed", flush=True)
sys.exit(1 if fails else 0)
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    with tempfile.TemporaryDirectory(prefix="driver_replica_") as cwd:
        res = subprocess.run(
            [sys.executable, "-c", BODY, REPO, sf_dir],
            cwd=cwd,
            timeout=3600,
        )
    return res.returncode


if __name__ == "__main__":
    raise SystemExit(main())
