"""Time the DuckDB oracle queries at an sf-dir — the BASELINE.md
comparison target. Supports the same two modes as bench.py so the
comparison is symmetric:

    python tools/bench_oracle.py [sf_dir]            # serial loop
    python tools/bench_oracle.py [sf_dir] --workers 8  # concurrent suite

DuckDB parallelizes each query internally across all cores, so unlike
Spark its serial-loop total already saturates the machine; the concurrent
mode exists to show that symmetry matters little for it (per-query fixed
cost ~1 ms) while it is decisive for Spark (~0.5-2 s/query floor).
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import duck_connect
from vrod_spark.queries import ORACLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    workers = 0
    if "--workers" in sys.argv:
        workers = int(sys.argv[sys.argv.index("--workers") + 1])
    con = duck_connect(sf_dir)
    timings: dict[str, float] = {}

    def run_one(item) -> None:
        name, sql = item
        # DuckDB connections are not safely shareable across threads for
        # concurrent execution; cursor() gives a per-thread clone sharing
        # the same database (and registered views).
        c = con.cursor() if workers else con
        start = time.perf_counter()
        c.execute(sql).fetchall()
        timings[name] = round(time.perf_counter() - start, 3)

    items = sorted(ORACLES.items())
    suite_start = time.perf_counter()
    if workers:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(run_one, items))
    else:
        for item in items:
            run_one(item)
    wall = round(time.perf_counter() - suite_start, 3)
    print(
        json.dumps(
            {
                "total": wall,
                "mode": f"concurrent×{workers}" if workers else "serial",
                "serial_sum_sec": round(sum(timings.values()), 3),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
