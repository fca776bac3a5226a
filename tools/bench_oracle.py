"""Time the DuckDB oracle queries at an sf-dir — the BASELINE.md
comparison target (engine must be within 2× of this total)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import duck_connect
from vrod_spark.queries import ORACLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duck_connect(sf_dir)
    timings = {}
    for name, sql in sorted(ORACLES.items()):
        start = time.perf_counter()
        con.execute(sql).fetchall()
        timings[name] = round(time.perf_counter() - start, 3)
    print(json.dumps({"total": round(sum(timings.values()), 3), "queries": timings}))


if __name__ == "__main__":
    main()
