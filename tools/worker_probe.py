"""Worker-count sensitivity probe for bench.py's concurrent suite
(r13 verdict item 2): measure the headline suite wall at several
thread-pool sizes, interleaved round-robin so host-window drift hits
every worker count equally, in ONE warmed session (the JVM/warmup cost
is per-session and identical across counts, so paying it once per count
would only add noise).

    python tools/worker_probe.py [--workers 24,32,46] [--passes 3] [sf_dir]

Prints one JSON line: {"workers": {"24": [walls...], ...}, "loadavg": ...}.
Run it twice — once quiet, once with a synthetic steal load — to decide
the default (PERF.md records the measured table).
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _warmup  # noqa: E402
from vrod_spark.queries import QUERIES, RAW_QUERIES  # noqa: E402
from vrod_spark.session import get_spark  # noqa: E402


def suite_pass(
    spark, sf_dir: str, names: list[str], workers: int, anomalies: list[dict]
) -> float:
    """One timed concurrent pass. A query that fails is retried once and
    RECORDED (ADVICE r14: a silent in-pass retry inflates that worker
    count's wall with no signal — the distortion the probe exists to
    measure); a second failure is recorded too, never allowed to escape
    pool.map and abort the whole run mid-pass."""

    def run_one(idx_name) -> None:
        idx, name = idx_name
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"probe{idx % workers}"
        )
        try:
            RAW_QUERIES[name](spark, sf_dir).collect()
        except Exception as first:
            print(f"retrying {name} (workers={workers}): {first!r}",
                  file=sys.stderr, flush=True)
            try:
                RAW_QUERIES[name](spark, sf_dir).collect()
            except Exception as second:
                anomalies.append(
                    {"query": name, "workers": workers, "outcome": "failed",
                     "error": repr(second)[:300]}
                )
                return
            anomalies.append(
                {"query": name, "workers": workers, "outcome": "retried",
                 "error": repr(first)[:300]}
            )

    start = time.perf_counter()
    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(run_one, enumerate(names)))
    return round(time.perf_counter() - start, 3)


def main() -> None:
    argv = list(sys.argv[1:])
    counts = [24, 32, 46]
    passes = 3
    if "--workers" in argv:
        i = argv.index("--workers")
        counts = [int(x) for x in argv[i + 1].split(",")]
        del argv[i : i + 2]
    if "--passes" in argv:
        i = argv.index("--passes")
        passes = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    names = [n for n in HEADLINE if n in QUERIES]
    spark = get_spark("vrod-worker-probe")
    _warmup(spark, sf_dir)
    # One throwaway pass so every measured pass sees the same cache state
    # (bench.py's repeat 2 benefits from repeat 1 the same way). Its
    # anomalies go to a SEPARATE list (ADVICE r15): appended to the
    # measured list they carried the first bracket's workers value, so
    # the "walls above are distorted" guidance flagged clean passes.
    anomalies: list[dict] = []
    warmup_anomalies: list[dict] = []
    suite_pass(spark, sf_dir, names, counts[0], warmup_anomalies)

    walls: dict[str, list[float]] = {str(c): [] for c in counts}
    for _ in range(passes):
        for c in counts:
            walls[str(c)].append(suite_pass(spark, sf_dir, names, c, anomalies))
            print(json.dumps({"partial": walls}), file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({
        "workers": walls,
        "best": {c: min(v) for c, v in walls.items()},
        "loadavg": os.getloadavg(),
        "n_queries": len(names),
        # Non-empty means some walls above are distorted (a retried query
        # ran ~2x inside its timed pass) or incomplete (a failed query
        # contributed nothing) — identify and rerun those passes.
        "anomalies": anomalies,
        # Throwaway-pass failures: informational only (nothing they ran
        # in is reported above), kept separate so they cannot be read as
        # measured-pass distortion.
        "warmup_anomalies": warmup_anomalies,
    }), flush=True)


if __name__ == "__main__":
    main()
