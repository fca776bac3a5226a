"""Serial per-query profiling: cold build+execute time (noop sink where
possible, collect() for streaming/engine queries whose builders manage
their own sinks), warm re-execute time, and physical-plan node counts
(Exchange / SortMergeJoin / BroadcastHashJoin / Python-eval nodes).

Usage: python tools/profile_queries.py <sf_dir> [query ...]

One warmed session (same factory as bench.py), guide §1.4/§1.5: noop sink
times computation without driver-side row materialization; every job is
labelled. Output: one JSON line per query on stdout (logs on stderr).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_counts(df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return {
        "exchange": plan.count("Exchange"),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "py": plan.count("EvalPython")
        + plan.count("MapInPandas")
        + plan.count("MapInArrow")
        + plan.count("FlatMapGroupsInPandas"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    from bench import HEADLINE, _warmup
    from vrod_spark.queries import RAW_QUERIES
    from vrod_spark.session import get_spark

    spark = get_spark("vrod-profile")
    _warmup(spark, sf_dir)
    names = [n for n in HEADLINE if n in RAW_QUERIES]
    extra = [n for n in RAW_QUERIES if n not in names]
    for name in names + sorted(extra):
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        rec: dict = {"q": name}
        try:
            t0 = time.perf_counter()
            df = RAW_QUERIES[name](spark, sf_dir)
            rec["build"] = round(time.perf_counter() - t0, 3)
            rec.update(plan_counts(df))
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            rec["cold"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            RAW_QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rec["warm"] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — evidence over purity
            rec["error"] = f"{type(exc).__name__}: {exc}"[:160]
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
