"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is fully executed (collected) so the number includes scan,
shuffle, and result materialization. A warmup query first touches the JVM
and the parquet footers so the measured numbers reflect steady-state work,
not session spin-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vrod_spark.queries import QUERIES  # noqa: E402
from vrod_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_orders",
    "q04_window_rank",
    "q05_knn_l2",
    "q06_knn_cosine",
    "q07_knn_per_label",
    "q08_dedup_exact_summary",
    "q08b_dedup_keep_first",
    "q09_text_stats",
    "q10_semi_anti",
    "q11_date_buckets",
    "q12_events_hourly",
    "q13_rollup",
    "q13b_cube",
    "q14_stats_aggs",
    "q15_window_analytics",
    "q16_set_ops",
    "q17_range_join_tiers",
    "q18_asof_click_purchase",
    "q19_string_funcs",
    "q20_math_funcs",
    "q21_array_funcs",
    "q22_distinct_percentiles",
    "q23_pivot_status",
    "q24_subqueries",
    "q25_distribution_windows",
    "q26_jaccard_top_pairs",
    "q26b_minhash_lsh_pairs",
    "q27_simhash_pairs",
    "q28_embedding_near_dup",
    "q29_lang_quality",
    "q30_token_counts",
    "q31_fingerprint",
    "q32_embed_pipeline",
    "q33_multimodal_features",
    "q34_stream_tumbling",
    "q35_stream_sliding",
    "q36_stream_sessions",
    "q37_stream_dedup",
    "q38_grouped_normalize",
    # q39 (engine ANN roundtrip) stays in the GATE but not the bench
    # headline: it is an index BUILD (BULKINSERT+REINDEX+search), not a
    # query — there is no DuckDB-side equivalent to compare latency with.
    "q40_stateful_totals",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_spark("vrod-spark-bench")

    # Warmup: executors + parquet footers + Python/Arrow UDF workers spin
    # up outside the clock (worker fork-and-handshake is a per-session,
    # not per-query, cost and was inflating whichever UDF query ran first).
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    QUERIES["q03_top_orders"](spark, sf_dir).collect()
    warm_udf = F.pandas_udf(lambda s: s, "long")
    spark.range(1000).repartition(8).select(warm_udf("id")).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        start = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - start, 3)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
