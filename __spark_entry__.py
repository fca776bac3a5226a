"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship SEARCHSIMILAR query (exact kNN over the
embeddings collection — the reference's raison d'être, builder.rs:68-72) on
sf0.001. ``queries()`` / ``oracle_sql()`` expose the declared corpus from
``vrod_spark.queries`` (SURVEY.md §2.4) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vrod_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q05_knn_metrics"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    return dict(ORACLES)
