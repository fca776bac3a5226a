"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure `df` has at least `min_parts` partitions (default: the
    context's parallelism) before a compute-heavy narrow stage.

    Parquet scans parallelize by row group; a table written as one row
    group (the shape of small exports and of the local test data) scans as
    ONE task, serializing every downstream narrow transformation —
    tokenization, shingling, signature hashing — onto a single core. When
    per-row compute dominates, a cheap shuffle of the raw rows buys full
    parallelism. On realistic multi-split inputs (any 100 TB table has
    thousands of row groups) the partition count already exceeds the
    threshold and this is a structural no-op — no shuffle is added.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
