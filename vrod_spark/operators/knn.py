"""Exact k-nearest-neighbor search — the SEARCHSIMILAR command's engine.

Reference intent: `SEARCHSIMILAR <query[,k]>` over a collection
(/root/reference/src/command/builder.rs:68-72, types.rs:121-132; the Rust
`execute()` body is an empty stub). Spark realization: score every row with
a codegen'd distance expression, then ``orderBy(score).limit(k)`` — Catalyst
plans this as ``TakeOrderedAndProject``: each task keeps a k-row heap, the
driver merges per-partition top-k. No global sort, no shuffle of the full
table; at 100 TB this moves only ``k × partitions`` rows to the driver.

Determinism: ties broken by the id column so results hash-match oracles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vrod_spark.functions.vector import (
    cosine_distance,
    cosine_distance_to_lit,
    l2_distance,
    vector_lit,
)

_METRICS = {
    "l2": l2_distance,
    "cosine": cosine_distance,
}


def _distance(metric: str, vec_col: Column | str, query: Column) -> Column:
    try:
        fn = _METRICS[metric]
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; expected one of {sorted(_METRICS)}")
    return fn(vec_col, query)


def _distance_lit(metric: str, vec_col: Column | str, query_vals) -> Column:
    """Distance against a literal query vector. Cosine takes the
    constant-query-norm form (functions/vector.cosine_distance_to_lit —
    bit-identical, one less interpreted per-row aggregate); everything
    else dispatches through _METRICS so a metric added there can never
    silently score as l2 on the literal paths (r12 review)."""
    if metric == "cosine":
        return cosine_distance_to_lit(vec_col, query_vals)
    return _distance(metric, vec_col, vector_lit(query_vals))


def knn_exact(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "l2",
    payload_cols: Sequence[str] = (),
    dist_alias: str = "dist",
) -> DataFrame:
    """Brute-force exact kNN: scan → score → top-k.

    Returns (id, *payload_cols, dist) for the k nearest rows, ordered by
    (dist, id). This is both the serving path for small collections and the
    recall oracle for the LSH approximate path.
    """
    dist = _distance_lit(metric, vec_col, query_vector)
    scored = df.select(id_col, *payload_cols, dist.alias(dist_alias))
    # asc_nulls_last: a NULL distance (row inserted without an
    # embedding, or zero-norm vector under cosine) must never occupy the
    # top-k ahead of real neighbors — Spark's plain asc sorts NULLS
    # FIRST (r11 review).
    return scored.orderBy(
        F.col(dist_alias).asc_nulls_last(), F.col(id_col).asc()
    ).limit(k)


def knn_per_group(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 3,
    *,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "l2",
    dist_alias: str = "dist",
) -> DataFrame:
    """Top-k nearest per group (grouped/filtered kNN).

    Window ``row_number`` over (dist, id) within each group — a single
    shuffle on the group key; each group's top-k computed in parallel.
    """
    dist = _distance_lit(metric, vec_col, query_vector)
    scored = df.select(group_col, id_col, dist.alias(dist_alias))
    w = Window.partitionBy(group_col).orderBy(
        F.col(dist_alias).asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy(group_col, dist_alias, id_col)
    )


def range_search(
    df: DataFrame,
    query_vector: Sequence[float],
    radius: float,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "l2",
    payload_cols: Sequence[str] = (),
    dist_alias: str = "dist",
    limit: int | None = None,
) -> DataFrame:
    """Range (radius) search — kNN's fixed-threshold sibling: every row
    with ``distance ≤ radius``, ordered by (dist, id), optionally capped.
    The filter is a codegen'd predicate evaluated at the scan, so unlike
    top-k nothing is heap-buffered: at 100 TB this is a pure map + a
    TakeOrdered only when ``limit`` is set (otherwise a small global sort
    of the matching rows — callers bound the result by choosing radius).
    This is the dedup-style query shape ("everything within ε"), where a
    k cut would silently drop true matches past k."""
    dist = _distance_lit(metric, vec_col, query_vector)
    scored = (
        df.select(id_col, *payload_cols, dist.alias(dist_alias))
        .filter(F.col(dist_alias) <= F.lit(float(radius)))
        .orderBy(F.col(dist_alias).asc_nulls_last(), F.col(id_col).asc())
    )
    return scored.limit(int(limit)) if limit is not None else scored


def knn_batch(
    df: DataFrame,
    query_vectors: Sequence[Sequence[float]],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "l2",
    payload_cols: Sequence[str] = (),
    dist_alias: str = "dist",
) -> DataFrame:
    """Per-query top-k for a BATCH of query vectors as ONE plan — the
    evaluation-harness shape (score a probe set against the corpus in a
    single job instead of Q sequential jobs, each paying scan + plan
    latency). The Q×dim query matrix broadcasts; every row is scored
    against each query with the same codegen'd distance expression as
    knn_exact; per-query top-k is a window over query_idx (one shuffle
    keyed by query index — the knn_per_group pattern).

    Returns (query_idx, id, *payload_cols, dist), ordered by
    (query_idx, dist, id).

    Two-stage top-k: a window over bare ``query_idx`` would funnel each
    query's ENTIRE scored corpus into one sort task (the hot-key
    straggler the dedup operators also engineer around). Stage 1 takes a
    top-k per (query_idx, input partition id) — correctness-preserving,
    since the global top-k is a subset of every partition's local top-k
    union. Its exchange still carries the Q×N scored rows, but over
    Q × partitions keys, so no single task sorts more than one
    partition's share; stage 2's exchange and sort then see only
    Q × partitions × k rows."""
    spark = df.sparkSession
    from vrod_spark.localdf import local_df

    # For cosine, ship each query's norm alongside it: the distance
    # would otherwise re-reduce the query array per (row x query) pair
    # (interpreted aggregate — the cosine_distance_to_lit rationale,
    # batch form). Python's left-to-right sum matches the fold it
    # replaces, so the distances are bit-identical; the shared
    # cosine_distance_with_norm keeps the zero-norm NULL contract in
    # one place (r12 review).
    import math

    with_norm = metric == "cosine"
    rows = [
        (i, [float(x) for x in v])
        + (
            (math.sqrt(sum(float(x) * float(x) for x in v)),)
            if with_norm
            else ()
        )
        for i, v in enumerate(query_vectors)
    ]
    schema = "query_idx int, _q array<double>" + (
        ", _qn double" if with_norm else ""
    )
    qdf = F.broadcast(local_df(spark, rows, schema))
    if with_norm:
        from vrod_spark.functions.vector import cosine_distance_with_norm

        dist = cosine_distance_with_norm(vec_col, F.col("_q"), F.col("_qn"))
    else:
        dist = _distance(metric, vec_col, F.col("_q"))
    scored = df.crossJoin(qdf).select(
        "query_idx", id_col, *payload_cols, dist.alias(dist_alias)
    )
    order = [F.col(dist_alias).asc_nulls_last(), F.col(id_col).asc()]
    local = Window.partitionBy("query_idx", F.spark_partition_id()).orderBy(*order)
    pruned = (
        scored.withColumn("_rn", F.row_number().over(local))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    final = Window.partitionBy("query_idx").orderBy(*order)
    return (
        pruned.withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("query_idx", dist_alias, id_col)
    )
