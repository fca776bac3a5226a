"""Exact per-group profiles: multi-percentile + multi-column distinct
counts (SURVEY §2.3 aggregates; reference has no native percentile — this
is the Spark-first exact path the q22 gate exercises).

Two physical strategies for the SAME result (exact linear-interpolation
percentiles, numpy/DuckDB ``quantile_cont`` semantics, and exact distinct
counts), chosen by the caller's knowledge of group sizes:

- ``strategy="gather"`` — one shuffle of the projected columns, then one
  Arrow batch per group scored with numpy (``np.percentile`` +
  ``nunique``). Memory per task is bounded by (rows in the largest group ×
  projected width); the caller opts in where that product is known bounded
  (e.g. profiling a bounded per-segment sample, or a dimension-keyed group
  whose per-key volume is capped). At sf0.1 this is ~2.5× faster than the
  count-map aggregate because the whole profile is one job: no Expand for
  the distinct columns, no per-partition value-count maps to serialize and
  merge, no join of split aggregates.
- ``strategy="distributed"`` — the general path with no group-size
  assumption: distinct counts via the map-side-partial ``countDistinct``
  Expand, percentiles via Spark's count-map ``percentile`` aggregate
  (array form = one buffer per column), broadcast-joined. Nothing gathers
  a raw group anywhere, so it survives groups of any size; this is the
  100-TB default, and the q26b sketch legs (HLL / GK) are the cheaper
  approximate tier above it.

Both strategies are pytest-pinned equal (tests/test_llm_ops.py) and either
satisfies the q22 oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_percentile_profile(
    df: DataFrame,
    key: str,
    pct_spec: dict[str, list[tuple[str, float]]],
    distinct_cols: dict[str, str],
    *,
    strategy: str = "distributed",
    round_digits: int = 4,
) -> DataFrame:
    """Per-``key`` profile: exact percentiles per ``pct_spec``
    (``{value_col: [(out_name, fraction), ...]}``) and exact distinct
    counts per ``distinct_cols`` (``{value_col: out_name}``).

    Output columns: ``key``, distinct-count names, percentile names —
    deterministic order (distinct names in spec order, then percentile
    names in spec order), one row per group.
    """
    if strategy == "gather":
        return _profile_gather(df, key, pct_spec, distinct_cols, round_digits)
    if strategy == "distributed":
        return _profile_distributed(df, key, pct_spec, distinct_cols, round_digits)
    raise ValueError(f"unknown strategy: {strategy!r}")


def _out_names(pct_spec, distinct_cols):
    nd_names = list(distinct_cols.values())
    pct_names = [name for col in pct_spec for (name, _p) in pct_spec[col]]
    return nd_names, pct_names


def _profile_gather(df, key, pct_spec, distinct_cols, round_digits):
    nd_names, pct_names = _out_names(pct_spec, distinct_cols)
    cols = [key, *distinct_cols.keys(), *pct_spec.keys()]
    schema = ", ".join(
        [f"{key} string"]
        + [f"{n} bigint" for n in nd_names]
        + [f"{n} double" for n in pct_names]
    )
    # Plain-data copies for the closure: worker-side functions pickle by
    # value, so no vrod_spark import may be reachable from here.
    d_items = list(distinct_cols.items())
    p_items = [(col, list(legs)) for col, legs in pct_spec.items()]
    rd = round_digits

    def profile(pdf):
        import numpy as np

        row = {key: [pdf[key].iloc[0]]}
        for col, name in d_items:
            row[name] = [int(pdf[col].nunique())]
        for col, legs in p_items:
            vals = pdf[col].to_numpy(dtype="float64")
            qs = np.percentile(vals, [p * 100.0 for (_n, p) in legs])
            for (name, _p), q in zip(legs, qs):
                row[name] = [round(float(q), rd)]
        import pandas as pd

        return pd.DataFrame(row)

    return df.select(*cols).groupBy(key).applyInPandas(profile, schema)


def _profile_distributed(df, key, pct_spec, distinct_cols, round_digits):
    # Mixing multi-column DISTINCT aggregates with buffering percentile
    # aggregates in ONE agg forces an Expand that multiplies the input per
    # distinct column AND per-percentile value buffer (7× slower,
    # measured). Split: one agg for distinct counts, one for percentiles
    # (array form = single buffer per column); the two subtrees share no
    # dependency so their stages run concurrently, then a tiny join.
    nd = df.groupBy(key).agg(
        *[F.countDistinct(col).alias(name) for col, name in distinct_cols.items()]
    )
    pct = df.groupBy(key).agg(
        *[
            F.percentile(col, F.array(*[F.lit(p) for (_n, p) in legs])).alias(f"__p_{col}")
            for col, legs in pct_spec.items()
        ]
    )
    out = nd.join(pct, key)
    for col, legs in pct_spec.items():
        for i, (name, _p) in enumerate(legs, start=1):
            out = out.withColumn(
                name, F.round(F.element_at(f"__p_{col}", i), round_digits)
            )
    return out.drop(*[f"__p_{col}" for col in pct_spec])
