"""Heavy hitters (frequent items) — the scale path for corpus-wide
top-k token statistics (the exact form is the q53 vocabulary gate).

The exact top-k over 100 TB of tokens is fine when the token space is
small, but a web-scale vocabulary (URLs, hashes, typo-space) makes the
exact groupBy state proportional to DISTINCT tokens. The standard
two-pass production shape bounds that:

1. **Sketch pass**: ``DataFrame.freqItems`` (Spark's single-pass
   implementation of the Karp–Shenker–Papadimitriou frequent-items
   algorithm) over the token column with support ``s`` — one scan, state
   O(1/s) per partition, returns a superset of every item with true
   frequency ≥ s·N (false positives possible, false NEGATIVES not).
2. **Exact pass**: broadcast the (small, ≤ ~1/s) candidate set back over
   the tokens and count exactly — one scan + a shuffle whose key space
   is the candidate set, not the vocabulary.

The result carries EXACT counts for every true heavy hitter; the sketch
only bounded the state. This is also the template for any
sketch-then-verify operator (the same shape as the MinHash-LSH →
exact-Jaccard dedup path in operators/dedup.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def sketch_candidates(
    df: DataFrame,
    col: str,
    *,
    support: float = 0.01,
    min_count: int | None = None,
) -> tuple[list, int]:
    """Pass 1 of :func:`heavy_hitters`: the KSP candidate superset plus
    the resolved exact threshold, as plain driver values. Split out so a
    long-lived session can treat the pair as snapshot statistics (compute
    once per corpus snapshot, serve every downstream recount from it) —
    the sketch is a pure function of the immutable input."""
    if not 0.0 < support < 1.0:
        raise ValueError(f"support must be in (0, 1); got {support}")
    # Candidate superset, state O(1/support) per partition. The KSP
    # guarantee is strict (no false negatives for frequency > s·N), but
    # callers threshold with >= min_count — when min_count equals s·N
    # exactly, an item AT the boundary could legally be dropped. Run the
    # sketch at 0.8·s (state still O(1/s), a constant factor) so the >=
    # boundary is safely inside the guarantee. Spark's freqItems requires
    # support > 1e-4, so clamp the safety margin there — for caller
    # supports in (1e-4, 1.25e-4] the margin shrinks but the call stays
    # valid (and the exact pass still filters with >= min_count).
    sketch_support = max(0.8 * support, 1.000001e-4)
    # When min_count isn't given we need N = count(df) to pin the
    # threshold. Piggy-back it on the sketch scan via observe() — the
    # CollectMetrics node rides the same job, so no second pass over the
    # corpus (at 100 TB an extra count() is a full re-scan).
    obs = Observation() if min_count is None else None
    sketch_input = (
        df if obs is None else df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    )
    candidates = sketch_input.freqItems([col], sketch_support).first()[
        f"{col}_freqItems"
    ]
    if min_count is None:
        # n >= support*N with integer n is n >= ceil(support*N); floor
        # would admit items strictly below the documented threshold.
        min_count = math.ceil(support * obs.get["n_rows"])
    return list(candidates or []), int(min_count)


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    support: float = 0.01,
    min_count: int | None = None,
    sketch: tuple[list, int] | None = None,
) -> DataFrame:
    """Items of ``col`` with exact frequency ≥ ``support`` · count(df)
    (or ≥ ``min_count`` when given), found with bounded state.

    Returns (item, n) ordered by n desc, item — exact counts, guaranteed
    to include every item meeting the threshold (KSP sketches have no
    false negatives at their support level). ``sketch``: a cached
    :func:`sketch_candidates` result to reuse (skips pass 1)."""
    candidates, min_count = (
        sketch
        if sketch is not None
        else sketch_candidates(df, col, support=support, min_count=min_count)
    )
    if not candidates:
        return df.sparkSession.createDataFrame([], "item string, n bigint")
    # Pass 2: exact counts for the (small) candidate set only — the
    # filter prunes before the shuffle, so the agg key space is bounded
    # by the candidate list, never the full domain.
    counts = (
        df.filter(F.col(col).isin(list(candidates)))
        .groupBy(F.col(col).cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.filter(F.col("n") >= F.lit(int(min_count)))
        .orderBy(F.col("n").desc(), "item")
    )
