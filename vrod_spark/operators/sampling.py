"""Deterministic sampling for reproducible training-data mixes.

``df.sample``/``sampleBy`` draw from a partition-seeded RNG: the selected
set changes under repartitioning, AQE re-planning, or retried tasks —
unacceptable when a 100 TB training mix must be re-creatable bit-for-bit
months later. These operators decide acceptance per ROW from a hash of a
stable key, so the same row is always in or out regardless of physical
execution, engine, or cluster shape (the q54 gate proves cross-engine
equality against DuckDB's md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction(key: Column | str) -> Column:
    """Uniform [0,1) value derived from md5(key) — the acceptance
    coordinate. First 8 hex chars → 32-bit int / 2^32; md5 is available
    in every engine, so samples are reproducible OUTSIDE Spark too."""
    col = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(2**32))


def deterministic_sample(
    df: DataFrame, key: str, fraction: float | dict[str, float],
    *, strata_col: str | None = None,
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by ``hash_fraction`` of
    the key column. With a dict + ``strata_col``, each stratum gets its
    own rate (the corpus-mixture shape: {"web": 0.8, "books": 0.5}).
    Unlisted strata default to rate 0.0 — an explicit mix, not a leak."""
    coord = hash_fraction(key)
    if isinstance(fraction, dict):
        if strata_col is None:
            raise ValueError("dict fractions require strata_col")
        rate = F.lit(0.0)
        for value, frac in sorted(fraction.items()):
            rate = F.when(F.col(strata_col) == value, float(frac)).otherwise(rate)
    else:
        rate = F.lit(float(fraction))
    return df.filter(coord < rate)
