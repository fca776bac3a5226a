"""Skew-aware join: explicit key salting for hot-key joins.

AQE's skew-join splitting (enabled in the session factory) handles most
skew at runtime by splitting oversized partitions — but it only applies
to sort-merge joins and works post-hoc. Explicit salting is the
planned-ahead variant for *known* pathological keys (the classic "one
user is 30% of events" shape at 100 TB):

    left (large, skewed)  : salt = hash(row) % factor     (split hot keys)
    right (smaller)       : replicate each row `factor` times

The join key becomes (key, salt), so one hot key's rows spread over
`factor` reducers. Replication multiplies the right side — use only when
|right| × factor is comfortably shuffle-able (else broadcast it and no
salting is needed at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    factor: int = 8,
    how: str = "inner",
    salt_by: str | Column | None = None,
) -> DataFrame:
    """Equi-join on `on` with the left side salted `factor` ways.

    ``salt_by`` names a left column to derive the deterministic salt from
    (defaults to the join key's row spread via xxhash64 over all left
    columns — deterministic per row content, so results are stable).

    Only left-preserving joins are valid: the right side is REPLICATED
    ``factor`` times, so 'right'/'full'/'right_semi' would emit ``factor``
    duplicate copies of every unmatched right row (ADVICE r1). Flip the
    operands (salting always salts the LARGE side) instead."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
               "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports left-preserving joins only ({sorted(allowed)}); "
            f"got how={how!r} — swap the sides so the replicated side is the small one"
        )
    if salt_by is None:
        # Hashable columns only: Spark rejects hash functions over
        # MapType, so a collection-shaped left side (meta map column)
        # would fail the whole join with an opaque AnalysisException
        # (r11 review).
        hashable = [
            f.name
            for f in left.schema.fields
            if f.dataType.typeName() != "map"
        ]
        if not hashable:
            raise ValueError(
                "salted_join cannot derive a default salt: every left "
                "column is a map type; pass salt_by="
            )
        salt_src = F.xxhash64(*[F.col(c) for c in hashable])
    else:
        salt_src = F.xxhash64(F.col(salt_by) if isinstance(salt_by, str) else salt_by)
    l_salted = left.withColumn("_salt", F.pmod(salt_src, F.lit(factor)).cast("int"))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    out = l_salted.join(r_replicated, [on, "_salt"], how)
    return out.drop("_salt")
