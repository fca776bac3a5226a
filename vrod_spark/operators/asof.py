"""As-of (time-alignment) join — an operator Spark lacks natively
(SURVEY §2.3 joins ⊕).

Semantics: for each left row, attach the single right row with the same
key and the greatest right-timestamp ≤ left-timestamp (ties broken by the
largest tiebreak value, so results are deterministic and hash-checkable).

Implementation is the **union + window fill** pattern, NOT a range join:

    union(left-marked, right-marked)
      → single shuffle on the key
      → last_value(right_payload, ignoreNulls) over
          (partition by key order by (ts, marker, tiebreak)
           rows unbounded preceding .. current)
      → keep left rows

A naive non-equi join (`l.key = r.key AND r.ts <= l.ts` + argmax) expands
to O(|L|·|R|) pairs per key before aggregating; the union trick is
O(|L|+|R|) with ONE shuffle and a linear per-partition sweep — the only
formulation that survives 100 TB with hot keys. Right rows sort before
left rows at equal timestamps (marker 0 < 1), giving inclusive `<=`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus `right_cols` from the matched
    right row (nulls when no right row precedes it)."""
    payload = F.struct(
        *( [F.col(tiebreak).alias("_tb")] if tiebreak else [F.lit(0).alias("_tb")] ),
        *[F.col(c).alias(c) for c in right_cols],
    )
    # Join-semantics NULL handling (r11 review): an equi-join never
    # matches NULL keys, and a right row with NULL timestamp satisfies
    # no "r.ts <= l.ts" predicate — but the window formulation would
    # happily partition NULL keys together and sort NULL _t first
    # (feeding its payload to every left row). Drop such right rows;
    # NULL-key left rows then sit alone in their partition and get the
    # correct NULL payload.
    r = right.filter(
        F.col(on).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.col(on).alias("_key"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_marker"),
        payload.alias("_payload"),
    )
    l = left.select(
        "*",
        F.col(on).alias("_key"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_marker"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("_key")
        # At equal (_t, _marker) multiple right rows may tie: order by the
        # tiebreak inside the struct so "last" is the max tiebreak.
        .orderBy("_t", "_marker", F.col("_payload._tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    out = filled.filter(F.col("_marker") == 1)
    for c in right_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"_match.{c}"))
    return out.drop("_key", "_t", "_marker", "_payload", "_match")
