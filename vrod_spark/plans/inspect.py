"""Physical-plan introspection helpers.

Used by tests to assert the plans we rely on at scale actually happen:
filters pushed to the Parquet scan, small dims broadcast, top-k planned as
TakeOrderedAndProject (not a global Sort), wide WholeStageCodegen spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def plan_has(df: DataFrame, *needles: str, mode: str = "formatted") -> bool:
    plan = explain_str(df, mode)
    return all(needle in plan for needle in needles)
