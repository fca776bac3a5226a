"""Vector math as native Catalyst expressions.

These are the scoring kernels behind SEARCHSIMILAR (reference command:
/root/reference/src/command/builder.rs:68-72) expressed as built-in
higher-order array functions (``zip_with`` + ``aggregate``), so scoring
runs JVM-side inside whole-stage codegen — no Python boundary, no UDF
serialization, and the expressions scale linearly with partition count
on a real cluster.

All kernels cast elements to DOUBLE up front: the storage type is
ARRAY<FLOAT> (FIXTURES.md `embeddings.embedding`) and float32 → float64
widening is exact, which keeps results bit-comparable with the DuckDB
oracle's DOUBLE[] arithmetic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def vector_lit(values: Sequence[float]) -> Column:
    """A literal dense vector as an ARRAY<DOUBLE> column."""
    return F.array(*[F.lit(float(v)) for v in values])


def _to_double(vec: Column | str) -> Column:
    col = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(col, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sum_i a_i * b_i, folded JVM-side in DOUBLE."""
    products = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance — the default metric for kNN scoring."""
    diffs = F.zip_with(_to_double(a), _to_double(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """NULL (not an error) when either vector has zero norm — cosine is
    undefined there, and ANSI mode (Spark 4 default) would otherwise
    raise DIVIDE_BY_ZERO mid-query on a single degenerate row."""
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)
