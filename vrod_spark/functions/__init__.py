from vrod_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    vector_lit,
)

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_norm",
    "vector_lit",
]
