from vrod_spark.operators.knn import knn_exact, knn_per_group

__all__ = ["knn_exact", "knn_per_group"]
