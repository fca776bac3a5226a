"""MLlib-backed approximate similarity — the SURVEY §4.2 mapping
("MLlib LSH: BucketedRandomProjectionLSH, MinHashLSH") as an alternative
to the engine-native sign-LSH in operators/ann.py.

Two paths:

- **BucketedRandomProjectionLSH** over the embedding column: Euclidean
  LSH for `approxNearestNeighbors` (single-query kNN) and
  `approxSimilarityJoin` (distance-threshold join). Vectors convert to
  ``VectorUDT`` only at this boundary (SURVEY §1.3: ARRAY<FLOAT> is the
  storage type; MLlib types never leak into storage).
- **MinHashLSH** over shingle-count sparse vectors (HashingTF):
  Jaccard-distance approximate join — MLlib's version of the
  hand-rolled MinHash in operators/dedup.py.

When to use which: the native implementations keep everything in
codegen'd expressions and are faster at moderate scale; the MLlib path
buys `approxNearestNeighbors`' probing heuristics and a maintained
estimator API. Both are exposed so either can back SEARCHSIMILAR.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrod_spark.functions.text import shingles

SEED = 42


def _with_features(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("_features", array_to_vector(F.col(vec_col)))


def brp_fit(df: DataFrame, *, vec_col: str = "embedding", bucket_length: float = 0.5,
            num_hash_tables: int = 4):
    """Fit a Euclidean-LSH model (deterministic seed)."""
    feats = _with_features(df, vec_col)
    model = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=SEED,
    ).fit(feats)
    return model, feats


def brp_approx_knn(
    df: DataFrame,
    query_vector: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
) -> DataFrame:
    """approxNearestNeighbors: returns (id, dist) for ~k nearest."""
    from pyspark.ml.linalg import Vectors

    model, feats = brp_fit(df, vec_col=vec_col, bucket_length=bucket_length,
                           num_hash_tables=num_hash_tables)
    res = model.approxNearestNeighbors(feats, Vectors.dense(query_vector), k)
    return res.select(F.col(id_col), F.col("distCol").alias("dist")).orderBy("dist", id_col)


def brp_similarity_join(
    a: DataFrame,
    b: DataFrame,
    threshold: float,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
) -> DataFrame:
    """approxSimilarityJoin under Euclidean distance ≤ threshold; output
    canonical (id_a < id_b, dist)."""
    model, fa = brp_fit(a, vec_col=vec_col, bucket_length=bucket_length,
                        num_hash_tables=num_hash_tables)
    fb = _with_features(b, vec_col)
    joined = model.approxSimilarityJoin(fa, fb, threshold, distCol="dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.col("dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .orderBy("dist", "id_a", "id_b")
    )


def minhash_similarity_join(
    docs: DataFrame,
    threshold: float = 0.6,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_features: int = 1 << 18,
    num_hash_tables: int = 8,
) -> DataFrame:
    """MLlib MinHashLSH over HashingTF shingle vectors: approximate pairs
    with Jaccard DISTANCE ≤ threshold (i.e. similarity ≥ 1-threshold).

    Note MLlib computes Jaccard on the hashed-feature SETS (HashingTF
    collisions make it an approximation of true shingle Jaccard) — use
    operators/dedup.py for the exact-verified contract."""
    # NULL-text exclusion must be VALUE-level, not filter-level (r11
    # review): shingles(NULL) is NULL, HashingTF's Scala UDF NPEs on a
    # null array and MinHash rejects a zero vector — and Catalyst merges
    # and reorders filter predicates around the LSH UDFs, so neither an
    # isNotNull filter nor a coalesce-to-empty + size filter can
    # guarantee the UDFs never see the bad row. A per-row UNIQUE
    # sentinel shingle is order-proof: never null, never zero, shares
    # nothing with any other document, so NULL docs can never pair.
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(
            shingles(text_col, n),
            F.array(
                F.concat(F.lit("\x00vr_null:"), F.col(id_col).cast("string"))
            ),
        ).alias("sh"),
    )
    tf = HashingTF(inputCol="sh", outputCol="_features", numFeatures=num_features, binary=True)
    feats = tf.transform(sh)
    model = MinHashLSH(
        inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=SEED
    ).fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, threshold, distCol="jaccard_dist")
    return (
        joined.select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.col("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .orderBy("jaccard_dist", "id_a", "id_b")
    )
