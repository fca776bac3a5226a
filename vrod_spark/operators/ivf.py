"""IVF (inverted-file) ANN index — the centroid-partitioned alternative
to sign-LSH (operators/ann.py), same REINDEX/SEARCH contract.

Build (offline, one distributed pass + tiny driver-side k-means):
  1. sample ≤ ``train_sample`` vectors to the driver;
  2. spherical k-means (seeded numpy, a few Lloyd iterations) →
     ``n_centroids`` unit centroids;
  3. assign every row to its nearest centroid via one Arrow-batched
     matmul (argmax of dot products — vectors are compared on the unit
     sphere, so max-dot == min-L2);
  4. rewrite the snapshot ``partitionBy("bucket")`` exactly like the LSH
     layout, record centroids + histogram in collection meta.

Search: rank centroids by distance to the query driver-side, take
buckets until the histogram covers ``candidate_factor × k`` rows
(monotone recall knob, exact in the limit), then partition-pruned
exact scoring.

IVF vs sign-LSH: IVF adapts to the data distribution (centroids land
where vectors are), so on clustered corpora it prunes far better; LSH is
data-oblivious (no training pass, stable under drift). Both are exposed;
REINDEX picks via ``kind``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrod_spark.operators.knn import knn_exact

SEED = 42


def _spherical_kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    unit = sample / np.where(norms == 0, 1, norms)
    centroids = unit[rng.choice(len(unit), size=min(k, len(unit)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(unit @ centroids.T, axis=1)
        for ci in range(len(centroids)):
            members = unit[assign == ci]
            if len(members):
                c = members.sum(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    centroids[ci] = c / n
    return centroids


def ivf_assign_expr(spark, centroids: np.ndarray, vec_col: str = "embedding"):
    """Nearest-centroid bucket assignment as an Arrow-batched column
    expression (broadcast centroid matrix, one matmul per batch). Shared by
    the REINDEX rewrite and the O(delta) indexed-INSERT path."""
    cb = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    @F.pandas_udf("int")
    def assign(vecs):
        import numpy as np
        import pandas as pd

        cents = cb.value
        mat = np.array(vecs.tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        unit = mat / np.where(norms == 0, 1, norms)
        return pd.Series(np.argmax(unit @ cents.T, axis=1).astype(np.int32))

    return assign(F.col(vec_col))


def reindex_ivf(
    collection,
    *,
    n_centroids: int = 64,
    train_sample: int = 10_000,
    seed: int = SEED,
) -> dict:
    """Fit centroids, rewrite the snapshot centroid-partitioned, commit."""
    meta = collection.meta
    if meta.get("dimension") is None:
        collection.update_meta(index=None)
        return {"collection": collection.name, "indexed": False, "reason": "no vectors"}

    df = collection.read()
    # Deterministic bounded sample (xxhash64-smallest rows — a pure
    # function of the data): ``df.sample`` seeds per PARTITION, so the
    # trained centroids — and search recall — would vary with the
    # snapshot's file listing order across otherwise-identical builds.
    sample_rows = (
        df.select(F.col("embedding").alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("array<float>")))
        .limit(train_sample)
        .collect()
    )
    sample = np.array([r["v"] for r in sample_rows], dtype=np.float64)
    centroids = _spherical_kmeans(sample, n_centroids, seed=seed)
    bucketed = df.withColumn(
        "bucket", ivf_assign_expr(df.sparkSession, centroids, "embedding")
    )
    nxt, nxt_dir = collection._next_version_dir()
    (
        bucketed.repartition("bucket")
        .sortWithinPartitions("bucket", "id")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(nxt_dir)
    )
    hist_rows = (
        collection.db.spark.read.parquet(nxt_dir).groupBy("bucket").count().collect()
    )
    histogram = {str(r["bucket"]): r["count"] for r in hist_rows}
    collection.update_meta(
        index={
            "kind": "ivf",
            "n_centroids": int(len(centroids)),
            "seed": seed,
            "centroids": [[float(x) for x in c] for c in centroids],
            "histogram": histogram,
        }
    )
    collection._commit(nxt, "REINDEX", {"kind": "ivf", "buckets": len(histogram)})
    return {
        "collection": collection.name,
        "indexed": True,
        "kind": "ivf",
        "buckets": len(histogram),
    }


def ivf_candidate_buckets(
    index_meta: dict, vector: list[float], k: int, candidate_factor: int = 8
) -> list[int]:
    centroids = np.asarray(index_meta["centroids"], dtype=np.float64)
    histogram = {int(b): int(n) for b, n in index_meta["histogram"].items()}
    q = np.asarray(vector, dtype=np.float64)
    nq = np.linalg.norm(q)
    qu = q / nq if nq else q
    order = np.argsort(-(centroids @ qu))  # nearest centroid first
    want = max(candidate_factor * k, 64)
    chosen, have = [], 0
    for ci in order:
        n = histogram.get(int(ci), 0)
        if n == 0:
            continue
        chosen.append(int(ci))
        have += n
        if have >= want:
            break
    return chosen or [int(order[0])]


def ivf_search(
    collection, vector: list[float], k: int, *, prefilter: str | None = None,
    candidate_factor: int = 8,
) -> DataFrame:
    """Probe nearest centroids (partition-pruned scan) then exact-score."""
    index_meta = collection.meta["index"]
    buckets = ivf_candidate_buckets(index_meta, vector, k, candidate_factor)
    df = collection.db.spark.read.parquet(collection.version_dir())
    df = df.filter(F.col("bucket").isin(buckets))
    if prefilter:
        df = df.filter(F.expr(prefilter))
    return knn_exact(
        df,
        vector,
        k,
        vec_col="embedding",
        id_col="id",
        metric=collection.meta.get("metric", "l2"),
        payload_cols=("payload",),
    )
