"""Semantic clustering + cluster-scoped semantic dedup (SemDeDup).

The curation pattern from SemDeDup (Abbas et al. 2023, arXiv:2303.09540,
public paper): embed the corpus, k-means-cluster the embeddings, then
look for semantic duplicates only WITHIN each cluster — the cluster
assignment turns the O(N^2) all-pairs semantic-similarity join into
O(sum n_c^2) with n_c ~ N/k, the same blocking idea sign-LSH uses but
data-adaptive. At 100 TB the cluster column is also the natural
partition key for downstream curation (per-cluster sampling, pruning,
inspection).

Reference provenance: the reference stores embeddings per record and
builds similarity search over them (`src/command/builder.rs:68-76`
SEARCHSIMILAR / REINDEX; `src/utils/embeddings.rs:29-31` embed); the
LLM-curation surface itself is the BASELINE.json north-star extension —
the reference has no clustering code to mirror.

Scale notes:
- Training is the bounded-sample spherical k-means shared with the IVF
  index (operators/ivf.py): one deterministic xxhash64-ordered sample
  to the driver, Lloyd on numpy, centroids broadcast back. Driver state
  is O(k * dim), never O(rows).
- Assignment is one Arrow-batched matmul per batch (pandas_udf) — no
  shuffle; the cluster column is computed map-side.
- The within-cluster pairwise join shuffles on the cluster id only, and
  both self-join sides carry the `shuffle_hash` hint so ReuseExchange
  computes the assignment pipeline once (same treatment as the
  banded/blocked joins in operators/dedup.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vrod_spark.operators.ivf import _spherical_kmeans

SEED = 42


def kmeans_train(
    df: DataFrame,
    k: int,
    *,
    vec_col: str = "embedding",
    train_sample: int = 10_000,
    iters: int = 10,
    seed: int = SEED,
) -> np.ndarray:
    """Deterministic spherical k-means over a bounded sample.

    Sampling is by smallest xxhash64 of the vector (a pure function of
    the data), not ``df.sample`` — the latter seeds per partition, so
    the trained centroids would vary with file listing order.
    Returns a (k, dim) float64 array of unit centroids.
    """
    rows = (
        df.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("array<float>")))
        .limit(train_sample)
        .collect()
    )
    sample = np.array([r["v"] for r in rows], dtype=np.float64)
    return _spherical_kmeans(sample, k, iters=iters, seed=seed)


def seed_centroids(df: DataFrame, k: int, *, vec_col: str = "embedding", id_col: str = "vec_id") -> np.ndarray:
    """The k vectors with the smallest ids, unit-normalized — the
    trainless deterministic centroid rule the hash-checked gate uses
    (SQL-expressible, so DuckDB derives the identical centroids)."""
    rows = df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v")).orderBy("i").limit(k).collect()
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(norms == 0, 1, norms)


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    ccos_col: str = "ccos",
) -> DataFrame:
    """Nearest-centroid assignment by cosine, plus the cosine itself.

    One broadcast + one Arrow-batched matmul per batch; ties go to the
    lowest centroid id (np.argmax takes the first maximum), matching
    the oracle's ``ORDER BY cos DESC, cid`` tie-break.
    """
    cb = df.sparkSession.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64)
    )

    @F.pandas_udf("struct<cluster:int,ccos:double>")
    def assign(vecs):
        import numpy as np
        import pandas as pd

        cents = cb.value
        cn = np.linalg.norm(cents, axis=1, keepdims=True)
        cu = cents / np.where(cn == 0, 1, cn)
        mat = np.array(vecs.tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        unit = mat / np.where(norms == 0, 1, norms)
        # Per-centroid multiply+sum, NOT a batch matmul: BLAS dgemm
        # blocking can change the accumulation order with the batch's
        # row count, giving ulp-different cosines for the SAME vector in
        # different Arrow batches — which breaks the (ccos, id) rank
        # tie between a vector and its exact duplicate downstream.
        # elementwise-multiply + axis-sum is a fixed pairwise reduction
        # per row, batch-size-independent.
        sims = np.empty((len(unit), len(cu)), dtype=np.float64)
        for j in range(len(cu)):
            sims[:, j] = (unit * cu[j]).sum(axis=1)
        best = np.argmax(sims, axis=1)
        return pd.DataFrame(
            {
                "cluster": best.astype(np.int32),
                "ccos": sims[np.arange(len(best)), best],
            }
        )

    out = df.withColumn("_a", assign(F.col(vec_col)))
    return out.select(
        *[c for c in df.columns],
        F.col("_a.cluster").alias(cluster_col),
        F.col("_a.ccos").alias(ccos_col),
    )


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    min_cosine: float = 0.99,
) -> DataFrame:
    """SemDeDup: mark within-cluster semantic duplicates.

    Rank cluster members by (cosine-to-centroid DESC, id); a row is
    ``kept = false`` when an earlier-ranked member of the SAME cluster
    is within ``min_cosine`` of it. Only within-cluster pairs are ever
    scored — the SemDeDup blocking contract.

    Returns (id, cluster, ccos, rank, kept). The pairwise cosine runs
    as a codegen'd zip_with/aggregate expression on the JVM; the join
    shuffles cluster ids only.
    """
    # The applyInPandas output schema must carry the id's REAL type —
    # semantic_dedup works on any orderable id directly (string ids from
    # a user collection included); hard-coding `id long` would fail with
    # an Arrow type error at runtime (ADVICE r8).
    id_type = df.schema[id_col].dataType.simpleString()
    assigned = kmeans_assign(df, centroids, vec_col=vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "cluster", "ccos"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy(F.col("ccos").desc(), "id")
    ranked = assigned.withColumn("rank", F.row_number().over(w))
    tau = float(min_cosine)

    # Within-cluster pairwise scoring as ONE BLAS matmul per cluster
    # (applyInPandas — clusters are the blocks, the SemDeDup contract).
    # A zip_with/aggregate cosine join was tried first and rejected:
    # HigherOrderFunction is CodegenFallback (interpreted), and at
    # sum(n_c^2) pair volume it was ~20x slower than the matmul. Row
    # blocks bound the sims buffer for large clusters.
    def mark(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("rank").reset_index(drop=True)
        n = len(pdf)
        if n <= 1:
            return pdf.assign(kept=True)[["id", "cluster", "ccos", "rank", "kept"]]
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        unit = mat / np.where(norms == 0, 1, norms)
        dropped = np.zeros(n, dtype=bool)
        block = 2048
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            sims = unit[lo:hi] @ unit.T  # rows lo..hi vs ALL cluster members
            for j in range(lo, hi):
                row = sims[j - lo]
                # Earlier-ranked member within tau -> j is a duplicate.
                if np.any(row[:j] >= tau):
                    dropped[j] = True
        return pdf.assign(kept=~dropped)[["id", "cluster", "ccos", "rank", "kept"]]

    return ranked.groupBy("cluster").applyInPandas(
        mark, f"id {id_type}, cluster int, ccos double, rank int, kept boolean"
    )


def cluster_profile(dedup: DataFrame) -> DataFrame:
    """Per-cluster curation summary over semantic_dedup output:
    (cluster, n_members, n_kept, sum_ccos_u6).

    ``sum_ccos_u6`` = sum of each member's centroid cosine snapped to
    the 1e-6 grid PER ROW and cast to an integer BEFORE aggregation.
    An averaged float was the r8/r9 pin and was twice reported drifted
    by the driver despite clean in-session re-runs; integer sums of
    per-row-snapped values are summation-order-independent by
    construction — the only way this column moves is a per-row cosine
    crossing a 5e-7 snap boundary (drift is ~1e-13; margins are audited
    by tools/pin_margins.py)."""
    return (
        dedup.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.sum(F.round(F.col("ccos") * 1e6).cast("long")).alias("sum_ccos_u6"),
        )
        .orderBy("cluster")
    )


def semantic_contamination_scores(
    df: DataFrame,
    eval_vectors: np.ndarray,
    *,
    vec_col: str = "embedding",
    score_col: str = "max_eval_cos",
    return_broadcast: bool = False,
):
    """Max cosine of each row's vector against an EVAL anchor set — the
    embedding-space analog of n-gram benchmark decontamination (the
    scrub Abbas-era pipelines run alongside the GPT-3/PaLM 13-gram
    rule: a paraphrased eval question shares no 13-gram but sits at
    cosine ~0.9+ of its source).

    ``eval_vectors`` is the E×d eval matrix — driver-bounded by the same
    contract as k-means centroids (benchmarks are thousands of rows, not
    corpora; an eval set beyond driver memory should go through the
    bucketed pair machinery instead). It broadcasts once; each Arrow
    batch then pays ONE vectorized multiply per eval row, and only
    ``(input row, one double)`` ever shuffles — nothing pairwise
    materializes. Rows with a zero/NULL-normed vector score 0.0 (no
    evidence of contamination).

    Returns the input schema plus ``score_col``. With
    ``return_broadcast=True`` returns ``(df, broadcast)`` so a caller
    that EXECUTES the plan (the engine's DEDUP decontaminate rewrite)
    can unpersist the eval matrix from executor memory afterwards —
    lazy callers must leave it alive for the plan's lifetime.
    """
    ev = np.asarray(eval_vectors, dtype=np.float64)
    if ev.ndim != 2 or not len(ev):
        raise ValueError("eval_vectors must be a non-empty E x d matrix")
    en = np.linalg.norm(ev, axis=1, keepdims=True)
    eb = df.sparkSession.sparkContext.broadcast(ev / np.where(en == 0, 1, en))

    @F.pandas_udf("double")
    def max_cos(vecs):
        import numpy as np
        import pandas as pd

        eu = eb.value
        out = np.zeros(len(vecs), dtype=np.float64)
        ok = vecs.notna().to_numpy()
        if ok.any():
            mat = np.array(vecs[ok].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            unit = mat / np.where(norms == 0, 1, norms)
            # Per-eval-row multiply+sum (not dgemm) for batch-size-
            # independent accumulation order — same rationale as
            # kmeans_assign.
            best = np.full(len(unit), -np.inf)
            for j in range(len(eu)):
                np.maximum(best, (unit * eu[j]).sum(axis=1), out=best)
            out[ok] = np.where(np.isfinite(best), best, 0.0)
        return pd.Series(out)

    scored = df.withColumn(score_col, max_cos(F.col(vec_col)))
    return (scored, eb) if return_broadcast else scored
