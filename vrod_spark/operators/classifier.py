"""Trained linear quality classifier over hashed n-gram features.

The CCNet / GPT-3 / LLaMA corpus recipe filters web text with a LINEAR
classifier trained to separate a trusted high-quality corpus (Wikipedia,
books) from raw crawl — fasttext-style: bag of hashed n-gram features,
logistic loss. This module is that component with zero ML dependencies:

- **Features**: unigrams + bigrams of whitespace tokens, md5-hashed into
  ``n_buckets`` (the exact DSIR bucket recipe — `operators/sampling.
  dsir_scores` — so the two data-selection scorers share a feature
  space), count-normalized per document.
- **Training** (`train_quality_classifier`): a DETERMINISTIC bounded
  sample per class (md5-coordinate threshold, the `deterministic_sample`
  rule) is aggregated to (doc, bucket, count) rows and collected —
  thousands of rows × a 256-bucket vocabulary, driver-trivial by
  construction, the same bounded-sample contract as BPE merge training
  and k-means seeding. Full-batch gradient descent in float64 with a
  fixed iteration count — bit-reproducible, no RNG.
- **Scoring** (`quality_classifier_scores`): fully DISTRIBUTED and
  Python-free — explode → bucket id (codegen md5/conv) → per-doc count
  agg → broadcast join of the (bucket, weight) table → weighted sum →
  sigmoid. Text leaves the scan as 2-byte bucket ids; the model is
  ``n_buckets`` rows. At 100 TB this is one explode-agg shuffle and a
  broadcast, the same shape as DSIR.

No reference analog (north-star [N] extension; the reference has no text
ops beyond tokenization — src/utils/embeddings.rs:22-27).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hashed_ngram_counts(
    df: DataFrame, *, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(id, _b, _c): per-document hashed unigram+bigram bucket counts —
    built from the ONE shared featurizer (`operators/sampling.
    hashed_ngram_feats` / `ngram_bucket`), so classifier and DSIR scores
    live in the same feature space by construction."""
    from vrod_spark.operators.sampling import hashed_ngram_feats, ngram_bucket

    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(hashed_ngram_feats(text_col)).alias("_f"),
        )
        .select("_id", ngram_bucket(F.col("_f"), n_buckets).alias("_b"))
        .groupBy("_id", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )


def train_quality_classifier(
    df: DataFrame,
    label: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    max_rows_per_class: int = 2000,
    epochs: int = 200,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> np.ndarray:
    """Train logistic-regression weights separating ``label`` rows
    (quality=1) from the rest. Returns a float64 vector of
    ``n_buckets + 1`` (bias last) for `quality_classifier_scores`.

    Deterministic end to end: the per-class training sample is chosen by
    an md5-coordinate threshold scaled to ``max_rows_per_class`` (stable
    under repartition/retry), and optimization is fixed-epoch full-batch
    gradient descent — no RNG anywhere.
    """
    # NULL labels are UNKNOWN, not negative: they are excluded from
    # training entirely (bool(None) would otherwise fold them into the
    # False class count and skew — or unbound — the negative-class
    # sampling threshold).
    labeled = df.select(
        F.col(id_col), F.col(text_col), label.cast("boolean").alias("_y")
    ).filter(F.col("_y").isNotNull())
    counts = {
        bool(r["_y"]): r["n"]
        for r in labeled.groupBy("_y").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if len(counts) < 2:
        raise ValueError("training needs non-NULL rows of BOTH classes")
    # Deterministic per-class downsample to <= max_rows_per_class.
    coord = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(16**8))
    )
    keep = F.when(
        F.col("_y"), coord < min(1.0, max_rows_per_class / counts[True])
    ).otherwise(coord < min(1.0, max_rows_per_class / counts[False]))
    sample = labeled.filter(keep)
    fc = _hashed_ngram_counts(
        sample, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    )
    # Labels come from the SAMPLE, not from the feature rows: a sampled
    # document with no features (empty/whitespace text) must still be a
    # design-matrix row — an all-zero row trains the bias and keeps the
    # class balance equal to the sampled counts (ADVICE r9; the old
    # inner join silently dropped such docs from n and the gradient).
    id_rows = sample.select(F.col(id_col).alias("_id"), "_y").collect()
    if not id_rows:
        raise ValueError("training sample is empty")
    ids = sorted({r["_id"] for r in id_rows})
    idx = {v: i for i, v in enumerate(ids)}
    X = np.zeros((len(ids), n_buckets), dtype=np.float64)
    y = np.zeros(len(ids), dtype=np.float64)
    for r in id_rows:
        y[idx[r["_id"]]] = 1.0 if r["_y"] else 0.0
    # No orderBy: the rows land in X by unique (doc, bucket) key and ids
    # are sorted locally above, so collection order cannot affect the
    # result — a pre-collect sort would only add a full shuffle.
    for r in fc.collect():
        X[idx[r["_id"]], r["_b"]] = r["_c"]
    totals = X.sum(axis=1, keepdims=True)
    X /= np.where(totals == 0, 1, totals)  # count-normalized features
    w = np.zeros(n_buckets, dtype=np.float64)
    b = 0.0
    n = len(ids)
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / n + l2 * w)
        b -= lr * float(g.mean())
    return np.concatenate([w, [b]])


def quality_classifier_scores(
    df: DataFrame,
    weights: np.ndarray,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    feature_counts: DataFrame | None = None,
) -> DataFrame:
    """P(quality) per document under trained ``weights`` — pure codegen
    + one broadcast join, no Python in the hot path. Documents with zero
    features (empty text) score ``sigmoid(bias)``.

    ``feature_counts`` (optional): a precomputed ``(_id, _b, _c)``
    hashed-ngram count table (the `_hashed_ngram_counts` shape, same
    ``n_buckets`` as the weights) — classifier scoring and DSIR share
    one feature space by design, so a session/snapshot can explode the
    corpus ONCE and fan both scorers out from the shared table.

    Returns (id_col, n_feats, quality_prob).
    """
    import pandas as pd

    w = np.asarray(weights, dtype=np.float64)
    n_buckets = len(w) - 1
    bias = float(w[-1])
    spark = df.sparkSession
    # pandas → Arrow local relation: a plain list here becomes a pickled
    # python RDD whose scan re-forks workers every execution.
    wdf = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame({"_b": range(n_buckets), "_w": w[:n_buckets]}),
            "_b long, _w double",
        )
    )
    fc = (
        feature_counts
        if feature_counts is not None
        else _hashed_ngram_counts(
            df, text_col=text_col, id_col=id_col, n_buckets=n_buckets
        )
    )
    from vrod_spark.operators.sampling import score_bucket_features

    # _w's count-weighted mean IS the pre-bias logit z; the shared
    # kernel lets a multi-scorer pipeline (q54) stack this model's
    # column with DSIR's and pay one feature-table pass for both.
    scored = score_bucket_features(fc, wdf, ["_w"]).select(
        "_id",
        "n_feats",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_w") + F.lit(bias)))))
        .alias("quality_prob"),
    )
    return (
        df.select(F.col(id_col))
        .join(scored, df[id_col] == scored["_id"], "left")
        .select(
            F.col(id_col),
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce(
                "quality_prob",
                F.lit(float(1.0 / (1.0 + np.exp(-bias)))),
            ).alias("quality_prob"),
        )
    )
