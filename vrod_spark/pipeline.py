"""The corpus→embeddings pipeline — the reference's one working dataflow
(process_embeddings, /root/reference/src/utils/embeddings.rs:6-20),
re-expressed as a Spark pipeline:

    read.text → tokenize (split/posexplode, order-preserving)
      → limit N  (applied BEFORE the embed stage, preserving the
                  reference's one optimization: take(n) ahead of the
                  expensive model call, embeddings.rs:25)
      → embed    (Arrow-batched pandas UDF — the model-inference boundary,
                  embeddings.rs:29-31)
      → stats + sink (parquet canonical; reference text format optional,
                  embeddings.rs:33-68)

The embedder is pluggable. The default is a deterministic hash-projection
"model" (no ML deps in this container): token → FNV-1a hash per dimension
→ unit-normalized vector. Swap in a real sentence-transformer by passing
any ``pd.Series -> pd.Series[list[float]]`` function — the Spark plumbing
(Arrow batching, schema, partitioning) is identical.

Between those rungs sits ``train_ppmi_svd_embedder``: a genuinely
TRAINED count-based model (PPMI co-occurrence + truncated SVD, Levy &
Goldberg 2014) that needs only numpy, so the "learned model through the
Arrow embed stage" path executes end-to-end in this container instead of
waiting for the env-gated fastembed/sentence-transformers rungs.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def deterministic_embedder(dim: int = 64) -> Callable[[pd.Series], pd.Series]:
    """Hash-projection embedder: deterministic, dependency-free, unit-norm."""

    def embed(words: pd.Series) -> pd.Series:
        import numpy as np

        mask = 0xFFFFFFFFFFFFFFFF

        def splitmix64(x: int) -> int:
            # Finalizer with full avalanche: without it, per-dimension FNV
            # variants of the same word differ only in low bits and every
            # normalized component collapses to ±1/sqrt(dim).
            x = (x + 0x9E3779B97F4A7C15) & mask
            x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
            x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
            return x ^ (x >> 31)

        out = []
        for w in words:
            h = 0xCBF29CE484222325
            for ch in (w or "").encode("utf-8"):
                h = ((h ^ ch) * 0x100000001B3) & mask
            seeds = np.array(
                [splitmix64(h ^ (i * 0x9E3779B97F4A7C15)) for i in range(dim)],
                dtype=np.uint64,
            )
            v = (seeds.astype(np.float64) / 2**64) * 2.0 - 1.0
            norm = np.linalg.norm(v)
            out.append((v / norm if norm else v).astype(np.float32).tolist())
        return pd.Series(out)

    return embed


def best_available_embedder(
    dim: int = 64, *, model_name: str = "BAAI/bge-small-en-v1.5"
) -> tuple[Callable[[pd.Series], pd.Series], int, str]:
    """Resolve the best embedder this environment can offer, with graceful
    fallback: real fastembed model (the reference's embedder,
    embeddings.rs:7,29-31) → sentence-transformers → the deterministic
    hash-projection stand-in. Returns ``(embedder, output_dim, backend)``
    so callers can pin schema width to whatever actually loaded. Zero
    hard dependencies: the ML imports are attempted lazily and any
    failure (missing package, missing model weights, no network) falls
    through to the next backend. The moment the env gains fastembed or
    sentence-transformers, every caller — and the auto-skip real-model
    pytest — picks up the real model with no code change."""
    try:
        from fastembed import TextEmbedding  # type: ignore

        model = TextEmbedding(model_name)

        def embed_fast(words: pd.Series) -> pd.Series:
            return pd.Series([list(map(float, v)) for v in model.embed(list(words))])

        # Probe the actual output width — a hardcoded 384 is only right
        # for bge-SMALL; model_name is a parameter (r11 review).
        out_dim = len(list(model.embed(["probe"]))[0])
        return embed_fast, out_dim, "fastembed"
    except Exception:
        pass
    try:
        from sentence_transformers import SentenceTransformer  # type: ignore

        st = SentenceTransformer(model_name)

        def embed_st(words: pd.Series) -> pd.Series:
            vecs = st.encode(list(words), normalize_embeddings=True)
            return pd.Series([list(map(float, v)) for v in vecs])

        return embed_st, int(st.get_sentence_embedding_dimension()), "sentence-transformers"
    except Exception:
        pass
    return deterministic_embedder(dim), dim, "deterministic"


def train_ppmi_svd_embedder(
    docs: DataFrame,
    text_col: str = "text",
    *,
    dim: int = 64,
    window: int = 2,
    min_count: int = 2,
    max_vocab: int = 3000,
) -> tuple[Callable[[pd.Series], pd.Series], int, str]:
    """A genuinely TRAINED word embedder with no ML dependencies: PPMI
    co-occurrence factorized by truncated SVD — the classic count-based
    method that Levy & Goldberg (NeurIPS 2014) showed is implicitly what
    skip-gram/SGNS factorizes. It exists so the §2.2 embed stage can
    execute a real learned model end-to-end in THIS container (the
    fastembed/sentence-transformers rungs of ``best_available_embedder``
    stay env-gated); the Spark plumbing is identical for all of them.

    Training is one distributed pass + a bounded driver step, the same
    shape as BPE merge training (operators/bpe.py):

    1. distributed: windowed co-occurrence pair counts (token array
       zip-shifts → explode → groupBy) restricted to the top
       ``max_vocab`` words — the only rows collected are the ≤ nnz
       co-occurrence entries of a BOUNDED vocabulary;
    2. driver: dense PPMI matrix (|V|² capped by max_vocab), numpy
       truncated SVD, embeddings = U_k·√S_k, rows unit-normalized.
       Column signs are fixed (largest-|component| positive) so the
       factorization is reproducible despite SVD sign indeterminacy.

    Returns ``(embedder, dim, "ppmi-svd")`` like best_available_embedder;
    out-of-vocabulary words fall back to the deterministic hash
    projection at the same dim, so the embedder is total."""
    import numpy as np

    from vrod_spark.functions.text import tokens

    toks = tokens(F.col(text_col))
    tok_rows = docs.select(F.explode(toks).alias("w")).groupBy("w").count()
    vocab_rows = (
        tok_rows.filter(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), "w")
        .limit(max_vocab)
        .collect()
    )
    vocab = sorted(r["w"] for r in vocab_rows)
    v_ix = {w: i for i, w in enumerate(vocab)}
    if len(vocab) < 2:
        return deterministic_embedder(dim), dim, "deterministic"

    shifts = []
    for off in range(1, window + 1):
        shifted = F.slice(toks, off + 1, F.greatest(F.size(toks) - off, F.lit(0)))
        shifts.append(
            F.zip_with(
                toks,
                shifted,
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        )
    # Vocabulary restriction as two InSet filters, not two broadcast
    # joins (r16 optimization, guide §3.1/§2.4): the vocab is a bounded
    # driver-side list (≤ max_vocab) already, so a 500-entry hash-set
    # membership test inside codegen replaces a createDataFrame + two
    # BroadcastExchange sub-jobs per training run. Same rows out — the
    # joins were single-key inner joins against a distinct key list,
    # i.e. exactly a membership filter (measured at sf0.1: pairs pass
    # 2.26 s → 0.74 s cold, identical (w1, w2, count) triples).
    pairs = (
        docs.select(F.explode(F.flatten(F.array(*shifts))).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .where(F.col("w1").isNotNull() & F.col("w2").isNotNull())
        .where(F.col("w1").isin(vocab) & F.col("w2").isin(vocab))
        .groupBy("w1", "w2")
        .count()
        .collect()
    )
    V = len(vocab)
    C = np.zeros((V, V), dtype=np.float64)
    for r in pairs:
        i, j = v_ix[r["w1"]], v_ix[r["w2"]]
        C[i, j] += r["count"]
        C[j, i] += r["count"]  # symmetric context
    total = C.sum()
    if total == 0:
        return deterministic_embedder(dim), dim, "deterministic"
    row = C.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log(C * total / (row @ row.T))
    ppmi = np.where(np.isfinite(pmi), np.maximum(pmi, 0.0), 0.0)
    u, s, _ = np.linalg.svd(ppmi, full_matrices=False)
    k = min(dim, V)
    emb = u[:, :k] * np.sqrt(s[:k])
    # sign convention: per column, the largest-|x| entry is positive
    flip = np.sign(emb[np.abs(emb).argmax(axis=0), np.arange(k)])
    emb = emb * np.where(flip == 0, 1.0, flip)
    if k < dim:  # pad tiny vocabularies up to the requested width
        emb = np.concatenate([emb, np.zeros((V, dim - k))], axis=1)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    emb = (emb / np.where(norms == 0, 1, norms)).astype(np.float32)
    table = {w: emb[i].tolist() for w, i in v_ix.items()}
    oov = deterministic_embedder(dim)

    def embed(words: pd.Series) -> pd.Series:
        import pandas as pd

        known = [table.get(w) for w in words]
        if any(v is None for v in known):
            fallback = oov(words)
            known = [
                v if v is not None else list(fallback.iloc[i])
                for i, v in enumerate(known)
            ]
        return pd.Series(known)

    return embed, dim, "ppmi-svd"


def embed_documents(
    docs: DataFrame,
    embedder: Callable[[pd.Series], pd.Series],
    *,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Document embeddings by MEAN POOLING word vectors — the standard
    bag-of-vectors sentence representation for count-based/word-level
    models (and the fallback pooling of transformer embedders). Appends
    ``out_col`` (ARRAY<FLOAT>, unit-normalized; empty docs → zero
    vector). One Arrow stage; the embedder is any word-level
    ``pd.Series[str] -> pd.Series[list[float]]`` (train_ppmi_svd_embedder,
    deterministic_embedder, or a real model), captured by value so it
    works from any session (no module pickling).

    Composes the §2.2 pipeline upward: train_ppmi_svd_embedder →
    embed_documents → cluster/semantic_dedup or knn — a full
    train-embed-curate path with zero external ML dependencies."""
    from pyspark.sql.functions import pandas_udf

    if dim is None:
        # Probe the embedder ONCE driver-side: inferring the zero-vector
        # width per Arrow batch left empty docs whose batch had no real
        # row with 0-length arrays — a mixed-width embedding column that
        # silently misscores every downstream cosine/knn (r11 review,
        # reproduced with a 2-doc corpus split across partitions).
        dim = len(list(embedder(pd.Series(["probe"])))[0])

    def _doc_fn(texts: pd.Series) -> pd.Series:
        import numpy as np
        import pandas as pd

        out = []
        for t in texts:
            words = (t or "").split()
            if not words:
                out.append(None)
                continue
            vecs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in embedder(pd.Series(words))]
            )
            m = vecs.mean(axis=0)
            n = np.linalg.norm(m)
            out.append((m / n if n else m).astype(np.float32).tolist())
        # None placeholders become the zero vector at a width inferred
        # from any real row (or `dim`).
        width = dim
        if width is None:
            for v in out:
                if v is not None:
                    width = len(v)
                    break
        zero = [0.0] * (width or 0)
        return pd.Series([v if v is not None else zero for v in out])

    return docs.withColumn(out_col, pandas_udf(_doc_fn, "array<float>")(F.col(text_col)))


def tokenize_corpus(spark: SparkSession, path: str, limit: int | None = None) -> DataFrame:
    """Stage 1+2: scan a text corpus, whitespace-tokenize order-preserving
    (posexplode keeps (line, position) so `limit` means "first N words of
    the corpus", exactly the reference's take(n) semantics)."""
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_id"), "value"
    )
    words = lines.select(
        "line_id",
        F.posexplode(F.filter(F.split("value", r"\s+"), lambda w: F.length(w) > 0)).alias(
            "pos", "word"
        ),
    ).orderBy("line_id", "pos")
    if limit is not None:
        words = words.limit(limit)
    return words.select(
        F.monotonically_increasing_id().alias("id"), F.col("word").alias("payload")
    )


def embed_corpus(
    spark: SparkSession,
    path: str,
    *,
    limit: int | None = None,
    dim: int = 64,
    embedder: Callable[[pd.Series], pd.Series] | None = None,
) -> DataFrame:
    """The full pipeline: returns (id, embedding ARRAY<FLOAT>, payload)."""
    embed_fn = embedder or deterministic_embedder(dim)
    embed_udf = F.pandas_udf(embed_fn, "array<float>")
    words = tokenize_corpus(spark, path, limit)
    return words.select(
        "id",
        embed_udf(F.col("payload")).alias("embedding"),
        "payload",
        F.lit(None).cast("map<string,string>").alias("meta"),
    )


def embedding_stats(df: DataFrame) -> dict:
    """Stage 4 introspection (print_embeddings_info parity,
    embeddings.rs:33-50): count, dimension, approximate in-memory MB."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size("embedding")).alias("dim"),
        F.sum(F.size("embedding")).alias("total_floats"),
    ).first()
    return {
        "count": row["n"],
        "dimension": row["dim"],
        "vector_mb": round((row["total_floats"] or 0) * 4 / 1e6, 3),
    }
