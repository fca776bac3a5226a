"""Deterministic sampling for reproducible training-data mixes.

``df.sample``/``sampleBy`` draw from a partition-seeded RNG: the selected
set changes under repartitioning, AQE re-planning, or retried tasks —
unacceptable when a 100 TB training mix must be re-creatable bit-for-bit
months later. These operators decide acceptance per ROW from a hash of a
stable key, so the same row is always in or out regardless of physical
execution, engine, or cluster shape (the q54 gate proves cross-engine
equality against DuckDB's md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hashed_ngram_feats(text_col: str) -> Column:
    """Unigram + bigram whitespace-token features of ``text_col`` — THE
    shared feature space of `dsir_scores` and
    `operators/classifier.py` (one definition, so the two data-selection
    scorers can never drift apart; q54's cross-engine pins re-derive it
    in SQL). Bigrams: tokens zipped with their right-shifted selves; a
    <2-token doc yields zero bigrams (no whole-doc fallback)."""
    from vrod_spark.functions.text import tokens

    toks = tokens(F.col(text_col))
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.when(b.isNotNull(), F.concat(a, F.lit(" "), b)),
        ),
        lambda s: s.isNotNull(),
    )
    return F.concat(toks, bigrams)


def ngram_bucket(feat: Column, n_buckets: int) -> Column:
    """md5-hash a feature string into ``n_buckets`` (cross-engine
    reproducible — same rationale as ``hash_fraction``)."""
    return (
        F.conv(F.substring(F.md5(feat), 1, 4), 16, 10).cast("long") % n_buckets
    )


def hash_fraction(key: Column | str) -> Column:
    """Uniform [0,1) value derived from md5(key) — the acceptance
    coordinate. First 8 hex chars → 32-bit int / 2^32; md5 is available
    in every engine, so samples are reproducible OUTSIDE Spark too."""
    col = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(2**32))


def deterministic_sample(
    df: DataFrame, key: str, fraction: float | dict[str, float],
    *, strata_col: str | None = None,
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by ``hash_fraction`` of
    the key column. With a dict + ``strata_col``, each stratum gets its
    own rate (the corpus-mixture shape: {"web": 0.8, "books": 0.5}).
    Unlisted strata default to rate 0.0 — an explicit mix, not a leak."""
    coord = hash_fraction(key)
    if isinstance(fraction, dict):
        if strata_col is None:
            raise ValueError("dict fractions require strata_col")
        rate = F.lit(0.0)
        for value, frac in sorted(fraction.items()):
            rate = F.when(F.col(strata_col) == value, float(frac)).otherwise(rate)
    else:
        rate = F.lit(float(fraction))
    return df.filter(coord < rate)


def stratified_split(
    df: DataFrame,
    key: str,
    splits: dict[str, float],
    *,
    out_col: str = "split",
) -> DataFrame:
    """Disjoint, exhaustive train/val/test assignment, decided per row
    from ``hash_fraction(key)`` against cumulative split boundaries —
    the evaluation-hygiene primitive: a document's split NEVER changes
    under repartitioning, retries, engine swaps, or re-runs months
    later, so eval contamination can't creep in through physical
    execution. Fractions must sum to 1 (±1e-9); split names are assigned
    in sorted-name order so the boundary layout itself is deterministic.
    Composes with ``deterministic_sample``: because both derive from the
    SAME md5 coordinate, a downsampled corpus keeps each row in its
    original split."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    coord = hash_fraction(key)
    cum = 0.0
    expr = None
    names = sorted(splits)
    for name in names[:-1]:
        cum += float(splits[name])
        cond = coord < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    label = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, label)


def temperature_mixture_rates(
    counts: dict[str, int], alpha: float = 0.3, *, target_fraction: float = 1.0
) -> dict[str, float]:
    """Temperature-scaled sampling rates (the multilingual/corpus
    balancing rule of T5 / XLM-R: sample stratum s with probability
    ∝ n_s^alpha): alpha=1 keeps natural proportions, alpha→0 approaches
    uniform-over-strata — the standard fix for head domains drowning the
    tail. Returns per-stratum ACCEPTANCE rates for
    ``deterministic_sample(..., fraction=rates, strata_col=...)``, scaled
    so the expected kept fraction of the whole corpus is
    ``target_fraction`` (rates are capped at 1 — a stratum can't be
    oversampled without replacement; the cap is re-normalized onto the
    remaining strata, largest-gap first, so the global budget holds
    whenever it is feasible). Driver-side arithmetic on a dict of
    stratum counts — the counts come from one groupBy().count()."""
    if not counts or target_fraction <= 0:
        return {k: 0.0 for k in counts}
    total = float(sum(counts.values()))
    budget = target_fraction * total
    weights = {k: float(n) ** alpha for k, n in counts.items() if n > 0}
    rates: dict[str, float] = {k: 0.0 for k in counts}
    live = dict(weights)
    while live:
        wsum = sum(live.values())
        overflow = []
        for k, w in live.items():
            want = budget * w / wsum  # rows asked of stratum k
            if want >= counts[k]:
                overflow.append(k)
        if not overflow:
            for k, w in live.items():
                rates[k] = (budget * w / wsum) / counts[k]
            break
        for k in overflow:  # saturated: keep everything, re-spread the rest
            rates[k] = 1.0
            budget -= counts[k]
            del live[k]
        if budget <= 0:
            break
    return rates


def score_bucket_features(
    feature_counts: DataFrame,
    bucket_values: DataFrame,
    value_cols: list[str],
    *,
    id_col: str = "_id",
) -> DataFrame:
    """ONE pass over a hashed-ngram count table ``(_id, _b, _c)``:
    broadcast-join a bounded per-bucket value table and return, per
    document, ``n_feats`` (Σc) plus the count-weighted mean of every
    column in ``value_cols`` (Σ c·v / Σ c).

    This is the shared scoring kernel of DSIR and the quality
    classifier — and the reason a pipeline scoring a corpus with BOTH
    (q54's shape) pays a single scan + single per-doc aggregation for
    any number of bucket models: stack the models' value columns into
    one ≤n_buckets-row table and pass all the names here. At 100 TB the
    feature table is the big side; scanning it once per MODEL instead
    of once total is the difference that matters."""
    joined = feature_counts.join(F.broadcast(bucket_values), "_b")
    aggs = [F.sum("_c").alias("n_feats")] + [
        (F.sum(F.col("_c") * F.col(c)) / F.sum("_c")).alias(c)
        for c in value_cols
    ]
    return joined.groupBy(F.col(id_col)).agg(*aggs)


def dsir_bucket_model(
    df: DataFrame,
    is_target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    feature_counts: DataFrame | None = None,
) -> DataFrame:
    """The bounded DSIR model: ``(_b, _lr)`` — per-bucket Laplace-
    smoothed log ratio of the target vs raw hashed-ngram distributions
    (see :func:`dsir_scores` for the estimator and provenance). Exactly
    ``n_buckets`` rows; broadcast it into
    :func:`score_bucket_features` (optionally stacked with other
    bucket models) to score documents."""
    if feature_counts is not None:
        fdf = feature_counts.select(
            F.col("_id").alias(id_col), "_b", "_c"
        ).join(df.select(F.col(id_col), is_target.alias("_t")), id_col)
    else:
        feats = hashed_ngram_feats(text_col)
        bucket = ngram_bucket(F.col("_f"), n_buckets)
        fdf = (
            df.select(
                F.col(id_col), is_target.alias("_t"), F.explode(feats).alias("_f")
            )
            .select(id_col, "_t", bucket.alias("_b"))
            .groupBy(id_col, "_t", "_b")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
    stats = fdf.groupBy("_b").agg(
        F.sum(F.when(F.col("_t"), F.col("_c")).otherwise(F.lit(0))).alias("_ct"),
        F.sum(F.when(~F.col("_t"), F.col("_c")).otherwise(F.lit(0))).alias("_cr"),
    )
    tot = stats.agg(
        F.sum("_ct").alias("_Tt"), F.sum("_cr").alias("_Tr")
    )
    return stats.crossJoin(F.broadcast(tot)).select(
        "_b",
        (
            F.log((F.col("_ct") + 1) / (F.col("_Tt") + F.lit(n_buckets)))
            - F.log((F.col("_cr") + 1) / (F.col("_Tr") + F.lit(n_buckets)))
        ).alias("_lr"),
    )


def dsir_scores(
    df: DataFrame,
    is_target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    feature_counts: DataFrame | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): score every
    document by how much more likely its hashed n-gram features are
    under the TARGET distribution than under the RAW distribution —
    the standard cheap proxy for "select pretraining data that looks
    like the high-quality target domain".

    Features are unigrams + bigrams of whitespace tokens, hashed into
    ``n_buckets`` via md5 (cross-engine reproducible — same reason as
    ``hash_fraction``); both bag-of-ngram models get Laplace +1
    smoothing. The returned score is the length-normalized log ratio

        score(d) = ( Σ_f c_d(f) · ln( p̂_t(f) / p̂_r(f) ) ) / Σ_f c_d(f)

    so long documents don't dominate. ``is_target`` marks the rows that
    DEFINE the target distribution (e.g. a trusted high-quality slice);
    raw = everything else. Selection = rank by score (importance
    resampling's deterministic top-k variant) — compose with
    ``deterministic_sample`` for the Gumbel-free sampled flavor.

    Scale shape: one explode → (id, bucket) count agg; bucket-model agg
    emits exactly ``n_buckets`` rows (bounded state, like the heavy-
    hitters sketch); stats re-join is a broadcast of those rows. Text
    leaves the scan only as 2-byte bucket ids + counts.

    ``feature_counts`` (optional): a precomputed ``(_id, _b, _c)``
    hashed-ngram count table (the classifier's `_hashed_ngram_counts`
    shape, same ``n_buckets``) — the target flag is joined back from
    ``df``, so a session can explode the corpus once and serve BOTH
    DSIR and classifier scoring from the shared table. A shared table
    may be BROADER than ``df`` (other splits, already-filtered docs);
    the result is still restricted to ``df``'s ids (r11 advice — the
    un-supplied path only ever scored df, and a silent widening would
    leak rows into downstream joins/ranks).

    Returns (id_col, n_feats, score).
    """
    if feature_counts is None:
        from vrod_spark.operators.classifier import _hashed_ngram_counts

        feature_counts = _hashed_ngram_counts(
            df, text_col=text_col, id_col=id_col, n_buckets=n_buckets
        )
    else:
        feature_counts = feature_counts.join(
            df.select(F.col(id_col).alias("_id")), "_id", "leftsemi"
        )
    model = dsir_bucket_model(
        df,
        is_target,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        feature_counts=feature_counts,
    )
    return score_bucket_features(feature_counts, model, ["_lr"]).select(
        F.col("_id").alias(id_col),
        "n_feats",
        F.col("_lr").alias("score"),
    )


def pack_sequences(
    df: DataFrame,
    *,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    group_col: str = "pack_group",
) -> DataFrame:
    """Assign every document to a fixed-token-budget training sequence:
    first-fit in ``id_col`` order WITHIN each pack group.

    Output columns: ``(group_col, id_col, n_tokens, seq_idx, offset)`` —
    ``seq_idx`` is the sequence number within the group, ``offset`` the
    document's start position inside that sequence. ``n_tokens`` is
    capped at ``budget`` (truncation is the packing contract here; the
    alternative — splitting one document across sequences — changes row
    identity and belongs to the tokenizer stage).

    Sequence packing is the corpus-assembly step between cleaning and
    training: LLM trainers consume fixed-length token streams, and
    packing short documents together (instead of padding each to the
    context length) is what keeps effective batch utilization high.

    Scale design: packing is inherently sequential WITHIN a sequence
    stream but embarrassingly parallel ACROSS streams — exactly how
    production pipelines shard. Each group packs independently
    (``applyInPandas``; one shuffle on the group key), carrying O(1)
    running-fill state; groups map 1:1 onto output shards, so
    parallelism = number of groups regardless of corpus size. The
    (group, id-order) contract makes the assignment a pure function of
    the data — independent of partitioning, AQE re-plans, and task
    retries — the same determinism property as ``deterministic_sample``.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    capped = df.select(
        F.col(group_col).cast("long").alias("grp"),
        F.col(id_col).cast("long").alias("id"),
        F.least(F.col(token_col).cast("long"), F.lit(budget)).alias("ntok"),
    )
    cap = budget

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        seqs, offs = [], []
        seq, fill = 0, 0
        for t in pdf["ntok"]:
            t = int(t)
            if fill + t > cap:
                seq += 1
                fill = 0
            offs.append(fill)
            seqs.append(seq)
            fill += t
        return pd.DataFrame(
            {
                "grp": pdf["grp"],
                "id": pdf["id"],
                "ntok": pdf["ntok"],
                "seq_idx": seqs,
                "offset": offs,
            }
        )

    out = capped.groupBy("grp").applyInPandas(
        pack, "grp long, id long, ntok long, seq_idx long, offset long"
    )
    return out.select(
        F.col("grp").alias(group_col),
        F.col("id").alias(id_col),
        F.col("ntok").alias("n_tokens"),
        "seq_idx",
        "offset",
    )


def chunk_documents(
    df: DataFrame,
    *,
    size: int = 64,
    stride: int = 48,
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking — the context-window prep step
    of a training/RAG pipeline (cleaned corpus -> fixed-size overlapping
    chunks). Chunk i covers tokens [i*stride, i*stride + size); starts
    run 0, stride, 2*stride, ... while start < n_tokens, so the final
    chunk may be short but no chunk is ever empty.

    Pure Catalyst: a step-``stride`` ``sequence`` of starts (its end
    bound is the largest multiple of stride <= n-1, closed-form — no
    interpreted higher-order ``filter``), ``posexplode``, then
    ``slice`` + ``concat_ws``. Tokenization is the q59-parity
    single-space split so any SQL engine derives identical chunks.
    Scale shape: per-row expression work only — chunking shuffles
    nothing; output rows ~ n_tokens/stride per doc.

    Appends (chunk_idx, start, chunk_tokens, chunk_text) to every input
    column except ``text_col``.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), " ")
    n = F.size(toks)
    last_start = (n - 1) - ((n - 1) % F.lit(stride))
    starts = F.when(n > 0, F.sequence(F.lit(0), last_start, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    keep = [c for c in df.columns if c != text_col]
    exploded = df.select(
        *keep,
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("start") + 1, size)
    return exploded.select(
        *keep,
        "chunk_idx",
        "start",
        F.size(chunk).alias("chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )
