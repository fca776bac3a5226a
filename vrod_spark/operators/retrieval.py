"""BM25 full-text retrieval over a document corpus.

Okapi BM25 in its Lucene form:

    score(d, q) = sum_t idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))

— the standard first-stage ranker for corpus search / RAG retrieval
pipelines, and together with q50's n-gram decontamination the lexical
face of the LLM-data query surface (BASELINE.json north star; the
reference's SEARCH verb, `src/command/builder.rs:63-67`, is the
payload-filter ancestor of this).

Scale shape:
- The term filter is applied AT the token explode, so only postings of
  the query's terms ever shuffle — O(|q| * avg_df) rows, not O(corpus).
- Per-document length and the corpus aggregates (N, avgdl) ride one
  map-side agg each; (N, avgdl) and the per-term document frequencies
  are single-digit-row DataFrames, crossed/broadcast-joined in.
- The final top-k is orderBy().limit(k) — planned as
  TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vrod_spark.functions.text import tokens


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    score_decimals: int = 4,
    tokens_df: DataFrame | None = None,
) -> DataFrame:
    """Rank documents against ``query_terms`` by BM25.

    Returns (id, rank, n_matched, score): top ``top_k`` docs by
    (score DESC, id) — the id tiebreak plus ``score_decimals`` rounding
    keeps the cut deterministic across engines (per-term float
    contributions sum in engine-dependent order; at 4 decimals the
    ulp-level difference can't reorder the boundary).

    ``tokens_df``: optional pre-tokenized corpus ``(id_col, toks
    array<string>)`` — lowercased whitespace tokens with EVERY document
    present (empty docs as empty arrays: they count toward n_docs/avgdl).
    A snapshot-scoped tokenized table is how a production deployment
    amortizes the scan+split across retrieval queries.
    """
    # Corpus tokens are lowercased below — lowercase the query terms too
    # so a standalone caller passing "Hash Join" matches (ADVICE r8; the
    # engine path happens to lowercase first, direct callers may not).
    terms = sorted({t.lower() for t in query_terms})
    if tokens_df is not None:
        toked = tokens_df.select(F.col(id_col).alias("id"), "toks")
    else:
        toked = docs.select(
            F.col(id_col).alias("id"), tokens(F.lower(F.col(text_col))).alias("toks")
        )
    # Document length (ALL tokens) + corpus stats in one pass each.
    dl = toked.select("id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # Postings of query terms only: the filter rides the explode, so the
    # shuffle carries query-term hits, never the whole corpus.
    hits = (
        toked.select("id", F.explode("toks").alias("t"))
        .filter(F.col("t").isin(terms))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_per_term = hits.groupBy("t").agg(
        F.countDistinct("id").cast("double").alias("df")
    )
    idf = df_per_term.crossJoin(F.broadcast(stats)).select(
        "t",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
        "avgdl",
    )
    scored = (
        hits.join(F.broadcast(idf), "t")
        .join(dl, "id")
        .select(
            "id",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
        .groupBy("id")
        .agg(
            F.round(F.sum("contrib"), score_decimals).alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
        )
        .orderBy(F.col("score").desc(), "id")
        .limit(top_k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), "id")
    return scored.select(
        "id", F.row_number().over(w).alias("rank"), "n_matched", "score"
    )
