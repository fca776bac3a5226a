"""Byte-pair-encoding subword tokenization: bounded-sample training +
distributed Arrow-batched apply — the vocabulary-construction stage of
an LLM data pipeline (the reference's embedding pipeline tokenizes by
whitespace only, src/utils/embeddings.rs:22-27 ``extract_words``; BPE is
the [N] subword
path every modern tokenizer uses, per Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016).

Scale design (same shape as the PQ/IVF trainers):
- **training is bounded**: merges are learned on a deterministically
  hash-sampled document subset (``sample_docs`` max — the training
  signal is pair STATISTICS, which converge long before the corpus
  ends), driver-side over the unique-word frequency table with an
  incremental pair-count index (each merge touches only the words that
  contain the merged pair, not the whole vocabulary);
- **apply is embarrassingly parallel**: the learned merge ranks (a few
  KB) ship inside the UDF closure (a broadcast variable on a real
  cluster); each Arrow batch greedily merges per word with per-batch
  word memoization, so repeated words — the common case by Zipf — cost
  one merge loop each. No shuffle; tokenization happens where the text
  already sits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: End-of-word marker (standard BPE): lets a merge distinguish "er" at
#: word end from "er" mid-word, and makes detokenization exact.
END = "</w>"


def bpe_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 200,
    sample_docs: int = 4096,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges. Deterministic: the sample is
    the ``sample_docs`` documents with the smallest xxhash64(text) (a
    pure function of the data, independent of partitioning), and ties
    between equally-frequent pairs break lexicographically."""
    rows = (
        df.select(F.col(text_col).alias("t"))
        .where(F.col(text_col).isNotNull())
        .orderBy(F.xxhash64(F.col(text_col)), F.col(text_col))
        .limit(sample_docs)
        .collect()
    )
    word_freq: dict[str, int] = {}
    for r in rows:
        for w in r["t"].split():
            word_freq[w] = word_freq.get(w, 0) + 1
    # Unique-word working set: symbol sequences + frequency.
    words = [(list(w) + [END], f) for w, f in sorted(word_freq.items())]

    # Incremental pair index: counts + which words contain each pair.
    from collections import Counter

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, f) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # Max count, lexicographic tie-break — deterministic.
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        merged = best[0] + best[1]
        # Re-segment ONLY the words containing the merged pair.
        for wi in list(pair_words.get(best, ())):
            syms, f = words[wi]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                s = pair_words.get((a, b))
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del pair_words[(a, b)]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = (out, f)
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += f
                pair_words.setdefault((a, b), set()).add(wi)
    return merges


def bpe_tokens_udf(merges: list[tuple[str, str]], text_col) -> Column:
    """``array<string>`` BPE tokens for a text column — Arrow-batched
    pandas UDF; merge ranks captured in the closure; per-batch word
    memoization (Zipf makes repeats the common case)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    end = END

    @F.pandas_udf("array<string>")
    def tok(texts):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            got = memo.get(w)
            if got is not None:
                return got
            syms = list(w) + [end]
            while len(syms) > 1:
                best_rank, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            memo[w] = syms
            return syms

        out = []
        for t in texts:
            toks: list[str] = []
            if t:
                for w in t.split():
                    toks.extend(word_tokens(w))
            out.append(toks)
        return pd.Series(out)

    return tok(F.col(text_col) if isinstance(text_col, str) else text_col)


def bpe_detokenize_expr(tokens_col) -> Column:
    """Inverse of tokenization, as pure codegen expressions: concatenate
    tokens, turn each end marker back into a space, trim the trailing
    one. Exactness is the roundtrip contract the tests pin."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.rtrim(F.replace(F.concat_ws("", c), F.lit(END), F.lit(" ")))
