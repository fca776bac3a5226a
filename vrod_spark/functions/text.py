"""Text-analysis functions for the LLM-data-pipeline surface.

Everything here is built-in Catalyst expressions (split / transform /
filter / aggregate / regexp) — no Python in the hot path, so these run
inside whole-stage codegen and scale linearly. The reference's only text
op is whitespace tokenization (extract_words,
/root/reference/src/utils/embeddings.rs:22-27); the rest is the
north-star pipeline surface (lang-ID, quality scoring, token counting,
fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vrod_spark.functions.memo import memo_column

# Tiny per-language stopword tables for the n-gram/stopword-hit lang-ID
# heuristic. Real deployments swap in bigger tables; the mechanism (token
# overlap scoring, argmax) is what matters and is fully vectorized.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "it", "that", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "una"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "que", "est", "dans"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}

#: BPE-ish tokenizer regex: word pieces, numbers, or single non-space
#: symbols — a deterministic stand-in for a trained BPE vocabulary.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


@memo_column
def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (embeddings.rs:24 parity), empties removed.

    Edge whitespace is stripped with a regex, NOT ``F.trim`` — trim
    removes only 0x20 spaces, so ``"hello\\n"`` would split (limit -1
    keeps trailing empties) into ``['hello', '']`` and every downstream
    count/shingle/quality signal would silently carry phantom empty
    tokens (r11 review). After the full strip, a ``\\s+`` split can
    yield an empty token only for the empty string — handled by the
    CASE — so no higher-order ``filter`` lambda (interpreted:
    HigherOrderFunction is CodegenFallback) is needed; everything stays
    scalar codegen. NULL propagates."""
    col = F.col(text) if isinstance(text, str) else text
    trimmed = F.regexp_replace(col, r"^\s+|\s+$", "")
    return (
        F.when(trimmed == "", F.array().cast("array<string>"))
        .otherwise(F.split(trimmed, r"\s+"))
    )


@memo_column
def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as strings ("w1 w2 w3"), the dedup unit.

    Built by zip_with-ing the token array against its own shifted copies
    (n-1 zips) — LINEAR in document length. The naive per-index
    slice+concat form is O(len·n) with an array copy per shingle and was
    the dominant cost of the whole dedup pipeline at bench scale.
    Documents shorter than n words produce their whole text as the only
    shingle (so no document silently drops out of dedup).
    """
    return shingles_from_tokens(tokens(text), n)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Shingles from an already-materialized token array column. Callers
    that also need the token array (or call several shingle-consumers)
    should project ``tokens(text)`` into a column once and use this —
    Catalyst does not common-subexpression-eliminate repeated higher-order
    tokenization, so the one-liner form re-tokenizes per reference."""
    size = F.size(toks)
    acc = toks
    for off in range(1, n):
        shifted = F.slice(toks, off + 1, F.greatest(size - off, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    # zip_with pads the shorter side with nulls → drop the null-concat tails
    full = F.filter(acc, lambda s: s.isNotNull())
    # NULL token array (NULL text) → NULL shingles, never [''] —
    # concat_ws flattens NULL to "" and every NULL doc would otherwise
    # fingerprint/fuse identically (r11 review; the NULL-fusion class).
    return (
        F.when(toks.isNull(), F.lit(None).cast("array<string>"))
        .when(size >= n, full)
        .otherwise(F.array(F.concat_ws(" ", toks)))
    )


@memo_column
def whitespace_token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


@memo_column
def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish regex tokens — the token-budget estimator.
    ``regexp_count`` counts matches without materializing the match array
    (~30% faster than size(regexp_extract_all) and less generated code)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE)).cast("bigint")


def let_once(col: Column, fn) -> Column:
    """Expression-level let-binding: evaluate ``col`` ONCE and feed the
    bound value to ``fn``.

    Catalyst does not common-subexpression-eliminate repeated higher-order
    expressions, and CollapseProject can inline a projected alias back into
    its consumers — so "project it once" is not a reliable way to share an
    expensive expression across N consumers. Wrapping the value in a
    single-element array and computing inside the ``transform`` lambda IS
    reliable: the lambda variable is bound once per row, every reference
    inside ``fn`` reads the bound value. This turned lang_id from 5 full
    tokenization passes per document into one (VERDICT r1 "What's wrong"
    #3)."""
    return F.get(F.transform(F.array(col), fn), 0)


def _hits_from(toks: Column, lang: str) -> Column:
    table = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(table, t))).cast("bigint")


@memo_column
def stopword_hits(text: Column | str, lang: str) -> Column:
    """How many tokens are stopwords of `lang` (array_intersect-free count,
    duplicates counted — a better signal than set overlap)."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    return _hits_from(toks, lang)


@memo_column
def lang_id(text: Column | str) -> Column:
    """Argmax-stopword-hits language ID with deterministic tie-break
    (lexicographically first language wins ties; 'und' when no hits).
    Tokenizes the document exactly once (let_once binding); the five
    per-language scores are cheap array filters over the bound tokens."""
    toks_lc = tokens(F.lower(F.col(text) if isinstance(text, str) else text))

    def score(toks: Column) -> Column:
        scored = F.array(
            *[
                F.struct(
                    (F.lit(0) - _hits_from(toks, lang)).alias("neg_hits"),
                    F.lit(lang).alias("lang"),
                )
                for lang in sorted(STOPWORDS)
            ]
        )
        # Struct sort is lexicographic: (neg_hits asc, lang asc) = most hits
        # first, ties → lexicographically first language. Deterministic.
        # NULL tokens (NULL text) stay NULL — 'und' means "document with
        # no stopword evidence", not "no document" (r11 review).
        first = F.array_sort(scored).getItem(0)
        return (
            F.when(toks.isNull(), F.lit(None).cast("string"))
            .when(first["neg_hits"] < 0, first["lang"])
            .otherwise(F.lit("und"))
        )

    return let_once(toks_lc, score)


@memo_column
def quality_score(text: Column | str) -> Column:
    """Deterministic document quality in [0,1]: blends length adequacy,
    alphabetic ratio, punctuation restraint, and mean word length sanity —
    the standard cheap pre-filter signals for LLM training corpora.
    Single tokenization pass (the SQL transform-lambda is the let_once
    binding); the two regexp scans are the only other full-text passes.

    Built as ONE parameterized SQL expression instead of a ~30-node
    Column chain when called with a column NAME (every hot caller): each
    PySpark Column operation is a py4j round-trip, and this builder was
    the largest driver-side build cost in the q29/q30/q52 bench numbers
    (~0.25 s per build; the expr form is ~0.08 s). Verified bit-identical
    to the Column form over the test corpus before the swap. Column
    inputs keep the Column form (no public Column→SQL API to splice
    them); ``_quality_from`` stays for callers holding a bound token
    array."""
    if not isinstance(text, str):
        return let_once(tokens(text), lambda toks: _quality_from(text, toks))
    # Backtick-quote the spliced name so columns with spaces/hyphens/
    # reserved words (or expression syntax) parse as the IDENTIFIER the
    # F.col path would have resolved, never as SQL.
    t = f"`{text.replace('`', '``')}`"
    return F.expr(
        f"""
        round(
          get(transform(array(CASE WHEN trim({t}) = '' THEN array()
                              ELSE split(trim({t}), '\\\\s+') END),
            toks ->
              0.35d * least(cast(size(toks) AS double) / 100.0d, 1.0d)
            + 0.35d * (cast(length(regexp_replace({t}, '[^A-Za-z]', '')) AS double)
                       / greatest(cast(length({t}) AS double), 1.0d))
            + 0.15d * (1 - least(cast(length(regexp_replace({t}, '[^.,;:!?]', '')) AS double)
                       / greatest(cast(length({t}) AS double), 1.0d) * 5, 1.0d))
            + 0.15d * (CASE WHEN cast(length({t}) AS double)
                                 / greatest(cast(size(toks) AS double), 1.0d)
                            BETWEEN 3 AND 12 THEN 1.0d ELSE 0.5d END)
          ), 0), 6)
        """
    )


def _quality_from(col: Column, toks: Column) -> Column:
    n_chars = F.length(col).cast("double")
    n_tokens = F.size(toks).cast("double")
    alpha_ratio = (
        F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("double")
        / F.greatest(n_chars, F.lit(1.0))
    )
    punct_ratio = (
        F.length(F.regexp_replace(col, r"[^.,;:!?]", "")).cast("double")
        / F.greatest(n_chars, F.lit(1.0))
    )
    mean_word_len = n_chars / F.greatest(n_tokens, F.lit(1.0))
    length_term = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    word_len_term = F.when((mean_word_len >= 3) & (mean_word_len <= 12), 1.0).otherwise(0.5)
    return F.round(
        F.lit(0.35) * length_term
        + F.lit(0.35) * alpha_ratio
        + F.lit(0.15) * (1 - F.least(punct_ratio * 5, F.lit(1.0)))
        + F.lit(0.15) * word_len_term,
        6,
    )


#: The stopword set of Gopher rule 8 (Rae et al. 2021, §A1.1): a document
#: must contain at least 2 DISTINCT of these to pass.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rule_mask(toks: Column, text: Column) -> Column:
    """Bitmask of FAILED Gopher quality rules (Rae et al. 2021, §A1.1 —
    the published filter battery behind the Gopher/Chinchilla corpora),
    the per-rule complement to the blended ``quality_score``:

      bit 1  — word count outside [50, 100000]
      bit 2  — mean word length outside [3, 10]
      bit 4  — symbol-to-word ratio ('#' or '…'/'...') above 0.1
      bit 8  — fewer than 80% of words contain an alphabetic character
      bit 16 — fewer than 2 distinct GOPHER_STOPWORDS present

    The line-level rules (bullet-start / ellipsis-end fractions) need a
    multi-line corpus and are intentionally out of scope for the
    single-line document fixtures — compose with a split('\\n') explode
    where they apply. Every threshold is evaluated in INTEGER arithmetic
    (e.g. mean-word-length ∈ [3,10] as ``3·wc ≤ Σlen ≤ 10·wc``), so the
    mask is bit-identical across engines — no float boundary can drift.
    Pure codegen; 0 = passes all rules."""
    wc = F.size(toks)
    # Σ token length == length of the ""-joined tokens: one scalar
    # codegen expression instead of an interpreted aggregate() fold
    # (HigherOrderFunction is CodegenFallback). NULL array → "" → 0,
    # matching the old coalesce(fold, 0).
    sum_len = F.length(F.concat_ws("", toks)).cast("long")
    n_sym = F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\.|…"), F.lit(0)))
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    n_stop = F.size(
        F.array_intersect(
            F.transform(toks, F.lower), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    )
    r1 = (wc < 50) | (wc > 100000)
    r2 = ~((F.lit(3) * wc <= sum_len) & (sum_len <= F.lit(10) * wc))
    r3 = F.lit(10) * n_sym > wc
    r4 = F.lit(5) * n_alpha < F.lit(4) * wc
    r5 = n_stop < 2
    mask = F.lit(0)
    for bit, rule in ((1, r1), (2, r2), (4, r3), (8, r4), (16, r5)):
        mask = mask + F.when(rule, F.lit(bit)).otherwise(F.lit(0))
    # NULL text → NULL mask, never 0: each rule condition evaluates to
    # NULL and would fall through every when() as "passes" — a curation
    # filter on mask == 0 would keep unknown content as battery-clean
    # (r11 review; same spurious-pass class c4_line_stats guards).
    return F.when(toks.isNull(), F.lit(None).cast("int")).otherwise(
        mask.cast("int")
    )


@memo_column
def gopher_rules(text: Column | str) -> Column:
    """``gopher_rule_mask`` over a single tokenization pass (let_once)."""
    col = F.col(text) if isinstance(text, str) else text
    return let_once(tokens(col), lambda toks: gopher_rule_mask(toks, col))


@memo_column
def blocklist_hit(text: Column | str, words: tuple[str, ...] | list[str]) -> Column:
    """TRUE when the document contains ANY blocklisted word (C4's
    "bad words" page-drop rule — the filter runs on lowercased
    whitespace tokens, so substrings inside clean words never match).
    The mechanism is the deliverable: real deployments broadcast the
    published multi-language list; pure codegen (arrays_overlap on one
    tokenization pass)."""
    col = F.col(text) if isinstance(text, str) else text
    wl = F.array(*[F.lit(w.lower()) for w in words])
    return let_once(
        tokens(col),
        lambda toks: F.arrays_overlap(F.transform(toks, F.lower), wl),
    )


def blocklist_filter(df, words: tuple[str, ...] | list[str], text_col: str = "text"):
    """Drop documents containing any blocklisted word; NULL text rows are
    kept (no evidence). One scan, no shuffle."""
    return df.filter(~F.coalesce(blocklist_hit(F.col(text_col), words), F.lit(False)))


@memo_column
def c4_line_stats(text: Column | str) -> Column:
    """C4 line-level cleaning rules (Raffel et al. 2020, §2.2 — the
    published heuristics behind the C4 corpus), as ONE codegen struct:

      line rules (a line is DROPPED unless it):
        - ends in a terminal punctuation mark (``. ! ?`` or a closing
          quote — the paper's "terminal punctuation" rule),
        - contains at least 5 words,
        - does not contain the word "javascript" (case-insensitive,
          word-bounded — boilerplate "please enable javascript" lines);
      page rules (``fail_mask`` bits; 0 = page survives):
        bit 1 — the page mentions "lorem ipsum" (template residue),
        bit 2 — the page contains a curly brace (code/markup residue),
        bit 4 — fewer than 3 sentences remain after line filtering
                (sentence = terminal ``.!?`` occurrence in the
                retained text).

    Returns ``struct(n_lines, n_kept, clean_text, fail_mask)`` so one
    scan yields both the cleaned page and the audit trail. The page-drop
    "bad words" rule is the separate pluggable ``blocklist_hit`` (same
    paper, same battery); the three-sentence-span dedup rule is the
    corpus-global `operators/dedup.duplicate_spans` axis. Everything
    here is split/filter/regexp codegen — lines never explode into rows,
    so a billion-page corpus pays one projection and zero shuffles.
    Complements `gopher_rule_mask`, whose line-level rules were declared
    out of scope for single-line fixtures (this closes that gap: feed it
    real multi-line pages)."""
    col = F.col(text) if isinstance(text, str) else text
    lines = F.split(col, "\n")

    # All three line rules fused into ONE regex over the trimmed line:
    # no "javascript" word anywhere (negative lookahead), at least five
    # whitespace-separated words (four space-terminated + a non-empty
    # tail — a trimmed line can't end in whitespace), terminal
    # punctuation last. One rlike node instead of three expression
    # sub-trees per line keeps the (interpreted) higher-order lambda and
    # the plan-compile cost small; the DuckDB oracle twin states the
    # three conditions separately (RE2 has no lookahead), making the q52
    # gate a true cross-engine differential of the fused form.
    def keep(line: Column) -> Column:
        return F.trim(line).rlike(
            '(?i)^(?!.*\\bjavascript\\b)(?:\\S+\\s+){4}.*[.!?"]$'
        )

    kept = F.filter(lines, keep)
    clean = F.array_join(kept, "\n")
    n_sentences = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), F.lit(0)))
    mask = F.when(
        col.isNull(), F.lit(None).cast("int")
    ).otherwise(
        # NULL input must not fall through the otherwise(0) branches into
        # a spurious "passes all rules" 0 — handled by the isNull guard.
        F.when(F.lower(col).contains("lorem ipsum"), 1).otherwise(0)
        + F.when(col.rlike("[{}]"), 2).otherwise(0)
        + F.when(n_sentences < 3, 4).otherwise(0)
    )
    def _size(arr: Column) -> Column:
        # size() of a NULL array is NULL with the modern default but -1
        # under spark.sql.legacy.sizeOfNull=true — pin the NULL-in →
        # NULL-out contract independent of session conf (a -1 would
        # silently poison sum() aggregates that NULL would skip).
        return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(
            F.size(arr).cast("long")
        )

    return F.struct(
        _size(lines).alias("n_lines"),
        _size(kept).alias("n_kept"),
        clean.alias("clean_text"),
        mask.cast("int").alias("fail_mask"),
    )


def c4_clean(df, text_col: str = "text"):
    """Apply the full C4 line+page battery: drop failing pages, REWRITE
    surviving pages to their retained lines only. NULL pages have no
    retainable content and are dropped (unlike ``blocklist_filter``,
    which keeps NULLs — a blocklist needs evidence to convict, a
    cleaning pass needs evidence to keep). One scan, no shuffle."""
    st = c4_line_stats(F.col(text_col))
    return (
        df.withColumn("_c4", st)
        .filter(F.col("_c4.fail_mask") == 0)
        .withColumn(text_col, F.col("_c4.clean_text"))
        .drop("_c4")
    )


@memo_column
def doc_fingerprint(text: Column | str, n: int = 3) -> Column:
    """Deterministic near-dup-stable fingerprint: the lexicographic min of
    the md5 digests of a document's shingles (1-permutation MinHash with
    md5 as the random order — winnowing-lite). Two docs sharing their
    minimal shingle collide; md5 keeps it oracle-comparable cross-engine.

    The token array is let-bound ONCE per row before the shingle
    zip_with chain: the chain references its input three times (acc +
    two slices), and an unbound ``tokens(text)`` tree is re-evaluated at
    every reference — measured 3x slower at bench scale (r12)."""
    return let_once(
        tokens(text),
        lambda toks: F.array_min(
            F.transform(shingles_from_tokens(toks, n), F.md5)
        ),
    )


def repetition_stats(toks: Column) -> Column:
    """STRUCT(n_shingles, n_distinct, rep_ratio) of 3-gram repetition
    within one document — the Gopher/C4-class quality signal: boilerplate
    and degenerate generations repeat n-grams, natural prose doesn't.
    Pure expressions over an already-projected token array."""
    sh = shingles_from_tokens(toks, 3)
    n = F.size(sh)
    nd = F.size(F.array_distinct(sh))
    return F.struct(
        n.cast("bigint").alias("n_shingles"),
        nd.cast("bigint").alias("n_distinct"),
        F.round(F.lit(1.0) - nd / F.greatest(n, F.lit(1)), 6).alias("rep_ratio"),
    )


#: PII patterns, ordered — redaction applies them in this sequence. Each
#: is valid and identical in Java regex (Spark codegen) and RE2 (DuckDB),
#: so redaction is oracle-comparable cross-engine. The digit-run pattern
#: goes LAST: earlier redactions can never create a 12+ digit run, and
#: emails/phones/IPs keep their shorter runs protected by their own tags.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{12,19}\b", "<NUM>"),
)


@memo_column
def redact_pii(text: Column | str) -> Column:
    """Replace emails, phone numbers, IPv4 addresses, and long digit runs
    (card/account numbers) with typed tags — the standard PII-scrubbing
    pass of a training-data pipeline. A chain of regexp_replace
    expressions: whole-stage codegen, one pass per pattern, no Python."""
    col = F.col(text) if isinstance(text, str) else text
    for pat, tag in PII_PATTERNS:
        col = F.regexp_replace(col, pat, tag)
    return col


@memo_column
def pii_counts(text: Column | str) -> Column:
    """STRUCT of per-type PII match counts (emails, phones, ips, longnums)
    for audit metrics — countable before AND after redaction (after must
    be zero)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.struct(
        *[
            F.regexp_count(col, F.lit(pat)).cast("bigint").alias(tag.strip("<>").lower())
            for pat, tag in PII_PATTERNS
        ]
    )


def winnow_fingerprints(
    text: Column | str, *, k: int = 5, window: int = 4, hash_fn=None
) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS rolling-hash scheme): hash every character ``k``-gram, then keep
    the MINIMUM hash of each sliding ``window`` of consecutive k-gram
    hashes, deduplicated. Guarantee: any substring match of length
    ≥ ``window + k - 1`` between two documents contributes at least one
    SHARED fingerprint — the local-sampling property plain min-hashing
    lacks. Density is ~2/(window+1) of all k-grams.

    Pure Catalyst expressions (sequence/transform/slice/array_min over
    xxhash64) — no Python, no shuffle; O(len·k) hashing + O(len·window)
    min-scans per document, embarrassingly row-parallel. (``xxhash64``
    replaces the classic Rabin-Karp incremental hash: Spark evaluates
    per-gram hashes in codegen, so recurrence buys nothing here while the
    selection semantics stay exactly winnowing's.)

    ``hash_fn`` swaps the k-gram hash (default ``xxhash64`` → BIGINT
    fingerprints, the fast path). The driver gate passes ``F.md5`` —
    string fingerprints DuckDB reproduces bit-for-bit, making the
    selection scheme oracle-checkable; the winnowing logic is the same
    code path for both."""
    col = F.col(text) if isinstance(text, str) else text
    hash_fn = hash_fn or F.xxhash64
    elem_type = "string" if hash_fn is F.md5 else "bigint"
    grams = F.transform(
        F.sequence(F.lit(1), F.length(col) - (k - 1)),
        lambda i: hash_fn(F.substring(col, i, k)),
    )
    winnowed = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(grams) - (window - 1), F.lit(1))),
            lambda j: F.array_min(F.slice(grams, j, window)),
        )
    )
    # Documents shorter than k have ZERO k-grams — guard explicitly:
    # sequence(1, 0) is DESCENDING [1, 0] in Spark (step defaults to -1
    # when start > stop), which would fabricate fingerprints from
    # out-of-range substrings and make all short/empty docs collide.
    return F.when(F.length(col) >= k, winnowed).otherwise(
        F.array().cast(f"array<{elem_type}>")
    )


def winnow_fingerprints_relational(
    df,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    carry: tuple[str, ...] = (),
):
    """Winnowing as a RELATIONAL pipeline — the same window-min selection
    as :func:`winnow_fingerprints`, but staged as explode → window-min →
    distinct so every step stays inside whole-stage codegen / the
    window operator. The array form's higher-order expressions are
    CodegenFallback (interpreted, measured ~60 µs per gram — 100× the
    codegen path) and, being a projection, get pushed below repartitions
    onto a single-file scan task; this form is the one to use when the
    gram volume matters. md5 gram hashes (strings) keep the output
    oracle-comparable cross-engine.

    Returns one row per (document, distinct fingerprint):
    ``id_col, *carry, n_grams, fp`` (``n_grams`` = k-gram count of the
    document, constant per doc — the winnowing-density denominator).
    Shuffle cost: one exchange of (doc, md5) gram rows for the
    per-document window — O(chars sampled), map-side nothing to combine;
    callers bound the input (sampling / length caps) when winnowing a
    whole corpus is not the goal.
    """
    from pyspark.sql import Window

    t = F.col(text_col)
    grams = (
        df.filter(F.length(t) >= k)
        .select(
            id_col,
            *carry,
            (F.length(t) - (k - 1)).alias("_n"),
            F.explode(F.sequence(F.lit(1), F.length(t) - (k - 1))).alias("_i"),
            t.alias("_t"),
        )
        .select(
            id_col,
            *carry,
            "_n",
            "_i",
            F.md5(F.expr(f"substring(_t, _i, {k})")).alias("_g"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("_i").rowsBetween(0, window - 1)
    return (
        grams.withColumn("_wmin", F.min("_g").over(w))
        # winnowing takes windows starting at 1..max(n-(w-1), 1); the
        # final w-1 positions are partial windows the scheme skips
        # (except when the doc has fewer grams than one full window).
        .filter(F.col("_i") <= F.greatest(F.col("_n") - (window - 1), F.lit(1)))
        .select(
            id_col,
            *carry,
            F.col("_n").cast("bigint").alias("n_grams"),
            F.col("_wmin").alias("fp"),
        )
        .distinct()
    )


def ngram_lm_train_counts(
    df,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    train_pred: str | None = None,
    n: int = 3,
):
    """The training-slice gram counts ``(_lang, _g, _c)`` that define an
    :func:`ngram_lm_perplexity` model — factored out so a session can
    materialize them ONCE and score many times (pass the result as
    ``counts=``). One definition of the training pipeline; the scoring
    path cannot drift from it."""
    pred = (
        F.expr(train_pred)
        if train_pred is not None
        else (F.col(id_col) % 10) < 3
    )
    t = F.lower(F.trim(F.col(text_col)))
    base = df.filter(pred & (F.length(t) >= n)).select(
        F.col(lang_col).alias("_lang"), t.alias("_t")
    )
    grams = base.select(
        "_lang",
        F.explode(F.sequence(F.lit(1), F.length("_t") - (n - 1))).alias("_i"),
        F.col("_t"),
    ).select("_lang", F.expr(f"substring(_t, _i, {n})").alias("_g"))
    return grams.groupBy("_lang", "_g").agg(F.count(F.lit(1)).alias("_c"))


def ngram_lm_perplexity(
    df,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    train_pred: str | None = None,
    n: int = 3,
    oov_mass: float = 0.5,
    counts=None,
):
    """Character n-gram language-model quality scoring (the CCNet /
    perplexity-filtering signal: Wenzek et al., "CCNet", LREC 2020 —
    there a KenLM; here the same shape as a declarative plan): per
    language, gram frequencies of a deterministic TRAINING slice define
    ``logp(g) = ln(count / total)``; each document scores the mean
    negative log-likelihood of its own gram occurrences under its
    language's model, with the deterministic OOV floor
    ``ln(oov_mass / total)``. High score = surprising text (noise,
    boilerplate, wrong-language) — the standard filter axis beside
    heuristic quality_score.

    Returns ``(id_col, ppx)`` for every doc with ≥ 1 gram whose language
    has training data. FULLY DECLARATIVE — no driver-side model, no UDF:
    the model is a groupBy aggregation (map-side combined), the scoring
    join BROADCASTS it (vocabulary is charset^n-bounded per language, a
    few MB at worst), so the gram stream is never shuffled — at 100 TB
    the only exchange is the per-document aggregation.

    ``counts`` (optional): a precomputed ``(_lang, _g, _c)`` training
    table — :func:`ngram_lm_train_counts` output, e.g. a
    session-materialized snapshot — so repeated scoring builds skip the
    training gram pass entirely (the compute-once-per-snapshot shape the
    winnowing/span legs already use). ``train_pred``/``n`` are then the
    parameters it was BUILT with.
    """
    from pyspark.sql import DataFrame  # noqa: F401

    t = F.lower(F.trim(F.col(text_col)))
    base = df.filter(F.length(t) >= n).select(
        F.col(id_col).alias("_id"),
        F.col(lang_col).alias("_lang"),
        t.alias("_t"),
    )
    grams = base.select(
        "_id",
        "_lang",
        F.explode(F.sequence(F.lit(1), F.length("_t") - (n - 1))).alias("_i"),
        F.col("_t"),
    ).select("_id", "_lang", F.expr(f"substring(_t, _i, {n})").alias("_g"))
    if counts is None:
        # Materialize the training counts ONCE (eager): the model and the
        # totals are two broadcast subtrees and the scoring pass joins
        # both — without this seam each broadcast job re-runs the full
        # gram explode (measured: the composed per-doc join form cost ~4
        # gram passes, 4.1 s vs 0.7 s for one pass at sf0.1). The table
        # is vocab-bounded (per-language charset^n), not corpus-bounded,
        # so the checkpoint is small at any SF; values are unchanged —
        # the same aggregation, read twice instead of recomputed four
        # times. The default training slice keys on the CALLER's id
        # column — a hardcoded "doc_id % 10 < 3" default failed
        # resolution (or silently keyed on a stale doc_id column)
        # whenever id_col was renamed (r11 review).
        counts = ngram_lm_train_counts(
            df,
            text_col=text_col,
            lang_col=lang_col,
            id_col=id_col,
            train_pred=train_pred,
            n=n,
        ).localCheckpoint(eager=True)
    totals = counts.groupBy("_lang").agg(F.sum("_c").alias("_tot"))
    model = counts.join(totals, "_lang").select(
        "_lang", "_g", F.log(F.col("_c") / F.col("_tot")).alias("_logp")
    )
    scored = (
        grams.join(F.broadcast(model), ["_lang", "_g"], "left")
        .join(F.broadcast(totals), "_lang")  # inner: langs with a model
        .groupBy("_id")
        .agg(
            (
                -F.avg(
                    F.coalesce(
                        F.col("_logp"),
                        F.log(F.lit(float(oov_mass)) / F.col("_tot")),
                    )
                )
            ).alias("ppx")
        )
    )
    return scored.select(F.col("_id").alias(id_col), "ppx")


def normalize_text_udf(text_col) -> Column:
    """Unicode cleanup for corpus ingestion — NFC normalization (stdlib
    ``unicodedata``), control-character stripping (C0/C1 minus
    tab/newline), and whitespace collapsing — as one Arrow-batched
    pandas UDF. The canonical first stage of a cleaning pipeline: text
    that differs only by combining-character representation ("é" vs
    "e\\u0301") must dedup/fingerprint identically, and stray control
    bytes poison tokenizers downstream. Python is unavoidable here
    (Spark has no built-in NFC); Arrow batching + the stdlib C
    implementation keep it at memory bandwidth. Per-batch memoization is
    deliberately omitted — full texts rarely repeat (that is what the
    dedup stage is for)."""
    import re as _re

    ctrl = _re.compile(r"[\x00-\x08\x0b-\x1f\x7f-\x9f]")
    ws = _re.compile(r"\s+")

    @F.pandas_udf("string")
    def norm(texts):
        import unicodedata

        import pandas as pd

        def one(t):
            if t is None:
                return None
            t = unicodedata.normalize("NFC", t)
            t = ctrl.sub("", t)
            return ws.sub(" ", t).strip()

        return pd.Series([one(t) for t in texts])

    return norm(F.col(text_col) if isinstance(text_col, str) else text_col)
