"""Operator-level tests: as-of join semantics, approximate-agg bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vrod_spark.operators.asof import asof_join
from vrod_spark.queries import QUERIES


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        "key int, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 990.0)],
        "key int, t long, v double",
    )
    out = asof_join(
        left, right, on="key", left_ts="t", right_ts="t", right_cols=["v"], tiebreak="v"
    )
    got = {r["name"]: r["asof_v"] for r in out.collect()}
    # 'a' at t=10: right t=10 matches inclusively; 'b' at t=20 → t=15 row;
    # 'c' at t=5 → nothing before it; 'd' key=2 t=10 → right is at t=99 (future).
    assert got == {"a": 100.0, "b": 150.0, "c": None, "d": None}


def test_asof_join_tiebreak_deterministic(spark):
    left = spark.createDataFrame([(1, 10, "x")], "key int, t long, name string")
    right = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 3), (1, 10, 2)], "key int, t long, rid int"
    )
    out = asof_join(
        left, right, on="key", left_ts="t", right_ts="t", right_cols=["rid"], tiebreak="rid"
    )
    assert out.first()["asof_rid"] == 3  # max tiebreak wins, always


def test_approx_count_distinct_within_bounds(spark, sf_dir):
    rows = QUERIES["q26b_prob_near_dup"](spark, sf_dir).collect()
    hll = [r for r in rows if r["method"] == "hll_distinct"]
    assert hll
    for r in hll:
        approx, exact = r["a"], r["b"]
        assert abs(approx - exact) / exact < 0.1, f"HLL off by >10%: {approx} vs {exact}"


def test_salted_join_equals_plain_join(spark, sf_dir):
    from vrod_spark.operators.skew import salted_join
    from vrod_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = events.join(cust, "user_id").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("v")
    )
    salted = salted_join(events, cust, "user_id", factor=8).groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("v")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    from vrod_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "orphan")], "k int, lv string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k int, rv string")
    out = salted_join(left, right, "k", factor=4, how="left")
    got = {(r["k"], r["rv"]) for r in out.collect()}
    assert got == {(1, "x"), (2, "y"), (99, None)}


def test_deterministic_sample_is_stable_and_proportional(spark):
    """The same rows are selected regardless of partitioning, and per-
    stratum proportions land near their configured rates."""
    from vrod_spark.operators.sampling import deterministic_sample

    df = spark.range(0, 4000).withColumn(
        "src", F.when(F.col("id") % 2 == 0, "web").otherwise("books")
    )
    picked1 = {r["id"] for r in deterministic_sample(df, "id", 0.3).collect()}
    picked2 = {
        r["id"]
        for r in deterministic_sample(df.repartition(17), "id", 0.3).collect()
    }
    assert picked1 == picked2  # physical layout cannot change the sample
    assert 0.25 < len(picked1) / 4000 < 0.35

    mixed = deterministic_sample(
        df, "id", {"web": 0.8, "books": 0.2}, strata_col="src"
    )
    by_src = {
        r["src"]: r["n"]
        for r in mixed.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert 0.74 < by_src["web"] / 2000 < 0.86
    assert 0.15 < by_src["books"] / 2000 < 0.25


def test_pack_sequences_first_fit_invariants(spark):
    """pack_sequences == the reference first-fit fold on every group, and
    the assignment is invariant under physical repartitioning. Edge
    cases: zero-token docs, docs longer than the budget (capped, own
    sequence start), exact-fill boundaries."""
    import random

    from vrod_spark.operators.sampling import pack_sequences

    rng = random.Random(7)
    rows = [(i, i % 3, rng.choice([0, 1, 5, 17, 63, 64, 100, 200])) for i in range(300)]
    rows += [(1000, 0, 500), (1001, 0, 3), (1002, 1, 64)]  # long doc + tail
    df = spark.createDataFrame(rows, "doc_id long, pack_group long, n_tokens long")

    budget = 64
    got = {
        r["doc_id"]: (r["pack_group"], r["n_tokens"], r["seq_idx"], r["offset"])
        for r in pack_sequences(df, budget=budget).collect()
    }
    # Reference fold.
    want = {}
    by_grp: dict = {}
    for i, g, t in sorted(rows):
        by_grp.setdefault(g, []).append((i, min(t, budget)))
    for g, docs in by_grp.items():
        seq, fill = 0, 0
        for i, t in docs:
            if fill + t > budget:
                seq, fill = seq + 1, 0
            want[i] = (g, t, seq, fill)
            fill += t
    assert got == want

    # Physical layout cannot change the packing.
    got2 = {
        r["doc_id"]: (r["pack_group"], r["n_tokens"], r["seq_idx"], r["offset"])
        for r in pack_sequences(df.repartition(13), budget=budget).collect()
    }
    assert got2 == got

    # Every sequence respects the budget.
    fills: dict = {}
    for _, (g, t, s, o) in got.items():
        key = (g, s)
        fills[key] = max(fills.get(key, 0), o + t)
        assert o + t <= budget
    # First-fit leaves no sequence empty.
    for g, s in fills:
        assert fills[(g, s)] > 0 or s == 0


def test_heavy_hitters_matches_exact_counts(spark, sf_dir):
    """Sketch-then-verify heavy hitters: every token whose exact frequency
    meets the support threshold appears, with EXACT counts (the sketch
    bounds state, never the answer)."""
    from vrod_spark.functions.text import tokens
    from vrod_spark.operators.sketch import heavy_hitters
    from vrod_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.lower("text"))).alias("token"))
    total = toks.count()
    support = 0.02

    got = {r["item"]: r["n"] for r in heavy_hitters(toks, "token", support=support).collect()}
    exact = {
        r["token"]: r["n"]
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["n"] >= int(support * total)
    }
    assert got == exact  # no false negatives, and counts are exact


def test_heavy_hitters_rejects_bad_support(spark):
    from vrod_spark.operators.sketch import heavy_hitters

    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError):
        heavy_hitters(df, "x", support=0.0)


def test_percentile_profile_strategies_agree(spark, sf_dir):
    """gather (Arrow per-group) and distributed (count-map + Expand) are the
    same exact profile — the q22 gate may use either."""
    from vrod_spark.operators.percentiles import group_percentile_profile
    from vrod_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    spec = {
        "l_extendedprice": [("median_price", 0.5), ("p90_price", 0.9)],
        "l_quantity": [("p25_qty", 0.25)],
    }
    nd = {"l_partkey": "nd_parts", "l_suppkey": "nd_supps"}
    out = {}
    for strategy in ("gather", "distributed"):
        rows = group_percentile_profile(
            li, "l_returnflag", spec, nd, strategy=strategy
        ).orderBy("l_returnflag").collect()
        out[strategy] = [
            tuple(r[c] for c in
                  ("l_returnflag", "nd_parts", "nd_supps",
                   "median_price", "p90_price", "p25_qty"))
            for r in rows
        ]
    assert out["gather"] == out["distributed"]
    assert len(out["gather"]) == 3  # A, N, R


def test_stratified_split_disjoint_exhaustive_stable(spark, sf_dir):
    """stratified_split: every row gets exactly one label, fractions
    land near target, assignment is identical under repartitioning (the
    determinism contract df.sample cannot give), and composing with
    deterministic_sample keeps each surviving row's original split."""
    import pytest as _pytest

    from vrod_spark.operators.sampling import deterministic_sample, stratified_split
    from vrod_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = stratified_split(docs, "doc_id", splits)
    n = docs.count()
    counts = {r["split"]: r["c"] for r in got.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert sum(counts.values()) == n  # exhaustive, disjoint
    assert counts["train"] > counts.get("val", 0) and counts["train"] > counts.get("test", 0)
    # stable under physical execution changes
    a = {r["doc_id"]: r["split"] for r in got.select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in stratified_split(docs.repartition(13), "doc_id", splits)
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    # downsampling preserves split membership (same md5 coordinate)
    kept = deterministic_sample(docs, "doc_id", 0.5)
    for r in stratified_split(kept, "doc_id", splits).select("doc_id", "split").collect():
        assert a[r["doc_id"]] == r["split"]
    with _pytest.raises(ValueError, match="sum to 1"):
        stratified_split(docs, "doc_id", {"train": 0.5, "val": 0.1})


def test_dsir_scores_discriminate_and_are_stable(spark):
    """DSIR importance weights (sampling.dsir_scores): docs drawn from the
    target vocabulary must outscore docs from a disjoint raw vocabulary;
    scores are partition-count independent; a mixed doc lands between the
    two cohorts; 1-token docs contribute zero bigrams (no crash)."""
    from vrod_spark.operators.sampling import dsir_scores

    tgt_vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    raw_vocab = ["zeta", "eta", "theta", "iota", "kappa"]

    def sent(vocab, i, n=30):
        return " ".join(vocab[(i * 7 + j) % len(vocab)] for j in range(n))

    rows = []
    for i in range(10):
        rows.append((i, sent(tgt_vocab, i), True))          # target cohort
    for i in range(10, 20):
        rows.append((i, sent(raw_vocab, i), False))         # raw cohort
    rows.append((20, sent(tgt_vocab, 3), False))            # target-LIKE raw doc
    rows.append((21, sent(tgt_vocab, 1, 15) + " " + sent(raw_vocab, 2, 15), False))
    rows.append((22, "solo", False))                        # 1 token, 0 bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")

    got = {
        r["doc_id"]: (r["n_feats"], r["score"])
        for r in dsir_scores(df, F.col("is_t"), id_col="doc_id").collect()
    }
    assert got[22][0] == 1  # unigram only — the bigram edge case
    tgt_scores = [got[i][1] for i in range(10)]
    raw_scores = [got[i][1] for i in range(10, 20)]
    assert min(tgt_scores) > max(raw_scores)
    assert got[20][1] > max(raw_scores)          # looks like target → high
    assert max(raw_scores) < got[21][1] < min(tgt_scores)  # mixed → between

    # physical-layout independence: same scores from 1 and 13 partitions
    got13 = {
        r["doc_id"]: r["score"]
        for r in dsir_scores(
            df.repartition(13), F.col("is_t"), id_col="doc_id"
        ).collect()
    }
    for k, (_, s) in got.items():
        assert abs(got13[k] - s) < 1e-12


def test_gopher_rule_mask_bits(spark):
    """Each Gopher rule bit fires on a doc crafted to fail exactly that
    rule (plus a passing doc == 0). Thresholds are integer-exact, so
    boundary docs are deterministic: 50 words passes rule 1, 49 fails."""
    from vrod_spark.functions.text import gopher_rules

    stops = "the be to of and that have with"  # 8 distinct stopwords
    good_fill = " ".join(f"word{i:03d}" for i in range(42))  # len-7 words
    passing = f"{stops} {good_fill}"  # 50 words, alpha, sane lengths
    docs = [
        (0, passing, 0),
        # 49 words -> rule 1 (bit 1) only
        (1, f"{stops} " + " ".join(f"word{i:03d}" for i in range(41)), 1),
        # mean word length > 10 -> bit 2
        (2, f"{stops} " + " ".join("x" * 60 for _ in range(42)), 2),
        # 6+ '#' symbols over 50 words -> bit 4 (10*6 > 50); fillers stay
        # long enough that the mean-word-length rule keeps passing
        (3, f"{stops} # # # # # # " + " ".join(f"word{i:04d}" for i in range(36)), 4),
        # >20% non-alpha words -> bit 8 (11 numeric of 50)
        (4, f"{stops} " + " ".join("123" for _ in range(11))
            + " " + " ".join(f"word{i:02d}" for i in range(31)), 8),
        # only 1 distinct stopword -> bit 16
        (5, "the " + " ".join(f"word{i:03d}" for i in range(49)), 16),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in docs], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["m"]
        for r in df.select("doc_id", gopher_rules("text").alias("m")).collect()
    }
    for i, _, want in docs:
        assert got[i] == want, f"doc {i}: mask {got[i]} != {want}"


def test_c4_line_and_page_rules(spark):
    """Every C4 rule fires on a line/page crafted to fail exactly that
    rule; the cleaned text keeps ONLY surviving lines in order, and
    c4_clean rewrites the text column while dropping failing (and NULL)
    pages."""
    from vrod_spark.functions.text import c4_clean, c4_line_stats

    k1 = "This planted sentence has enough words to survive the filter."
    k2 = "Another planted sentence also has enough words to survive here."
    k3 = "A third planted sentence closes out the surviving page."
    pages = [
        # doc 0: 3 keepers + one of each line-rule violation -> page kept,
        # clean text = the three keepers only
        (0, f"{k1}\nToo short.\nno terminal punctuation on this long line here\n"
            f"Please enable JavaScript to view this page properly.\n{k2}\n{k3}"),
        # doc 1: lorem ipsum -> page bit 1
        (1, f"{k1}\n{k2}\n{k3}\nSome lorem ipsum filler text pads this page."),
        # doc 2: curly brace -> page bit 2
        (2, f"{k1}\n{k2}\n{k3}\nfunction f() {{ return 1; }}"),
        # doc 3: only 2 surviving sentences -> page bit 4
        (3, f"{k1}\n{k2}"),
        # doc 4: NULL page
        (4, None),
        # doc 5: closing-quote terminal punctuation counts as terminal
        (5, f'{k1}\n{k2}\n"Quoted speech still ends with a terminal mark."'),
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", c4_line_stats("text").alias("s")
        ).collect()
    }
    assert got[0]["fail_mask"] == 0
    assert got[0]["n_lines"] == 6 and got[0]["n_kept"] == 3
    assert got[0]["clean_text"] == f"{k1}\n{k2}\n{k3}"
    assert got[1]["fail_mask"] & 1
    assert got[2]["fail_mask"] & 2
    assert got[3]["fail_mask"] == 4 and got[3]["n_kept"] == 2
    assert got[4] is None or got[4]["fail_mask"] is None
    # the quoted line survives (ends with ." -> terminal), giving 3
    # sentences; page passes
    assert got[5]["fail_mask"] == 0 and got[5]["n_kept"] == 3

    cleaned = {r["doc_id"]: r["text"] for r in c4_clean(df).collect()}
    assert set(cleaned) == {0, 5}
    assert cleaned[0] == f"{k1}\n{k2}\n{k3}"


def test_dedup_lines_corpus_global(spark):
    """CCNet line dedup: the boilerplate line survives only at its first
    (id, pos) occurrence; normalization fuses digit/case variants; blank
    lines are exempt everywhere; NULL pages pass through; a fully-deduped
    page becomes ''. Partitioning never changes the outcome."""
    from vrod_spark.operators.dedup import dedup_lines

    docs = [
        (1, "Unique opening line one.\nCopyright 2019 Example Corp.\n\nBody one."),
        # same boilerplate, different year + case -> normalizes equal
        (2, "Unique opening line two.\ncopyright 2024 example corp.\n\nBody two."),
        (3, "Copyright 1999 EXAMPLE Corp."),  # fully deduped page
        (4, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert got[1]["text"] == docs[0][1] and got[1]["n_cut_lines"] == 0
    assert got[2]["text"] == "Unique opening line two.\n\nBody two."
    assert got[2]["n_cut_lines"] == 1
    assert got[3]["text"] == "" and got[3]["n_cut_lines"] == 1
    assert got[4]["text"] is None and got[4]["n_cut_lines"] == 0

    got13 = {r["doc_id"]: r for r in dedup_lines(df.repartition(13)).collect()}
    for k in got:
        assert got13[k]["text"] == got[k]["text"]
        assert got13[k]["n_cut_lines"] == got[k]["n_cut_lines"]


def test_temperature_mixture_rates(spark):
    """alpha=1 → natural proportions (all rates equal); alpha→0 →
    uniform-over-strata row budgets; saturated strata cap at 1.0 with the
    budget re-spread; composes with deterministic_sample to hit the
    expected global fraction."""
    from vrod_spark.operators.sampling import (
        deterministic_sample,
        temperature_mixture_rates,
    )

    counts = {"web": 8000, "books": 1500, "code": 500}

    r1 = temperature_mixture_rates(counts, alpha=1.0, target_fraction=0.5)
    assert all(abs(v - 0.5) < 1e-12 for v in r1.values())

    r0 = temperature_mixture_rates(counts, alpha=0.0, target_fraction=0.3)
    # equal ROW budgets (1000 each), but code has only 500 rows → it
    # saturates at rate 1.0 and the remaining 2500 re-spread evenly
    kept = {k: r0[k] * counts[k] for k in counts}
    assert r0["code"] == 1.0
    assert abs(kept["web"] - 1250) < 1e-9 and abs(kept["books"] - 1250) < 1e-9
    assert abs(sum(kept.values()) - 3000) < 1e-9

    # small target with extreme flattening saturates the tail stratum
    rs = temperature_mixture_rates(
        {"web": 100000, "tail": 30}, alpha=0.0, target_fraction=0.01
    )
    assert rs["tail"] == 1.0
    assert abs(rs["web"] * 100000 + 30 - 0.01 * 100030) < 1e-6

    rows = [(i, ["web", "books", "code"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    cnts = {r["source"]: r["count"] for r in df.groupBy("source").count().collect()}
    rates = temperature_mixture_rates(cnts, alpha=0.3, target_fraction=0.4)
    kept_df = deterministic_sample(df, "doc_id", rates, strata_col="source")
    frac = kept_df.count() / 3000
    assert abs(frac - 0.4) < 0.05  # hash acceptance ≈ expectation


def test_knn_null_distance_rows_never_enter_topk(spark):
    """r11 review: NULL distances (missing embedding / zero-norm cosine)
    sorted NULLS FIRST and displaced every real neighbor from the
    top-k."""
    from pyspark.sql import functions as F

    from vrod_spark.operators.knn import knn_exact

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, None),
            (3, [0.0, 0.0]),  # zero norm -> NULL cosine distance
        ],
        "vec_id long, embedding array<float>",
    )
    got = [r["vec_id"] for r in knn_exact(df, [1.0, 0.0], k=2, metric="cosine").collect()]
    assert got == [0, 1]
    got_l2 = [
        r["vec_id"] for r in knn_exact(df, [1.0, 0.0], k=3, metric="l2").collect()
    ]
    assert 2 not in got_l2[:2]  # the NULL-embedding row never leads


def test_asof_join_null_keys_and_timestamps(spark):
    """r11 review: NULL right keys/timestamps must match nothing (equi-
    join semantics), and NULL-key left rows get NULL payload — they
    previously received payloads from co-partitioned NULL-key right
    rows."""
    from vrod_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "l1"), (None, 10, "l2"), (1, None, "l3")],
        "k int, ts int, lbl string",
    )
    right = spark.createDataFrame(
        [(1, 5, "r1"), (None, 3, "rnull"), (1, None, "rts")],
        "k int, ts int, val string",
    )
    out = {
        r["lbl"]: r["asof_val"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_cols=["val"],
        ).collect()
    }
    assert out["l1"] == "r1"      # real match unaffected
    assert out["l2"] is None      # NULL key matches nothing
    assert out["l3"] is None      # NULL left ts precedes nothing


def test_salted_join_default_salt_skips_map_columns(spark):
    """r11 review: the default salt hashed every left column; MapType
    columns made the whole join fail (hash over maps is rejected)."""
    from vrod_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, {"a": "b"}), (1, {"c": "d"}), (2, {})],
        "k int, meta map<string,string>",
    )
    right = spark.createDataFrame([(1, "one"), (2, "two")], "k int, v string")
    out = salted_join(left, right, "k", factor=4)
    assert out.count() == 3
    assert {r["v"] for r in out.collect()} == {"one", "two"}


def test_reindex_empty_and_conflict_paths(spark, tmp_path):
    """r11 review: (a) REINDEX of an emptied collection is a clean
    'no rows' no-op for every index kind (numpy AxisError / unreadable
    empty snapshot before); (b) the staged-commit tail refuses when a
    concurrent commit superseded the base version, reclaiming staging."""
    import os

    import pytest

    from vrod_spark.engine import Engine
    from vrod_spark.errors import CommitConflictError

    eng = Engine.create(spark, str(tmp_path), "rdb")
    eng.execute("CREATE", collection="e", arg={"dimension": 4})
    eng.execute(
        "INSERT",
        collection="e",
        arg=[{"id": i, "embedding": [float(i)] * 4} for i in range(8)],
    )
    eng.execute("DELETE", collection="e", arg="true")
    col = eng.db.collection("e")
    for kind in ("sign_lsh", "ivf", "pq", "ivfpq"):
        info = eng.execute("REINDEX", collection="e", arg={"kind": kind}).info
        assert info["indexed"] is False and info["reason"] == "no rows"
        assert col.meta["index"] is None
    # staged-commit conflict: stale base_version is refused, staging gone
    staging = os.path.join(col.path, ".staging-test")
    os.makedirs(staging)
    with pytest.raises(CommitConflictError):
        col.commit_staged_index(
            staging,
            base_version=col.version - 1,
            index={"kind": "sign_lsh"},
            op_detail={},
        )
    assert not os.path.exists(staging)
    assert col.meta["index"] is None  # nothing committed
