"""Differential fuzzing vs DuckDB: hypothesis-generated relational
queries executed by BOTH engines on the same parquet, compared
value-for-value. The per-round oracle gate checks 50 FIXED queries;
this extends the same contract to randomly-shaped plans, so a
regression in filter pushdown, null handling, aggregate semantics, or
join planning surfaces on shapes nobody hand-wrote (SURVEY §5's
oracle-differential strategy, generalized)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
AGGS = ["sum", "avg", "min", "max", "count"]


def _close(a, b, tol=1e-6):
    if a is None or b is None:
        return a == b
    fa, fb = float(a), float(b)
    return abs(fa - fb) <= max(tol, tol * max(abs(fa), abs(fb)))


@given(
    group_col=st.sampled_from(GROUP_COLS),
    agg=st.sampled_from(AGGS),
    measure=st.sampled_from(MEASURES),
    qty_max=st.integers(min_value=1, max_value=50),
    disc_max=st.integers(min_value=0, max_value=10),
)
@SETTINGS
def test_differential_filtered_agg(spark, sf_dir, group_col, agg, measure, qty_max, disc_max):
    """filter → groupBy → agg, arbitrary column/function/threshold
    combinations: per-group values must match DuckDB within float
    tolerance, group sets exactly."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cond = (F.col("l_quantity") <= qty_max) & (F.col("l_discount") <= disc_max / 100.0)
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
          "count": lambda c: F.count(F.lit(1))}[agg]
    got = {
        r[group_col]: r["v"]
        for r in li.filter(cond).groupBy(group_col).agg(fn(measure).alias("v")).collect()
    }
    sql_fn = f"{agg}({measure})" if agg != "count" else "count(*)"
    want = dict(
        duckdb.sql(
            f"SELECT {group_col}, {sql_fn} FROM '{sf_dir}/lineitem.parquet' "
            f"WHERE l_quantity <= {qty_max} AND l_discount <= {disc_max / 100.0} "
            f"GROUP BY {group_col}"
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in want:
        assert _close(got[k], want[k]), (k, got[k], want[k])


@given(
    prio_like=st.sampled_from(["1%", "2%", "3%", "%URGENT%", "%LOW%"]),
    status=st.sampled_from(["O", "F", "P"]),
    agg=st.sampled_from(["sum", "count", "max"]),
)
@SETTINGS
def test_differential_join_agg(spark, sf_dir, prio_like, status, agg):
    """orders ⋈ lineitem with random predicates on BOTH sides, grouped
    on the probe side — exercises join planning + pushdown through the
    differential oracle."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    joined = (
        orders.filter(
            F.col("o_orderpriority").like(prio_like)
            & (F.col("o_orderstatus") == status)
        )
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
    )
    fn = {"sum": F.sum("l_quantity"), "count": F.count(F.lit(1)),
          "max": F.max("l_extendedprice")}[agg]
    got = {r["o_orderpriority"]: r["v"] for r in joined.agg(fn.alias("v")).collect()}
    sql_fn = {"sum": "sum(l_quantity)", "count": "count(*)",
              "max": "max(l_extendedprice)"}[agg]
    want = dict(
        duckdb.sql(
            f"SELECT o_orderpriority, {sql_fn} "
            f"FROM '{sf_dir}/orders.parquet' o JOIN '{sf_dir}/lineitem.parquet' l "
            f"ON o.o_orderkey = l.l_orderkey "
            f"WHERE o.o_orderpriority LIKE '{prio_like}' AND o.o_orderstatus = '{status}' "
            f"GROUP BY o_orderpriority"
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in want:
        assert _close(got[k], want[k]), (k, got[k], want[k])


@given(
    n=st.integers(min_value=1, max_value=30),
    order_col=st.sampled_from(["l_extendedprice", "l_quantity", "l_shipdate"]),
    asc=st.booleans(),
)
@SETTINGS
def test_differential_topk(spark, sf_dir, n, order_col, asc):
    """Top-k with arbitrary sort column/direction/limit: the
    TakeOrderedAndProject path must return the exact DuckDB rows (keyed
    by a unique tiebreaker so ordering is total)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    oc = F.col(order_col).asc() if asc else F.col(order_col).desc()
    got = [
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.orderBy(oc, "l_orderkey", "l_linenumber").limit(n).collect()
    ]
    direction = "ASC" if asc else "DESC"
    want = duckdb.sql(
        f"SELECT l_orderkey, l_linenumber FROM '{sf_dir}/lineitem.parquet' "
        f"ORDER BY {order_col} {direction}, l_orderkey, l_linenumber LIMIT {n}"
    ).fetchall()
    assert got == [tuple(w) for w in want]


@given(
    offset=st.integers(min_value=0, max_value=40),
    n=st.integers(min_value=1, max_value=25),
    asc=st.booleans(),
)
@SETTINGS
def test_differential_limit_offset(spark, sf_dir, offset, n, asc):
    """LIMIT+OFFSET pagination over a total order: DataFrame.offset +
    limit must return exactly DuckDB's LIMIT n OFFSET m page — including
    pages past the end of the result (empty) and offset 0."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    oc = F.col("l_extendedprice").asc() if asc else F.col("l_extendedprice").desc()
    got = [
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.orderBy(oc, "l_orderkey", "l_linenumber")
        .offset(offset)
        .limit(n)
        .collect()
    ]
    direction = "ASC" if asc else "DESC"
    want = duckdb.sql(
        f"SELECT l_orderkey, l_linenumber FROM '{sf_dir}/lineitem.parquet' "
        f"ORDER BY l_extendedprice {direction}, l_orderkey, l_linenumber "
        f"LIMIT {n} OFFSET {offset}"
    ).fetchall()
    assert got == [tuple(w) for w in want]


@pytest.mark.parametrize("seed", [0])
def test_differential_null_semantics(spark, sf_dir, seed):
    """Aggregates over columns WITH nulls: Spark and DuckDB must agree
    on count/sum/avg null-skipping and on grouping the NULL key."""
    rows = [(None, 1.0), ("a", None), ("a", 2.0), (None, None), ("b", 3.0)]
    sdf = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: (r["n"], r["s"], r["m"])
        for r in sdf.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"), F.avg("v").alias("m"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        k: (n, s, m)
        for k, n, s, m in con.execute(
            "SELECT k, count(v), sum(v), avg(v) FROM t GROUP BY k"
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in want:
        for g, w in zip(got[k], want[k]):
            assert (g is None and w is None) or _close(g, w), (k, got[k], want[k])


@given(
    part_col=st.sampled_from(["l_returnflag", "l_linestatus"]),
    order_col=st.sampled_from(["l_extendedprice", "l_quantity"]),
    rank_cut=st.integers(min_value=1, max_value=5),
)
@SETTINGS
def test_differential_window_rank(spark, sf_dir, part_col, order_col, rank_cut):
    """Window ranking with arbitrary partition/order columns and cutoff:
    the per-partition top-rank row sets must match DuckDB's (total order
    via unique tiebreakers, so ranks are deterministic)."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    w = Window.partitionBy(part_col).orderBy(
        F.col(order_col).desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    got = sorted(
        (r[part_col], r["l_orderkey"], r["l_linenumber"], r["rk"])
        for r in li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= rank_cut)
        .collect()
    )
    want = sorted(
        tuple(t)
        for t in duckdb.sql(
            f"SELECT {part_col}, l_orderkey, l_linenumber, rk FROM ("
            f"  SELECT *, row_number() OVER (PARTITION BY {part_col} "
            f"    ORDER BY {order_col} DESC, l_orderkey, l_linenumber) AS rk "
            f"  FROM '{sf_dir}/lineitem.parquet') WHERE rk <= {rank_cut}"
        ).fetchall()
    )
    assert got == want


@given(
    op=st.sampled_from(["intersect", "except_", "union"]),
    qty_a=st.integers(min_value=5, max_value=45),
    qty_b=st.integers(min_value=5, max_value=45),
)
@SETTINGS
def test_differential_set_ops(spark, sf_dir, op, qty_a, qty_b):
    """Set operations between two arbitrary filtered projections: the
    distinct result sets must match DuckDB exactly."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = li.filter(F.col("l_quantity") <= qty_a).select("l_returnflag", "l_linestatus")
    b = li.filter(F.col("l_quantity") >= qty_b).select("l_returnflag", "l_linestatus")
    got = sorted(
        (r["l_returnflag"], r["l_linestatus"])
        for r in {
            "intersect": a.intersect(b),
            "except_": a.distinct().exceptAll(b.distinct()),
            "union": a.union(b).distinct(),
        }[op].collect()
    )
    sql_op = {"intersect": "INTERSECT", "except_": "EXCEPT", "union": "UNION"}[op]
    want = sorted(
        tuple(t)
        for t in duckdb.sql(
            f"SELECT DISTINCT l_returnflag, l_linestatus FROM '{sf_dir}/lineitem.parquet' WHERE l_quantity <= {qty_a} "
            f"{sql_op} "
            f"SELECT DISTINCT l_returnflag, l_linestatus FROM '{sf_dir}/lineitem.parquet' WHERE l_quantity >= {qty_b}"
        ).fetchall()
    )
    assert got == want


def test_differential_unicode_normalization(spark, sf_dir):
    """The NFC stage of text normalization must agree with DuckDB's
    nfc_normalize on planted non-NFC inputs (decomposed accents,
    precomposed forms, Hangul jamo, mixed scripts) — representation-only
    differences collapse identically in both engines, so cross-engine
    fingerprints/dedup stay comparable."""
    import unicodedata

    from vrod_spark.functions.text import normalize_text_udf

    planted = [
        "café au lait",            # decomposed acute
        "café au lait",             # precomposed — same NFC form
        "Ångström",          # ring + diaeresis
        "각 test",       # Hangul jamo -> syllable
        "no change needed here",
        "À́ stacked",    # stacked combining marks
    ]
    rows = [(i, t) for i, t in enumerate(planted)]
    sdf = spark.createDataFrame(rows, "id bigint, text string")
    got = {
        r["id"]: r["norm"]
        for r in sdf.select("id", normalize_text_udf("text").alias("norm")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(con.execute("SELECT id, nfc_normalize(text) FROM t").fetchall())
    for i, t in rows:
        assert got[i] == want[i] == unicodedata.normalize("NFC", t), i
    # the two accent representations now fingerprint identically
    assert got[0] == got[1]


@given(
    n_keys=st.integers(min_value=1, max_value=4),
    n_left=st.integers(min_value=1, max_value=25),
    n_right=st.integers(min_value=0, max_value=25),
    seed=st.integers(min_value=0, max_value=10_000),
)
@SETTINGS
def test_differential_asof_join(spark, n_keys, n_left, n_right, seed):
    """The custom as-of join (union + window fill, O(L+R)) vs DuckDB's
    native ASOF JOIN on random keyed event streams — including duplicate
    timestamps, keys with no right rows, and left rows preceding every
    right row (must yield NULL, not a wrap-around match)."""
    import random

    rng = random.Random(seed)
    left_rows = [
        (i, rng.randrange(n_keys), rng.randrange(0, 50)) for i in range(n_left)
    ]
    right_rows = [
        (100 + j, rng.randrange(n_keys), rng.randrange(0, 50), float(j))
        for j in range(n_right)
    ]
    from vrod_spark.operators.asof import asof_join

    l = spark.createDataFrame(left_rows, "lid bigint, k bigint, lt bigint")
    r = spark.createDataFrame(right_rows, "rid bigint, k bigint, rt bigint, v double")
    got = {
        row["lid"]: row["asof_v"]
        for row in asof_join(
            l, r, on="k", left_ts="lt", right_ts="rt",
            right_cols=["v"], tiebreak="rid",
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE l(lid BIGINT, k BIGINT, lt BIGINT)")
    con.execute("CREATE TABLE r(rid BIGINT, k BIGINT, rt BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", left_rows)
    if right_rows:
        con.executemany("INSERT INTO r VALUES (?, ?, ?, ?)", right_rows)
    # DuckDB ASOF JOIN picks the greatest rt <= lt per key; break rt ties
    # by max rid like the operator's tiebreak — expressed via argmax over
    # the qualifying rows (ASOF itself leaves duplicate-ts choice
    # unspecified, so the oracle states the rule explicitly).
    want = dict(
        con.execute(
            """
            SELECT l.lid,
                   (SELECT v FROM r
                    WHERE r.k = l.k AND r.rt <= l.lt
                    ORDER BY rt DESC, rid DESC LIMIT 1) AS v
            FROM l
            """
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in want:
        assert (got[k] is None and want[k] is None) or _close(got[k], want[k]), (
            k, got[k], want[k],
        )
@pytest.mark.parametrize("seed", [0])
def test_differential_levenshtein_unicode(spark, seed):
    """Levenshtein cross-engine semantics, CODIFIED: Spark counts
    CODEPOINTS while DuckDB 1.x counts BYTES, so the two agree on ASCII
    and DIVERGE on any multibyte text — which is exactly why q26's
    edit_sim column is ASCII-guarded (NULL for multibyte pairs). This
    test pins both halves: exact agreement on the ASCII subset, and the
    documented divergence direction on multibyte inputs (if DuckDB ever
    switches to codepoints, this fails and the guard can be dropped)."""
    ascii_pairs = [("kitten", "sitting"), ("", "abc"), ("", ""), ("same", "same")]
    multibyte_pairs = [
        ("\u7684\u662f\u4e86\u5728\u6211", "\u7684\u662f\u5728\u4e86\u6211"),
        ("caf\u00e9", "cafe"),
    ]
    pairs = ascii_pairs + multibyte_pairs
    sdf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "id bigint, a string, b string"
    )
    got = {
        r["id"]: r["d"]
        for r in sdf.select("id", F.levenshtein("a", "b").alias("d")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, a VARCHAR, b VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)", [(i, a, b) for i, (a, b) in enumerate(pairs)]
    )
    want = dict(con.execute("SELECT id, levenshtein(a, b) FROM t").fetchall())
    for i in range(len(ascii_pairs)):
        assert got[i] == want[i], (i, got[i], want[i])
    # codepoint distance <= byte distance; strict on these planted cases
    for i in range(len(ascii_pairs), len(pairs)):
        assert got[i] < want[i], (i, got[i], want[i])
    assert got[len(ascii_pairs)] == 2  # adjacent CJK swap = 2 codepoint edits


@given(
    size=st.integers(min_value=1, max_value=12),
    stride=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=10_000),
)
@SETTINGS
def test_differential_chunking(spark, size, stride, seed):
    """chunk_documents vs a DuckDB generate_series/list-slice twin on
    random (size, stride) and random token-count docs (incl. empty and
    whitespace-edge texts): identical chunk boundaries, token counts,
    and chunk text on both engines."""
    import random

    from vrod_spark.operators.sampling import chunk_documents

    rng = random.Random(seed)
    texts = []
    for i in range(8):
        n = rng.randint(0, 30)
        texts.append((i, " ".join(f"w{rng.randint(0, 9)}" for _ in range(n))))
    docs = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["start"], r["chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, size=size, stride=stride).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", texts)
    want = sorted(
        con.execute(
            f"""
            SELECT t.doc_id, (s.g / {stride})::INT, s.g::INT,
                   len(t.ws[s.g+1 : s.g+{size}])::INT,
                   array_to_string(t.ws[s.g+1 : s.g+{size}], ' ')
            FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM d) t,
                 unnest(generate_series(0, len(t.ws) - 1, {stride})) AS s(g)
            """
        ).fetchall()
    )
    assert got == want, (size, stride, seed)


_URL_NORM_SQL = r"""
  SELECT i,
         CASE WHEN scheme = '' OR lower(regexp_replace(nouser, ':[0-9]*$', '')) = ''
              THEN NULL ELSE
           scheme || '://' ||
           (CASE WHEN regexp_extract(nouser, ':([0-9]+)$', 1) = ''
                   OR (scheme = 'http'  AND regexp_extract(nouser, ':([0-9]+)$', 1) = '80')
                   OR (scheme = 'https' AND regexp_extract(nouser, ':([0-9]+)$', 1) = '443')
                 THEN lower(regexp_replace(nouser, ':[0-9]*$', ''))
                 ELSE lower(regexp_replace(nouser, ':[0-9]*$', ''))
                      || ':' || regexp_extract(nouser, ':([0-9]+)$', 1) END) ||
           (CASE WHEN rawpath = '' THEN '/'
                 WHEN length(rawpath) > 1 AND rawpath LIKE '%/'
                 THEN substring(rawpath, 1, length(rawpath) - 1)
                 ELSE rawpath END) ||
           (CASE WHEN len(list_filter(string_split(q, '&'),
                          p -> p <> '' AND NOT regexp_matches(p,
                            '^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$'))) > 0
                 THEN '?' || array_to_string(
                        list_sort(list_filter(string_split(q, '&'),
                          p -> p <> '' AND NOT regexp_matches(p,
                            '^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$'))), '&')
                 ELSE '' END)
         END AS n
  FROM (
    SELECT i,
           lower(regexp_extract(trim(u), '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
           regexp_replace(regexp_extract(trim(u),
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1), '^[^@]*@', '') AS nouser,
           regexp_extract(trim(u),
             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS rawpath,
           regexp_extract(regexp_replace(trim(u), '#.*', ''), '\?(.*)', 1) AS q
    FROM urls_tbl
  )
"""

_LABEL = st.text(
    alphabet="abcdefgHIJ0123456789-", min_size=1, max_size=6
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))


@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["http", "https", "HTTP", "ftp", ""]),
            st.lists(_LABEL, min_size=1, max_size=3),
            st.sampled_from(["", ":80", ":443", ":8080", ":0"]),
            st.lists(
                st.text(alphabet="abcXYZ09._~%", min_size=0, max_size=5),
                min_size=0, max_size=3,
            ),
            st.lists(
                st.sampled_from(
                    ["a=1", "b=2", "utm_source=t", "ref=x", "z", "", "a=2"]
                ),
                min_size=0, max_size=4,
            ),
            st.sampled_from(["", "#f", "#a#b"]),
            st.booleans(),  # trailing slash on path
        ),
        min_size=1, max_size=25,
    )
)
@SETTINGS
def test_differential_url_normalize_generative(spark, data):
    """Generative cross-engine differential for url_normalize: URLs
    assembled from random components (schemes incl. non-http and absent,
    multi-label hosts, ports incl. :0, %-ish path segments, duplicate and
    tracking query params, repeated-# fragments, trailing slashes) must
    normalize identically in Spark and the DuckDB SQL spec twin."""
    from vrod_spark.functions.url import url_normalize

    urls = []
    for scheme, labels, port, segs, params, frag, tslash in data:
        host = ".".join(labels)
        base = f"{scheme}://{host}{port}" if scheme else host
        path = "".join("/" + s for s in segs) + ("/" if tslash and segs else "")
        qstr = ("?" + "&".join(params)) if params else ""
        urls.append(base + path + qstr + frag)

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, u string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", url_normalize("u").alias("n")).collect()
    }
    con = duckdb.connect()
    import pandas as pd

    con.register("urls_tbl", pd.DataFrame({"i": range(len(urls)), "u": urls}))
    want = {r[0]: r[1] for r in con.sql(_URL_NORM_SQL).fetchall()}
    for i, u in enumerate(urls):
        assert got[i] == want[i], f"{u!r}: spark={got[i]!r} duckdb={want[i]!r}"


@given(seed=st.integers(min_value=0, max_value=10_000))
@SETTINGS
def test_differential_dedup_lines_brute_force(spark, seed):
    """dedup_lines vs an independent Python reference on random corpora:
    lines drawn from a small pool (guaranteed cross-doc collisions),
    digit/case variants that normalize equal, blank lines, and empty
    docs. The reference recomputes normalization and keep-first from
    scratch."""
    import random
    import re

    from vrod_spark.operators.dedup import dedup_lines

    rng = random.Random(seed)
    pool = [
        "alpha beta gamma",
        "ALPHA beta GAMMA",        # case variant of the above
        "viewed 17 times",
        "viewed 20398 times",      # digit variant of the above
        "unique snowflake",
        "punct, rich! line?",
        "",
        "   ",
    ]
    docs = []
    for i in range(rng.randint(1, 12)):
        n = rng.randint(0, 6)
        docs.append((i, "\n".join(rng.choice(pool) for _ in range(n)) if n else ""))

    def norm(line: str) -> str:
        s = re.sub(r"[0-9]", "0", line.strip().lower())
        return re.sub(r"[^\w0 ]", "", s, flags=re.UNICODE).replace("_", "")

    # Python reference: keep-first by (id, pos) on the normalized hash;
    # empty-normalized lines exempt.
    seen: set[str] = set()
    want = {}
    for i, text in docs:
        kept, cut = [], 0
        for line in text.split("\n"):
            key = norm(line)
            if len(key) < 1:
                kept.append(line)
            elif key not in seen:
                seen.add(key)
                kept.append(line)
            else:
                cut += 1
        want[i] = ("\n".join(kept), cut)

    df = spark.createDataFrame(docs, "doc_id long, text string").coalesce(2)
    got = {
        r["doc_id"]: (r["text"], r["n_cut_lines"])
        for r in dedup_lines(df).collect()
    }
    assert got == want


@given(seed=st.integers(min_value=0, max_value=10_000))
@SETTINGS
def test_differential_c4_line_stats_brute_force(spark, seed):
    """c4_line_stats vs an independent Python reference: random pages
    assembled from rule-triggering and rule-passing line fragments."""
    import random
    import re

    from vrod_spark.functions.text import c4_line_stats

    rng = random.Random(seed)
    pool = [
        "This line has five good words.",          # kept
        "Short line.",                              # <5 words
        "no terminal punctuation on this line here",
        "Enable JavaScript to view this content now.",  # javascript
        'He said "this quoted line has enough words."',  # kept, quote-terminal
        "Another perfectly reasonable sentence sits right here.",  # kept
        "lorem ipsum dolor sit amet filler text here.",  # kept line, page poison
        "a curly { brace appears in this line here.",    # kept line, page poison
    ]
    pages = []
    for i in range(rng.randint(1, 10)):
        n = rng.randint(0, 6)
        pages.append((i, "\n".join(rng.choice(pool) for _ in range(n)) if n else ""))

    def ref(page: str):
        lines = page.split("\n")
        kept = [
            l for l in lines
            if re.search(r'[.!?"]$', l.strip())
            and len(re.findall(r"\S+", l)) >= 5
            and not re.search(r"\bjavascript\b", l.lower())
        ]
        clean = "\n".join(kept)
        mask = (
            (1 if "lorem ipsum" in page.lower() else 0)
            + (2 if re.search(r"[{}]", page) else 0)
            + (4 if len(re.findall(r"[.!?]", clean)) < 3 else 0)
        )
        return len(lines), len(kept), clean, mask

    df = spark.createDataFrame(pages, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["s"]["n_lines"], r["s"]["n_kept"],
            r["s"]["clean_text"], r["s"]["fail_mask"],
        )
        for r in df.select("doc_id", c4_line_stats("text").alias("s")).collect()
    }
    for i, page in pages:
        assert got[i] == ref(page), (i, page)


@given(seed=st.integers(min_value=0, max_value=10_000))
@SETTINGS
def test_differential_rrf_fuse_brute_force(spark, seed):
    """rrf_fuse vs a pure-python recompute over randomized ranked lists:
    fused order, scores, and n_lists match exactly for any list overlap
    pattern (disjoint, nested, partial) — the fused score is a sum of
    exact rationals, so equality is exact, not approximate."""
    import random

    from vrod_spark.operators.retrieval import rrf_fuse

    rng = random.Random(seed)
    n_lists = rng.randint(1, 4)
    universe = list(range(100, 160))
    lists = {}
    for li in range(n_lists):
        ids = rng.sample(universe, rng.randint(1, 15))
        lists[f"l{li}"] = {doc: rank + 1 for rank, doc in enumerate(ids)}
    k = rng.choice([10, 60])
    dfs = {
        name: spark.createDataFrame(
            [(d, r) for d, r in ranks.items()], "id long, rank int"
        )
        for name, ranks in lists.items()
    }
    got = rrf_fuse(dfs, k=k).collect()
    # brute force
    all_ids = sorted({d for ranks in lists.values() for d in ranks})
    def score(d):
        return sum(1.0 / (k + ranks[d]) for ranks in
                   (lists[n] for n in sorted(lists)) if d in ranks)
    def nl(d):
        return sum(1 for ranks in lists.values() if d in ranks)
    want = sorted(all_ids, key=lambda d: (-score(d), d))
    assert [r["id"] for r in got] == want
    for r in got:
        assert r["n_lists"] == nl(r["id"])
        assert abs(r["rrf_score"] - score(r["id"])) < 1e-15
    assert [r["fused_rank"] for r in got] == list(range(1, len(want) + 1))


@given(
    n_docs=st.integers(min_value=1, max_value=20),
    n_terms=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=10_000),
)
@SETTINGS
def test_differential_bm25_array_form(spark, n_docs, n_terms, seed):
    """The r11 array-expression bm25_rank vs a plain-Python Okapi BM25
    on random corpora — empty documents (they still count toward
    n_docs/avgdl), repeated terms, query terms absent from the whole
    corpus (idf of df=0 must still be finite and the term contribute
    nothing anywhere), and mixed-case query terms."""
    import math
    import random

    from vrod_spark.operators.retrieval import bm25_rank

    rng = random.Random(seed)
    vocab = ["join", "hash", "scan", "sort", "Zeta", "omega"]
    texts = {
        i: " ".join(rng.choices(vocab, k=rng.randint(0, 8))).lower()
        for i in range(n_docs)
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )
    # Mixed-case picks; "missing" never appears in any document.
    terms = rng.sample(["Join", "HASH", "scan", "missing"], k=n_terms)
    got = {r["id"]: r for r in bm25_rank(docs, terms, top_k=n_docs + 5).collect()}

    tok = {i: t.split() for i, t in texts.items()}
    n = len(texts)
    avgdl = sum(len(v) for v in tok.values()) / n
    k1, b = 1.2, 0.75
    expect = {}
    for i, toks in tok.items():
        s, matched = 0.0, 0
        for t in {x.lower() for x in terms}:
            tf = toks.count(t)
            if not tf:
                continue
            df = sum(1 for v in tok.values() if t in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
            matched += 1
        if matched:
            expect[i] = (round(s, 4), matched)
    assert set(got) == set(expect)
    for i, (s, m) in expect.items():
        assert abs(got[i]["score"] - s) < 1e-9, i
        assert got[i]["n_matched"] == m, i
    order = sorted(expect, key=lambda i: (-expect[i][0], i))
    assert [got[i]["rank"] for i in order] == list(range(1, len(order) + 1))
