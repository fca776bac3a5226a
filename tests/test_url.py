"""URL curation functions (functions/url.py): normalization spec cases,
registered-domain rule, keep-first URL dedup, domain blocklist filter.

All pure-codegen Catalyst expressions — the plan test asserts no Python
stage appears anywhere in the normalize/dedup plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vrod_spark.functions.url import (
    filter_blocked_domains,
    registered_domain,
    url_dedup,
    url_host,
    url_normalize,
)

NORM_CASES = [
    # (input, expected) — one per spec clause
    ("http://Example.COM/path", "http://example.com/path"),
    ("HTTPS://WWW.Example.com/A/B/", "https://www.example.com/A/B"),  # case: scheme/host only; path preserved; trailing slash
    ("http://example.com:80/x", "http://example.com/x"),  # default port
    ("https://example.com:443/", "https://example.com/"),  # default port + root slash kept
    ("https://example.com:8443/x", "https://example.com:8443/x"),  # non-default port kept
    ("http://example.com", "http://example.com/"),  # empty path -> '/'
    ("http://example.com/x#frag", "http://example.com/x"),  # fragment
    ("http://example.com/a#x?b=1", "http://example.com/a"),  # '?' INSIDE fragment is not a query
    ("http://example.com/x?b=2&a=1", "http://example.com/x?a=1&b=2"),  # param sort
    (
        "http://example.com/x?utm_source=tw&a=1&fbclid=abc&gclid=1&msclkid=2&ref=hn",
        "http://example.com/x?a=1",
    ),  # tracking strip
    ("http://example.com/x?utm_source=tw", "http://example.com/x"),  # all params stripped
    ("http://user:pw@example.com/x", "http://example.com/x"),  # userinfo
    ("  http://example.com/x  ", "http://example.com/x"),  # trim
    ("not a url", None),
    ("", None),
    (None, None),
]


def test_url_normalize_spec_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(NORM_CASES)], "i int, u string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", url_normalize("u").alias("n")).collect()
    }
    for i, (u, want) in enumerate(NORM_CASES):
        assert got[i] == want, f"{u!r}: got {got[i]!r}, want {want!r}"


def test_url_normalize_idempotent(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, w) in enumerate(NORM_CASES) if w is not None],
        "i int, u string",
    )
    rows = df.select(
        url_normalize("u").alias("once"),
        url_normalize(url_normalize("u")).alias("twice"),
    ).collect()
    for r in rows:
        assert r["once"] == r["twice"]


DOM_CASES = [
    ("www.example.com", "example.com"),
    ("a.b.news.co.uk", "news.co.uk"),
    ("shop.com.au", "shop.com.au"),
    ("x.shop.com.au", "shop.com.au"),
    ("example.io", "example.io"),
    ("localhost", "localhost"),
    ("co.uk", "co.uk"),  # the suffix itself: <3 labels, fall back to last-2
]


def test_registered_domain(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(DOM_CASES)], "i int, h string"
    )
    got = {
        r["i"]: r["d"]
        for r in df.select("i", registered_domain("h").alias("d")).collect()
    }
    for i, (h, want) in enumerate(DOM_CASES):
        assert got[i] == want, f"{h!r}: got {got[i]!r}, want {want!r}"


def test_url_dedup_keep_first_and_null_kept(spark):
    rows = [
        (1, "http://Example.com/a?utm_source=x"),
        (2, "http://example.com/a"),  # same page as 1 -> dropped (keep id 1)
        (3, "http://example.com/a?x=1"),  # different page
        (4, "junk"),  # NULL key — kept
        (5, "junk"),  # NULL key — also kept (no aliasing of malformed rows)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r["doc_id"] for r in url_dedup(df).collect())
    assert kept == [1, 3, 4, 5]


def test_filter_blocked_domains_isin_and_broadcast(spark):
    rows = [
        (1, "http://spam.co.uk/x"),
        (2, "http://www.spam.co.uk/y"),
        (3, "http://ham.co.uk/x"),
        (4, "bad url"),  # unparseable -> domain NULL -> kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    small = sorted(
        r["doc_id"]
        for r in filter_blocked_domains(df, ["spam.co.uk"]).collect()
    )
    assert small == [3, 4]
    big_list = ["spam.co.uk"] + [f"filler{i}.com" for i in range(300)]
    big = sorted(
        r["doc_id"] for r in filter_blocked_domains(df, big_list).collect()
    )
    assert big == [3, 4]


def test_dedup_verb_url_strategy(spark, tmp_path):
    """DEDUP {"strategy": "url"}: keep-first by normalized meta['url'];
    malformed/absent URLs never drop; COW commit; dry_run reports the
    drop set without rewriting; since_version keeps established rows."""
    from vrod_spark.engine import Engine

    eng = Engine.create(spark, str(tmp_path), "urldb")
    eng.execute("CREATE", collection="pages")
    rows = [
        {"id": 1, "embedding": [1.0], "payload": "a",
         "meta": {"url": "http://Example.com/a?utm_source=x"}},
        {"id": 2, "embedding": [1.0], "payload": "b",
         "meta": {"url": "http://example.com/a"}},  # same page as 1
        {"id": 3, "embedding": [1.0], "payload": "c",
         "meta": {"url": "http://example.com/a?x=1"}},
        {"id": 4, "embedding": [1.0], "payload": "d", "meta": {"url": "junk"}},
        {"id": 5, "embedding": [1.0], "payload": "e", "meta": {}},  # no url
    ]
    eng.execute("INSERT", collection="pages", arg=rows)

    dry = eng.execute(
        "DEDUP", collection="pages", arg={"strategy": "url", "dry_run": True}
    )
    assert [r["id"] for r in dry.df.collect()] == [2]
    col = eng.db.collection("pages")
    assert col.read().count() == 5  # dry_run rewrote nothing

    info = eng.execute(
        "DEDUP", collection="pages", arg={"strategy": "url"}
    ).info
    assert info["strategy"] == "url" and info["removed"] == 1
    assert sorted(r["id"] for r in col.read().collect()) == [1, 3, 4, 5]

    v_est = col.version
    # append a refetch of page /a (dup of established 1) and a new page;
    # established rows never drop, the delta dedups against the corpus
    eng.execute(
        "INSERT",
        collection="pages",
        arg=[
            {"id": 6, "embedding": [1.0], "payload": "f",
             "meta": {"url": "HTTP://EXAMPLE.COM/a#frag"}},
            {"id": 7, "embedding": [1.0], "payload": "g",
             "meta": {"url": "http://example.com/new"}},
        ],
    )
    info = eng.execute(
        "DEDUP",
        collection="pages",
        arg={"strategy": "url", "since_version": v_est},
    ).info
    assert info["removed"] == 1 and info["since_version"] == v_est
    assert sorted(r["id"] for r in col.read().collect()) == [1, 3, 4, 5, 7]


def test_differential_url_normalize_vs_duckdb(spark):
    """Cross-engine differential: component-assembled URLs (seeded
    product of schemes × hosts × ports × paths × queries × fragments)
    normalized by the Spark operator vs an independent DuckDB SQL
    re-implementation of the same spec (the q52 'url'-leg oracle
    fragment). Any string mismatch is a spec divergence."""
    import duckdb

    schemes = ["http", "HTTPS", "Http"]
    hosts = ["Example.COM", "www.news.co.uk", "User:pw@Shop.com.au", "a.io"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/A/b/", "/x%20y/"]
    queries = ["", "?b=2&a=1", "?utm_source=t&a=1", "?utm_campaign=x", "?a=1&a=0"]
    frags = ["", "#sec"]
    urls = []
    i = 0
    for s in schemes:
        for h in hosts:
            for p in ports:
                for pa in paths:
                    for q in queries:
                        for fr in frags:
                            i += 1
                            if i % 7:  # seeded thinning, keeps ~170 cases
                                continue
                            urls.append(f"{s}://{h}{p}{pa}{q}{fr}")
    df = spark.createDataFrame(
        [(j, u) for j, u in enumerate(urls)], "i long, u string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", url_normalize("u").alias("n")).collect()
    }

    con = duckdb.connect()
    con.register("urls_tbl", __import__("pandas").DataFrame(
        {"i": list(range(len(urls))), "u": urls}
    ))
    want_rows = con.sql(r"""
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
               regexp_extract(trim(u), '\?([^#]*)', 1) AS q
        FROM urls_tbl
      )
    """).fetchall()
    want = {r[0]: r[1] for r in want_rows}
    assert len(got) == len(want) == len(urls)
    for j, u in enumerate(urls):
        assert got[j] == want[j], f"{u!r}: spark={got[j]!r} duckdb={want[j]!r}"


def test_extract_links_resolution(spark):
    from vrod_spark.functions.url import extract_links

    html = (
        '<p><a href="https://other.com/x">abs</a>'
        '<A HREF=\'//cdn.com/y\'>proto-rel</A>'
        '<a class="z" href="/root/a">root-rel</a>'
        '<a href="sub/b.html">dir-rel</a>'
        '<a href="mailto:x@y.com">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="#top">frag</a></p>'
    )
    df = spark.createDataFrame(
        [(html, "http://Example.com/docs/page.html")], "html string, url string"
    )
    got = df.select(
        extract_links("html", "url").alias("links")
    ).first()["links"]
    assert got == [
        "https://other.com/x",
        "http://cdn.com/y",
        "http://example.com/root/a",
        "http://example.com/docs/sub/b.html",
    ]


def test_host_link_edges(spark):
    from vrod_spark.functions.url import host_link_edges

    rows = [
        ("http://a.com/1", '<a href="http://b.com/x">1</a><a href="/local">2</a>'),
        ("http://a.com/2", '<a href="http://b.com/y">3</a><a href="https://c.co.uk/z">4</a>'),
        ("http://b.com/1", '<a href="http://a.com/">5</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    edges = sorted(
        (r["src_domain"], r["dst_domain"])
        for r in host_link_edges(df, html_col="html", url_col="url").collect()
    )
    # self-loop a.com->a.com (the /local link) dropped; b.com edge deduped
    assert edges == [("a.com", "b.com"), ("a.com", "c.co.uk"), ("b.com", "a.com")]


def test_url_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([(1, "http://a.com/x")], "doc_id long, url string")
    plan = url_dedup(
        df.withColumn("dom", registered_domain(url_host(F.col("url"))))
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_search_facet_counts(spark, tmp_path):
    """SEARCH {"facet": key}: value counts of a meta key over the
    filtered rows, descending; rows without the key count under NULL."""
    from vrod_spark.engine import Engine

    eng = Engine.create(spark, str(tmp_path), "facetdb")
    eng.execute("CREATE", collection="docs")
    rows = [
        {"id": i, "embedding": [1.0], "payload": f"p{i}",
         "meta": ({"kind": "web"} if i % 3 else {"kind": "book"})}
        for i in range(9)
    ] + [{"id": 99, "embedding": [1.0], "payload": "x", "meta": {}}]
    eng.execute("INSERT", collection="docs", arg=rows)

    res = eng.execute(
        "SEARCH", collection="docs", arg={"where": "true", "facet": "kind"}
    ).df.collect()
    got = {r["value"]: r["n"] for r in res}
    assert got == {"web": 6, "book": 3, None: 1}
    assert res[0]["value"] == "web"  # descending count order

    filtered = eng.execute(
        "SEARCH", collection="docs",
        arg={"where": "id < 3", "facet": "kind", "limit": 1},
    ).df.collect()
    assert len(filtered) == 1 and filtered[0]["value"] == "web" and filtered[0]["n"] == 2


def test_blocklist_filter(spark):
    """C4-style bad-words page drop: token-level match (no substring
    false positives), case-insensitive, NULL text kept."""
    from vrod_spark.functions.text import blocklist_filter, blocklist_hit

    rows = [
        (1, "a perfectly clean document"),
        (2, "contains the word BADWORD here"),
        (3, "scunthorpe-style badwordish token stays"),  # substring, no hit
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"] for r in blocklist_filter(df, ["badword", "worse"]).collect()
    )
    assert kept == [1, 3, 4]
    hits = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", blocklist_hit("text", ["badword"]).alias("h")
        ).collect()
    }
    assert hits == {1: False, 2: True, 3: False, 4: None}


def test_filter_blocked_domains_input_with_dom_column(spark):
    """r11 review: a >256-entry blocklist joins on a frame-qualified
    reference — an input frame that itself has a 'dom' column must not
    make the join ambiguous."""
    from vrod_spark.functions.url import filter_blocked_domains

    df = spark.createDataFrame(
        [
            (0, "http://bad0.example/x", "decoy"),
            (1, "http://good.example/y", "decoy"),
        ],
        "id long, url string, dom string",
    )
    blocked = [f"bad{i}.example" for i in range(300)]
    kept = filter_blocked_domains(df, blocked).collect()
    assert [r["id"] for r in kept] == [1]
