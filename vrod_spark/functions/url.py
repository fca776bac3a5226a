"""URL curation functions for web-corpus pipelines.

Web-scale training corpora (Common Crawl shape — see sources/warc.py,
which surfaces a ``url`` column per WARC response record) are curated by
URL before any text ever decodes: normalize the URL, dedup fetches of
the same logical page, group quality stats by registered domain, drop
blocklisted domains. The reference's surface has no URL notion
(north-star [N] extension; the collection data model carries it in
``meta`` — SURVEY.md §1.3), so everything here is the standard public
recipe (C4 / CCNet-style URL keying) expressed as pure Catalyst
expressions: regexp + split + array ops, all whole-stage codegen, no
Python in the hot path, no shuffle. At 100 TB the normalize/domain
steps are per-row map work; the dedup is one digest-keyed shuffle of
(16-byte key, id) pairs — document text never moves.

Normalization spec (deterministic, engine-independent — the DuckDB
oracle leg re-implements it in SQL):

1. trim; strip the fragment (``#…``);
2. lowercase scheme and host;
3. drop a default port (``:80`` for http, ``:443`` for https);
4. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``) and sort the survivors bytewise;
5. drop a trailing ``/`` from a non-root path; empty path → ``/``.

``registered_domain`` applies a public-suffix-LITE rule: last two host
labels, or last three when the last two are a well-known multi-part
suffix (co.uk, com.au, …). Real deployments swap in the full Mozilla
public-suffix list (a broadcast map); the mechanism — label split +
suffix-set membership, pure codegen — is what matters here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from vrod_spark.functions.memo import memo_column
from pyspark.sql import functions as F

#: Query-param names (prefix match for utm_) that never change page
#: identity — the standard tracking-param strip set.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"

#: Multi-part public suffixes for the LITE registered-domain rule.
MULTI_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.nz", "co.za",
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


@memo_column
def url_scheme(url: Column | str) -> Column:
    """Lowercased scheme, '' when absent."""
    return F.lower(F.regexp_extract(F.trim(_c(url)), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


@memo_column
def url_host(url: Column | str) -> Column:
    """Lowercased host with any port / userinfo / fragment removed."""
    hostport = F.regexp_extract(F.trim(_c(url)), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    no_user = F.regexp_replace(hostport, r"^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, r":[0-9]*$", ""))


@memo_column
def url_path(url: Column | str) -> Column:
    """Path component (case preserved — paths are case-significant)."""
    return F.regexp_extract(F.trim(_c(url)), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)


@memo_column
def url_query(url: Column | str) -> Column:
    """Raw query string without the '?', '' when absent. The fragment is
    stripped FIRST: an unanchored ``\\?`` scan would otherwise resurrect
    a '?' living INSIDE the fragment ('/a#x?b=1' is the page '/a', not
    '/a?b=1') and fuse distinct pages downstream."""
    nofrag = F.regexp_replace(F.trim(_c(url)), r"#.*", "")
    return F.regexp_extract(nofrag, r"\?(.*)", 1)


@memo_column
def url_normalize(url: Column | str) -> Column:
    """Canonical URL per the module-header spec. NULL in → NULL out;
    a non-URL string (no scheme://host) normalizes to NULL rather than
    a half-parsed key, so malformed rows never alias a real page."""
    u = F.trim(_c(url))
    scheme = url_scheme(u)
    host = url_host(u)
    hostport = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    no_user = F.regexp_replace(hostport, r"^[^@]*@", "")
    port = F.regexp_extract(no_user, r":([0-9]+)$", 1)
    default_port = F.when(
        (scheme == "http") & (port == "80"), F.lit(True)
    ).when((scheme == "https") & (port == "443"), F.lit(True)).otherwise(F.lit(False))
    host_out = F.when(default_port | (port == ""), host).otherwise(
        F.concat(host, F.lit(":"), port)
    )

    raw_path = url_path(u)
    # trailing-slash strip on non-root; empty → '/'
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(raw_path) > 1) & raw_path.endswith("/"),
            raw_path.substr(F.lit(1), F.length(raw_path) - 1),
        ).otherwise(raw_path)
    )

    q = url_query(u)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    q_out = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(F.lit(""))

    norm = F.concat(scheme, F.lit("://"), host_out, path, q_out)
    return F.when((scheme == "") | (host == ""), F.lit(None).cast("string")).otherwise(norm)


@memo_column
def registered_domain(host: Column | str) -> Column:
    """Public-suffix-LITE registrable domain of a (already lowercased)
    host: last 2 labels, or last 3 when the last 2 are a multi-part
    suffix. Hosts with <2 labels (``localhost``) pass through as-is."""
    h = _c(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    take3 = last2.isin(*MULTI_SUFFIXES) & (n >= 3)
    return (
        F.when(n <= 1, h)
        .when(
            take3,
            F.concat_ws(
                ".",
                F.element_at(labels, -3),
                F.element_at(labels, -2),
                F.element_at(labels, -1),
            ),
        )
        .otherwise(last2)
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Keep-first (lowest id) per normalized URL; rows whose URL fails to
    normalize (NULL key) are all kept — a malformed URL is no evidence
    two fetches are the same page. One shuffle on a 16-byte digest of the
    normalized key; the full URL string never moves."""
    from pyspark.sql import Window

    key = F.md5(url_normalize(F.col(url_col)))
    w = Window.partitionBy(F.coalesce(key, F.concat(F.lit("\x00"), F.col(id_col).cast("string")))).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


#: href attribute of an <a> tag, single- or double-quoted. Group 1 is the
#: link target. Pure-fragment links (href="#top") are excluded up front.
HREF_RE = r"""(?i)<a\s[^>]*href\s*=\s*["']([^"'#][^"']*)["']"""


def extract_links(html: Column | str, base_url: Column | str) -> Column:
    """Absolute outlink URLs from an HTML string — the link-graph signal
    web-corpus curation runs on (domain in/out-degree, spam clusters).

    Pure codegen: one ``regexp_extract_all`` + array ``transform``; no
    Python, no shuffle. Resolution subset (documented, tested):

    - ``http(s)://…``  kept as-is;
    - ``//host/…``     protocol-relative → base scheme;
    - ``/path``        root-relative → base ``scheme://host`` + path;
    - ``dir-relative`` resolved against the base URL's directory WITHOUT
      dot-segment collapse (``..`` is left literal — rare in real href
      attributes and never ambiguous for graph purposes);
    - other schemes (``mailto:``, ``javascript:``, …) dropped.

    Results are NOT normalized — compose with ``url_normalize`` so the
    graph keys match the document keys."""
    h = _c(html)
    base = _c(base_url)
    scheme = url_scheme(base)
    host = url_host(base)
    raw_path = url_path(base)
    base_dir = F.when(
        raw_path.rlike("/"), F.regexp_replace(raw_path, r"/[^/]*$", "/")
    ).otherwise(F.lit("/"))
    origin = F.concat(scheme, F.lit("://"), host)
    hrefs = F.regexp_extract_all(h, F.lit(HREF_RE), F.lit(1))

    def resolve(link: Column) -> Column:
        return (
            F.when(link.rlike(r"^(?i)https?://"), link)
            .when(link.startswith("//"), F.concat(scheme, F.lit(":"), link))
            .when(link.startswith("/"), F.concat(origin, link))
            # any other explicit scheme: drop
            .when(link.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:"), F.lit(None))
            .otherwise(F.concat(origin, base_dir, link))
        )

    return F.filter(F.transform(hrefs, resolve), lambda x: x.isNotNull())


def host_link_edges(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Distinct (src_domain, dst_domain) registered-domain edges from a
    corpus of (url, html) pages — input for link-graph analytics (degree
    stats, connected components, spam-cluster detection). Self-loops are
    dropped. One explode + one distinct; HTML never shuffles (links are
    extracted before the exchange)."""
    src = registered_domain(url_host(F.col(url_col)))
    links = extract_links(F.col(html_col), F.col(url_col))
    dst = registered_domain(url_host(F.col("link")))
    return (
        df.select(src.alias("src_domain"), F.explode(links).alias("link"))
        .select("src_domain", dst.alias("dst_domain"))
        .filter(
            # both endpoints must be real domains: a page whose own URL
            # is unparseable has src_domain '' and would otherwise emit
            # phantom ''-source edges into degree/component analytics
            F.col("src_domain").isNotNull()
            & (F.col("src_domain") != "")
            & F.col("dst_domain").isNotNull()
            & (F.col("dst_domain") != "")
            & (F.col("src_domain") != F.col("dst_domain"))
        )
        .distinct()
    )


def filter_blocked_domains(
    df: DataFrame, blocked: list[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted. For list-sized
    blocklists this is a codegen isin; swap in a broadcast left-anti
    join when the blocklist is a table (same semantics, one broadcast)."""
    dom = registered_domain(url_host(F.col(url_col)))
    if len(blocked) <= 256:
        return df.filter(~F.coalesce(dom.isin(*blocked), F.lit(False)))
    spark = df.sparkSession
    # Collision-proof blocklist column name + a frame-qualified
    # reference: a bare F.col("dom") was ambiguous (or resolved to the
    # wrong side) whenever the INPUT frame also had a 'dom' column —
    # surfacing only past the 256-entry isin cutoff (r11 review).
    bl = spark.createDataFrame([(b,) for b in blocked], "__vr_blocked_dom string")
    return df.join(
        F.broadcast(bl), dom == bl["__vr_blocked_dom"], "left_anti"
    )
