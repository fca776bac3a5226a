"""The declared query corpus (SURVEY.md §2.4).

Every operator the engine claims is exercised here by a deterministic,
oracle-checkable query over the driver test tables. Each entry pairs a
Spark builder ``(spark, sf_dir) -> DataFrame`` with an equivalent ANSI-SQL
string the DuckDB oracle runs on the same parquet files.

Conventions (FIXTURES.md canonicalization):
- every computed column aliased identically in Spark and SQL;
- DOUBLE results rounded (money → 2dp, ratios/distances → 4dp) on both
  sides so hash comparison is stable across summation orders;
- every query ends with ORDER BY carrying a unique-key tiebreaker;
- top-k orders by the *unrounded* score (rounded copy projected) so the
  selected set is identical on both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vrod_spark.functions.vector import vector_lit
from vrod_spark.operators.knn import knn_per_group
from vrod_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation: TPC-H-Q1-style pricing summary over lineitem.
# Exercises: scan + filter pushdown, partial/final hash aggregate, multi-agg,
# order by. At scale: map-side combine makes the shuffle O(groups), not O(rows).
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Star-schema join: revenue by nation/region. Exercises: multi-way equi-join
# with broadcast dims, join reordering, grouped agg. At scale: region/nation/
# supplier/customer are tiny vs lineitem — every dim joins broadcast-hash, so
# the only shuffle is the final groupBy on a low-cardinality key.
# ---------------------------------------------------------------------------
@query(
    "q02_revenue_by_nation",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# Top-k global sort: SEARCH-style filter + ORDER BY ... LIMIT. Catalyst plans
# TakeOrderedAndProject — per-partition heaps, no global sort.
# ---------------------------------------------------------------------------
@query(
    "q03_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderstatus = 'O'
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Window ranking: per-customer order ranking (row_number / rank / dense_rank).
# One shuffle on the partition key; ranking runs within partitions.
# ---------------------------------------------------------------------------
@query(
    "q04_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, total, rn, rnk, drnk
    FROM (
      SELECT o_custkey, o_orderkey,
             round(o_totalprice, 2) AS total,
             row_number() OVER w AS rn,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q04_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# kNN exact (the flagship — SEARCHSIMILAR, builder.rs:68-72): L2 distance to
# the vec_id=0 query vector, top-10. Ordered by unrounded distance with id
# tiebreak; TakeOrderedAndProject at any scale.
# ---------------------------------------------------------------------------
_KNN_ORACLE_L2 = """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_distance(e.embedding::DOUBLE[], q.qv), 4) AS dist
    FROM embeddings e CROSS JOIN q
    ORDER BY list_distance(e.embedding::DOUBLE[], q.qv), e.vec_id
    LIMIT 10
"""


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


@query("q05_knn_l2", oracle=_KNN_ORACLE_L2)
def q05_knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vrod_spark.functions.vector import l2_distance

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    dist = l2_distance("embedding", vector_lit(qv))
    return (
        emb.select("vec_id", dist.alias("_d"))
        .orderBy(F.col("_d").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("_d", 4).alias("dist"))
    )


@query(
    "q06_knn_cosine",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4) AS dist
    FROM embeddings e CROSS JOIN q
    ORDER BY 1.0 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv), e.vec_id
    LIMIT 10
    """,
)
def q06_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vrod_spark.functions.vector import cosine_distance

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    dist = cosine_distance("embedding", vector_lit(qv))
    return (
        emb.select("vec_id", dist.alias("_d"))
        .orderBy(F.col("_d").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("_d", 4).alias("dist"))
    )


# ---------------------------------------------------------------------------
# Grouped kNN: top-3 nearest per label (window top-k pattern).
# ---------------------------------------------------------------------------
@query(
    "q07_knn_per_label",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.label, e.vec_id,
             list_distance(e.embedding::DOUBLE[], q.qv) AS d
      FROM embeddings e CROSS JOIN q
    )
    SELECT label, vec_id, round(d, 4) AS dist
    FROM (
      SELECT label, vec_id, d,
             row_number() OVER (PARTITION BY label ORDER BY d, vec_id) AS rn
      FROM scored
    )
    WHERE rn <= 3
    ORDER BY label, d, vec_id
    """,
)
def q07_knn_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    res = knn_per_group(emb, qv, k=3, group_col="label", dist_alias="_d")
    return res.select("label", "vec_id", F.round("_d", 4).alias("dist"))


# ---------------------------------------------------------------------------
# Exact dedup (LLM-pipeline): sha2 fingerprint of normalized text, keep-first
# per fingerprint, count dupes. Map-side hash then one shuffle on the digest.
# ---------------------------------------------------------------------------
@query(
    "q08_dedup_exact_summary",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           count(DISTINCT sha256(lower(trim(text)))) AS n_unique,
           count(*) - count(DISTINCT sha256(lower(trim(text)))) AS n_dupes
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q08_dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    fp = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    return (
        docs.select("lang", fp.alias("fp"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dupes"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Keep-first exact dedup: one surviving doc_id per normalized-text
# fingerprint (the DELETE-dupes mechanism). One shuffle on the digest.
# ---------------------------------------------------------------------------
@query(
    "q08b_dedup_keep_first",
    oracle="""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY sha256(lower(trim(text)))
    ORDER BY doc_id
    """,
)
def q08b_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    fp = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    return (
        docs.groupBy(fp.alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .drop("fp")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Text analysis: per-(lang, source) corpus stats — doc counts, char totals,
# whitespace token counts. All JVM-side expressions over documents.
# ---------------------------------------------------------------------------
@query(
    "q09_text_stats",
    oracle="""
    SELECT lang, source,
           count(*)                                            AS n_docs,
           sum(n_chars)                                        AS total_chars,
           round(avg(n_chars), 4)                              AS avg_chars,
           sum(length(text) - length(replace(text, ' ', '')) + 1) AS total_tokens
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def q09_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tokens = F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", "")) + 1
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum(tokens).alias("total_tokens"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# Semi/anti join: customers with and without open orders. Anti-join is also
# the DELETE mechanism (SURVEY §2.1 row 8).
# ---------------------------------------------------------------------------
@query(
    "q10_semi_anti",
    oracle="""
    SELECT 'with_open_orders' AS bucket, count(*) AS n FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'no_orders' AS bucket, count(*) AS n FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY bucket
    """,
)
def q10_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    with_open = (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_open_orders").alias("bucket"), "n")
    )
    without = (
        cust.join(orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("no_orders").alias("bucket"), "n")
    )
    return with_open.unionByName(without).orderBy("bucket")


# ---------------------------------------------------------------------------
# Date/time + conditional functions over orders.
# ---------------------------------------------------------------------------
@query(
    "q11_date_buckets",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT)  AS yr,
           CAST(month(o_orderdate) AS INT) AS mth,
           count(*) AS n_orders,
           round(sum(CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
                          THEN o_totalprice ELSE 0 END), 2) AS urgent_value,
           round(sum(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY yr, mth
    ORDER BY yr, mth
    """,
)
def q11_date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    urgent = F.when(
        F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"),
        F.col("o_totalprice"),
    ).otherwise(F.lit(0.0))
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mth")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(urgent), 2).alias("urgent_value"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .orderBy("yr", "mth")
    )


# ---------------------------------------------------------------------------
# JSON + events: parse props, filter by event_type, hourly tumbling buckets
# (batch analog of the streaming window agg).
# ---------------------------------------------------------------------------
@query(
    "q12_events_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value,
           sum(CAST(json_extract_string(props, '$.k') AS INT)) AS sum_k
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY hour_start, event_type
    ORDER BY hour_start, event_type
    """,
)
def q12_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
        )
        .orderBy("hour_start", "event_type")
    )
