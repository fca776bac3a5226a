"""Parquet sources for the driver-generated test tables.

One parquet file per table under an sf-dir (see TESTDATA.md). Reads are
plain ``spark.read.parquet`` so Catalyst gets full predicate pushdown,
column pruning and (on partitioned layouts) partition pruning for free.
"""

from __future__ import annotations

import os
import threading
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


# Per-session DataFrame catalog: `spark.read.parquet` does driver-side file
# listing + footer schema read on every call, a fixed ~50 ms tax each query
# pays again for the same immutable table. DataFrames are immutable logical
# plans, so reusing one per (session, sf_dir, table) is safe and makes
# repeated `load_table` calls free — the catalog role a real engine's
# metastore plays. Keyed weakly on the session so a stopped session's plans
# are collectable and a fresh session never sees stale entries.
_CATALOG: WeakKeyDictionary = WeakKeyDictionary()

#: Guards catalog population AND the nanosAsLong conf toggle inside
#: ``_load_events``: the bench runs queries concurrently on one shared
#: session, and an unguarded save-toggle-restore of session conf from two
#: threads can restore mid-toggle state (ADVICE r1). Serializing the (rare,
#: once-per-table) cache misses removes the race; cache hits stay lock-free
#: after the dict read barrier.
_LOCK = threading.RLock()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    key = (os.path.abspath(sf_dir), name)
    # Double-checked: hot hits read the dict lock-free (CPython dict
    # reads are atomic; the design the _LOCK comment documents — r11
    # review found every hit serializing behind the miss lock, queueing
    # concurrent query builds behind one cold events footer probe).
    cache = _CATALOG.get(spark)
    if cache is not None:
        df = cache.get(key)
        if df is not None:
            return df
    with _LOCK:
        cache = _CATALOG.setdefault(spark, {})
        if key not in cache:
            path = os.path.join(sf_dir, f"{name}.parquet")
            cache[key] = (
                _load_events(spark, path) if name == "events" else spark.read.parquet(path)
            )
        return cache[key]


def project_events_raw(raw: DataFrame) -> DataFrame:
    """Shared events projection (batch + streaming), schema-adaptive: the
    driver's generated ``events.ts`` has shipped both as parquet
    TIMESTAMP(NANOS) (read as epoch-nanos LONG via ``nanosAsLong``) and as
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Either way, expose

    - ``ts``    — micros TIMESTAMP_NTZ wall clock (matches the oracle's
      TZ-naive rendering), and
    - ``ts_ns`` — exact epoch nanos LONG (matches DuckDB ``epoch_ns``),

    both via pure wall-clock arithmetic with no session-time-zone
    dependence (the driver's session may not pin UTC)."""
    from pyspark.sql import functions as F

    ts_type = dict(raw.dtypes)["ts"]
    ns_col = None
    if ts_type == "bigint":
        ns_col = "ts"  # legacy layout: ts is epoch nanos already
    elif ts_type == "timestamp":
        # Instant read (inferTimestampNTZ off): unix_micros is TZ-free for
        # instants, so normalize to epoch nanos and rebuild the UTC wall
        # clock by integer arithmetic below. (Casting instant→NTZ through
        # the session zone would misrender the repeated DST hour.)
        raw = raw.withColumn("__ns", F.unix_micros(F.col("ts")) * F.lit(1000))
        ns_col = "__ns"
    if ns_col is not None:
        # FLOOR division/modulo, not div/% (which truncate toward zero
        # and keep the dividend's sign): pre-1970 nanos otherwise yield
        # a negative remainder and make_timestamp_ntz throws
        # DATETIME_FIELD_OUT_OF_BOUNDS under ANSI mode (r11 review).
        # pmod is always non-negative; subtracting it before div gives
        # exact floor semantics in pure bigint arithmetic (the values
        # exceed 2^53, so double-based floor() would lose precision).
        us = f"(({ns_col}) - pmod({ns_col}, 1000)) div 1000"
        rem = f"pmod({us}, 86400000000)"
        d = F.date_add(
            F.lit("1970-01-01").cast("date"),
            F.expr(f"cast((({us}) - ({rem})) div 86400000000 as int)"),
        )
        rem_us = F.expr(rem)
        ts_ntz = F.make_timestamp_ntz(
            F.year(d),
            F.month(d),
            F.dayofmonth(d),
            (rem_us / F.lit(3600000000)).cast("int"),
            ((rem_us % 3600000000) / F.lit(60000000)).cast("int"),
            ((rem_us % 60000000) / F.lit(1000000.0)).cast("decimal(16,6)"),
        )
        ts_ns = F.col(ns_col)
    else:
        ts_ntz = F.col("ts")
        # Wall-clock micros since epoch from FIELD decomposition — every
        # piece (to_date/hour/minute/second on NTZ) is wall-clock and
        # session-TZ-free by construction. timestamp_diff would implicitly
        # cast NTZ→LTZ through the session zone, which only cancels while
        # both endpoints share one UTC offset — a DST-era mismatch between
        # 1970 and the event date would skew every ts_ns. Widened to nanos
        # so ts_ns consumers and the DuckDB epoch_ns oracle agree exactly.
        days = F.datediff(F.to_date(ts_ntz), F.lit("1970-01-01").cast("date")).cast(
            "long"
        )
        secs = (
            days * 86400
            + F.hour(ts_ntz).cast("long") * 3600
            + F.minute(ts_ntz).cast("long") * 60
        )
        ts_ns = (
            secs * 1_000_000
            + (F.extract(F.lit("SECOND"), ts_ntz) * 1_000_000).cast("long")
        ) * 1000
    return raw.select(
        "event_id",
        ts_ntz.alias("ts"),
        ts_ns.alias("ts_ns"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def events_ts_is_nanos_long(spark: SparkSession, sf_dir: str) -> bool:
    """True when this sf-dir's events.ts needs the legacy ``nanosAsLong``
    read (parquet TIMESTAMP(NANOS)); False for the micros/NTZ layout.
    Footer-only probe, cached with the table catalog."""
    path = os.path.join(sf_dir, "events.parquet")
    try:
        probed = spark.read.parquet(path)
    except Exception:
        return True  # NANOS without the conf fails to resolve
    return dict(probed.dtypes).get("ts") not in ("timestamp_ntz", "timestamp")


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Read events whatever vintage its ts column is (see
    ``project_events_raw``), then apply the shared projection."""
    if not events_ts_is_nanos_long(spark, os.path.dirname(path)):
        return project_events_raw(spark.read.parquet(path))
    # Set-and-LEAVE, never save-toggle-restore (r11 review): the
    # streaming reader (streaming/ingest.events_stream) needs this conf
    # to persist for its query's whole lifetime, so a batch load
    # restoring "false" here raced every in-flight nanos stream into
    # PARQUET_TYPE_ILLEGAL. Monotonic true-only writes cannot race, and
    # the conf only affects TIMESTAMP(NANOS) parquet columns — which no
    # other table ships.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return project_events_raw(spark.read.parquet(path))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
