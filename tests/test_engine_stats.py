"""CBO statistics surface (SURVEY §4.2): ANALYZE after BULKINSERT/REINDEX,
stats visible in the session catalog and collection meta, and a plan test
proving the statistics actually change a planning decision (the q56-shape
filtered-dimension broadcast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vrod_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine.create(spark, str(tmp_path), "statsdb")


def test_bulkinsert_auto_analyzes(engine, spark):
    engine.execute("CREATE", collection="docs")
    df = spark.range(500).select(
        F.col("id"),
        F.array(F.rand(1).cast("float")).alias("embedding"),
        F.concat(F.lit("payload_"), (F.col("id") % 10).cast("string")).alias("payload"),
        F.create_map(F.lit("k"), (F.col("id") % 5).cast("string")).alias("meta"),
    )
    res = engine.execute("BULKINSERT", collection="docs", arg=df)
    assert res.info["rows"] == 500
    col = engine.db.collection("docs")
    stats = col.meta["stats"]
    # Stats are version-tagged and carry table + column granularity.
    assert stats["version"] == col.version
    assert "500 rows" in stats["statistics"]
    assert stats["columns"]["payload"]["distinct_count"] == "10"
    assert stats["columns"]["id"]["num_nulls"] == "0"
    # Array/map columns are excluded (ANALYZE FOR COLUMNS can't take them).
    assert "embedding" not in stats["columns"]
    assert "meta" not in stats["columns"]
    # The registration is catalog-visible with table-level statistics.
    tbl = col.analyzed_table_if_fresh(spark)
    assert tbl is not None
    desc = {r["col_name"]: r["data_type"] for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()}
    assert "rows" in desc["Statistics"]


def test_stats_go_stale_on_commit_and_refresh_on_analyze(engine, spark):
    engine.execute("CREATE", collection="docs")
    df = spark.range(100).select(
        F.col("id"),
        F.array(F.lit(0.5).cast("float")).alias("embedding"),
        F.lit("p").alias("payload"),
        F.create_map(F.lit("k"), F.lit("v")).alias("meta"),
    )
    engine.execute("BULKINSERT", collection="docs", arg=df)
    col = engine.db.collection("docs")
    assert col.analyzed_table_if_fresh(spark) is not None
    # A plain INSERT commits a new version without auto-analyze: stats are
    # stale and must NOT be used for planning.
    engine.execute(
        "INSERT",
        collection="docs",
        arg={"id": 1000, "embedding": [0.1], "payload": "x", "meta": {"k": "v"}},
    )
    assert col.analyzed_table_if_fresh(spark) is None
    # Explicit ANALYZE refreshes to the new version.
    res = engine.execute("ANALYZE", collection="docs")
    assert "101 rows" in res.info["statistics"]
    assert col.analyzed_table_if_fresh(spark) is not None


def test_cbo_stats_flip_broadcast_on_filtered_dim(engine, spark):
    """The q56 shape: fact JOIN dim with a selective dim filter. The dim's
    raw bytes exceed autoBroadcastJoinThreshold, so size-only planning
    sort-merge-joins; with ANALYZE stats + CBO, NDV-based selectivity
    proves the filtered dim is tiny and the plan broadcasts it."""
    import hashlib

    engine.execute("CREATE", collection="fact")
    engine.execute("CREATE", collection="dim")
    # Both sides keep multi-hundred-KB size-only estimates for the columns
    # the query actually reads (high-entropy strings defeat parquet
    # dictionary compression; the query aggregates the fact embeddings so
    # column pruning can't shrink that side away).
    fact = spark.range(100000).select(
        F.col("id"),
        F.array(*[F.rand(i).cast("float") for i in range(8)]).alias("embedding"),
        (F.col("id") % 8000).cast("string").alias("payload"),
        F.create_map(F.lit("k"), F.lit("v")).alias("meta"),
    )
    # dim payload is unique per row (NDV = rows), so CBO estimates an
    # equality filter at ~1 row; size-only estimation can't shrink it.
    dim = spark.range(30000).select(
        F.col("id"),
        F.array(F.rand(3).cast("float")).alias("embedding"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        F.create_map(F.lit("k"), F.lit("v")).alias("meta"),
    )
    engine.execute("BULKINSERT", collection="fact", arg=fact)
    engine.execute("BULKINSERT", collection="dim", arg=dim)

    key7 = hashlib.sha256(b"7").hexdigest()
    q = (
        "SELECT d.payload, sum(size(f.embedding)) AS n FROM fact f JOIN dim d "
        f"ON f.payload = CAST(d.id AS string) WHERE d.payload = '{key7}' "
        "GROUP BY d.payload"
    )
    threshold = 128 * 1024

    def plan(cbo: bool) -> str:
        session = spark.newSession()
        session.conf.set("spark.sql.autoBroadcastJoinThreshold", str(threshold))
        session.conf.set("spark.sql.cbo.enabled", str(cbo).lower())
        session.conf.set("spark.sql.cbo.joinReorder.enabled", str(cbo).lower())
        for name in ("fact", "dim"):
            col = engine.db.collection(name)
            assert col.analyzed_table_if_fresh(session) is not None
        session.catalog.setCurrentDatabase(
            engine.db.collection("dim").sql_namespace()
        )
        return session.sql(q)._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" not in plan(False)
    assert "BroadcastHashJoin" in plan(True)

    # And the engine's own SQL surface (CBO on + fresh stats) broadcasts.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(threshold))
    try:
        edf = engine.sql(q, "fact", "dim")
        eplan = edf._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in eplan
        assert edf.collect()[0]["n"] > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_analyze_partitioned_layouts(engine, spark):
    """bucket= (REINDEX) and pk= (partition_by) layouts register a
    partition-recovered data table + projecting view; the public name
    keeps the logical schema and row counts are exact."""
    engine.execute("CREATE", collection="vecs", arg={"dimension": 4})
    df = spark.range(200).select(
        F.col("id"),
        F.array(*[F.rand(i).cast("float") for i in range(4)]).alias("embedding"),
        F.lit("p").alias("payload"),
        F.create_map(F.lit("region"), (F.col("id") % 3).cast("string")).alias("meta"),
    )
    engine.execute("BULKINSERT", collection="vecs", arg=df)
    engine.execute("REINDEX", collection="vecs", arg={"n_planes": 3})
    col = engine.db.collection("vecs")
    stats = col.meta["stats"]
    assert stats["version"] == col.version and "200 rows" in stats["statistics"]
    tbl = col.analyzed_table_if_fresh(spark)
    assert tbl is not None
    out = spark.sql(f"SELECT count(*) AS n, count(DISTINCT id) AS d FROM {tbl}").first()
    assert (out["n"], out["d"]) == (200, 200)
    assert "bucket" not in spark.table(tbl).columns

    engine.execute("CREATE", collection="parts", arg={"partition_by": "region"})
    engine.execute("BULKINSERT", collection="parts", arg=df)
    colp = engine.db.collection("parts")
    tblp = colp.analyzed_table_if_fresh(spark)
    assert tblp is not None
    assert spark.sql(f"SELECT count(*) AS n FROM {tblp}").first()["n"] == 200
    assert "pk" not in spark.table(tblp).columns


def test_same_named_databases_do_not_collide_in_catalog(spark, tmp_path):
    """The session catalog is SparkContext-global: two databases that share
    a NAME must still register disjoint namespaces (path-hashed), or one
    engine's SQL could silently resolve against the other's files."""
    e1 = Engine.create(spark, str(tmp_path / "a"), "samedb")
    e2 = Engine.create(spark, str(tmp_path / "b"), "samedb")
    for eng, val in ((e1, "one"), (e2, "two")):
        eng.execute("CREATE", collection="docs")
        df = spark.range(3).select(
            F.col("id"),
            F.array(F.lit(0.5).cast("float")).alias("embedding"),
            F.lit(val).alias("payload"),
            F.create_map(F.lit("k"), F.lit("v")).alias("meta"),
        )
        eng.execute("BULKINSERT", collection="docs", arg=df)
    c1, c2 = e1.db.collection("docs"), e2.db.collection("docs")
    assert c1.sql_namespace() != c2.sql_namespace()
    t1, t2 = c1.analyzed_table_if_fresh(spark), c2.analyzed_table_if_fresh(spark)
    assert t1 is not None and t2 is not None and t1 != t2
    assert spark.table(t1).first()["payload"] == "one"
    assert spark.table(t2).first()["payload"] == "two"
    r1 = e1.sql("SELECT DISTINCT payload FROM docs", "docs").collect()
    r2 = e2.sql("SELECT DISTINCT payload FROM docs", "docs").collect()
    assert [r["payload"] for r in r1] == ["one"]
    assert [r["payload"] for r in r2] == ["two"]


def test_drop_unregisters_catalog_tables(engine, spark):
    engine.execute("CREATE", collection="docs")
    df = spark.range(5).select(
        F.col("id"),
        F.array(F.lit(0.5).cast("float")).alias("embedding"),
        F.lit("p").alias("payload"),
        F.create_map(F.lit("k"), F.lit("v")).alias("meta"),
    )
    engine.execute("BULKINSERT", collection="docs", arg=df)
    col = engine.db.collection("docs")
    tbl = col.analyzed_table_if_fresh(spark)
    assert tbl is not None and spark.catalog.tableExists(tbl)
    engine.execute("DROP", collection="docs")
    assert not spark.catalog.tableExists(tbl)


def test_cbo_stats_reorder_multi_join(engine, spark):
    """The q56 deep-join shape: with ANALYZE stats + CBO joinReorder, the
    optimizer MOVES the selectively-filtered dimension (NDV proves the
    equality filter hits ~1 row) ahead of the unfiltered one, shrinking
    the intermediate fact join; size-only planning keeps the written
    order. Pinned on the optimized logical plan's join tree: the subtree
    joined first prints before the later one."""
    import hashlib

    for name in ("fact", "d1", "d2"):
        engine.execute("CREATE", collection=name)
    fact = spark.range(100000).select(
        F.col("id"),
        F.array(*[F.rand(i).cast("float") for i in range(8)]).alias("embedding"),
        (F.col("id") % 8000).cast("string").alias("payload"),
        F.create_map(F.lit("k"), F.lit("v")).alias("meta"),
    )
    d1 = spark.range(20000).select(
        F.col("id"),
        F.array(F.rand(2).cast("float")).alias("embedding"),
        (F.col("id") % 9777).cast("string").alias("payload"),
        F.create_map(F.lit("k"), F.lit("v")).alias("meta"),
    )
    # d2 payload is unique per row (NDV = rows) -> CBO estimates the
    # equality filter at ~1 row and reorders it in front of d1.
    d2 = spark.range(30000).select(
        F.col("id"),
        F.array(F.rand(3).cast("float")).alias("embedding"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        F.create_map(F.lit("k"), F.lit("v")).alias("meta"),
    )
    engine.execute("BULKINSERT", collection="fact", arg=fact)
    engine.execute("BULKINSERT", collection="d1", arg=d1)
    engine.execute("BULKINSERT", collection="d2", arg=d2)

    key7 = hashlib.sha256(b"7").hexdigest()
    q = (
        "SELECT sum(size(f.embedding)) AS n FROM fact f "
        "JOIN d1 ON f.payload = CAST(d1.id AS string) "
        f"JOIN d2 ON f.payload = CAST(d2.id AS string) WHERE d2.payload = '{key7}'"
    )

    def join_order(cbo: bool) -> tuple[int, int]:
        session = spark.newSession()
        session.conf.set("spark.sql.cbo.enabled", str(cbo).lower())
        session.conf.set("spark.sql.cbo.joinReorder.enabled", str(cbo).lower())
        for name in ("fact", "d1", "d2"):
            assert engine.db.collection(name).analyzed_table_if_fresh(session) is not None
        session.catalog.setCurrentDatabase(engine.db.collection("d2").sql_namespace())
        plan = session.sql(q)._jdf.queryExecution().optimizedPlan().toString()
        return plan.find(".d1["), plan.find(".d2[")

    i1, i2 = join_order(False)
    assert 0 <= i1 < i2, "size-only planning keeps the written d1-then-d2 order"
    i1, i2 = join_order(True)
    assert 0 <= i2 < i1, "CBO joinReorder moves the filtered dim ahead of d1"
