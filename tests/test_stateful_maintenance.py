"""applyInPandasWithState operator, collection compaction, time travel."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vrod_spark.engine import Engine
from vrod_spark.sources.tables import load_table
from vrod_spark.streaming.ingest import run_to_completion
from vrod_spark.streaming.stateful import stateful_user_totals


def test_stateful_totals_across_microbatches(spark, tmp_path, sf_dir):
    """State must carry across micro-batches: split events into 3 files,
    stream with maxFilesPerTrigger=1, and the LAST emitted row per user
    must equal the batch ground truth."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    src = str(tmp_path / "src")
    events.withColumn("part", (F.col("event_id") % 3).cast("int")).write.partitionBy(
        "part"
    ).parquet(src)

    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/part=*")
    )
    out = run_to_completion(stateful_user_totals(stream), output_mode="update")
    # update mode re-emits a user's running total per touching batch; the
    # max per user is the final state.
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
        .collect()
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in final}
    want = {
        r["user_id"]: (r["n"], r["v"])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 4).alias("v"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6


def test_compaction_reduces_files_preserves_data(spark, tmp_path):
    eng = Engine.create(spark, str(tmp_path), "cdb")
    eng.execute("CREATE", collection="c")
    for i in range(6):  # 6 incremental appends → ≥6 delta files
        eng.execute(
            "INSERT",
            collection="c",
            arg=[{"id": i, "embedding": [float(i)], "payload": f"p{i}", "meta": None}],
        )
    col = eng.db.collection("c")
    before = sorted(r["id"] for r in col.read().collect())
    info = col.compact(target_partitions=1)
    assert info["files_after"] < info["files_before"]
    assert info["files_after"] == 1
    assert sorted(r["id"] for r in col.read().collect()) == before


def test_compact_zorder_multi_column_pruning(spark, tmp_path):
    """compact(zorder=[x, y]) lays files out as Morton blocks: parquet
    footer min/max stats are range-tight on BOTH columns at once, so a
    selective predicate on EITHER prunes most files — where a linear
    x-sort prunes x only and scans every file for a y predicate. Data
    parity is exact (plain COW rewrite)."""
    import pyarrow.parquet as pq

    eng = Engine.create(spark, str(tmp_path), "zdb")
    eng.db.create_collection("zc", schema="id bigint, x bigint, y bigint")
    eng.db.create_collection("lc", schema="id bigint, x bigint, y bigint")
    # Uniform 128x128 grid, insertion order uncorrelated with either axis.
    df = spark.range(16384).selectExpr(
        "id",
        "cast(id % 128 as bigint) AS x",
        "cast(pmod(hash(id), 128) as bigint) AS y",
    )
    eng.execute("BULKINSERT", collection="zc", arg=df)
    eng.execute("BULKINSERT", collection="lc", arg=df)

    zcol = eng.db.collection("zc")
    info = zcol.compact(target_partitions=16, zorder=["x", "y"])
    assert info["zorder"] == ["x", "y"]
    assert info["rows"] == 16384
    # Linear baseline: same file count, sorted on x only.
    lcol = eng.db.collection("lc")
    lcol._rewrite(
        lcol.read().repartitionByRange(16, "x").sortWithinPartitions("x"),
        "COMPACT",
    )

    def file_ranges(col_obj, name):
        out = []
        for f in col_obj._data_files(col_obj.version_dir()):
            md = pq.ParquetFile(f).metadata
            mn, mx = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == name and c.statistics is not None:
                        s = c.statistics
                        mn = s.min if mn is None else min(mn, s.min)
                        mx = s.max if mx is None else max(mx, s.max)
            out.append((mn, mx))
        return out

    def n_matching(ranges, lo, hi):
        return sum(1 for mn, mx in ranges if mn <= hi and mx >= lo)

    zx, zy = file_ranges(zcol, "x"), file_ranges(zcol, "y")
    lx, ly = file_ranges(lcol, "x"), file_ranges(lcol, "y")
    assert len(zx) == len(lx) == 16
    # A 1/8-of-axis box on either column: the z-layout scans a minority
    # of files on BOTH axes; the linear layout prunes x but must scan
    # EVERY file for the y predicate.
    assert n_matching(zx, 0, 15) <= 8
    assert n_matching(zy, 0, 15) <= 8
    assert n_matching(lx, 0, 15) <= 3
    assert n_matching(ly, 0, 15) == 16
    # COW parity: every row survives the clustered rewrite.
    assert zcol.read().count() == 16384
    assert (
        sorted(r.id for r in zcol.read().select("id").collect())
        == list(range(16384))
    )
    # Guardrails: bad column type / indexed snapshots are rejected loudly.
    import pytest

    from vrod_spark.operators.zorder import zorder_value

    with pytest.raises(ValueError):
        zorder_value(df.selectExpr("id", "cast(x as string) sx", "y"), ["sx", "y"])
    eng.execute("CREATE", collection="vc_idx")
    eng.execute(
        "INSERT",
        collection="vc_idx",
        arg=[
            {"id": i, "embedding": [float(i), 0.0], "payload": "p", "meta": None}
            for i in range(8)
        ],
    )
    eng.execute("REINDEX", collection="vc_idx", arg={"n_planes": 2})
    with pytest.raises(ValueError):
        eng.db.collection("vc_idx").compact(zorder=["id", "id"])


def test_time_travel_reads(spark, tmp_path):
    eng = Engine.create(spark, str(tmp_path), "ttdb")
    eng.execute("CREATE", collection="c")
    eng.execute(
        "INSERT", collection="c",
        arg=[{"id": 1, "embedding": [1.0], "payload": "one", "meta": None}],
    )
    col = eng.db.collection("c")
    v1 = col.version
    eng.execute("DELETE", collection="c", arg="id = 1")
    assert col.read().count() == 0
    assert col.read(version=v1).count() == 1  # history intact
    assert col.read(version=0).count() == 0  # the empty initial snapshot

    import pytest

    from vrod_spark.errors import CollectionNotFoundError

    with pytest.raises(CollectionNotFoundError):
        col.read(version=99)

    # after TRUNCATEWAL the history is reclaimed
    col.truncate_wal()
    with pytest.raises(CollectionNotFoundError):
        col.read(version=v1)


def test_time_travel_across_reindex(spark, tmp_path, sf_dir):
    eng = Engine.create(spark, str(tmp_path), "ttr")
    eng.execute("CREATE", collection="emb")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding",
        F.lit(None).cast("string").alias("payload"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )
    eng.execute("BULKINSERT", collection="emb", arg=emb)
    col = eng.db.collection("emb")
    v_plain = col.version
    eng.execute("REINDEX", collection="emb")
    v_indexed = col.version
    # both layouts readable with the same logical schema
    assert col.read(version=v_plain).columns == col.read(version=v_indexed).columns
    assert col.read(version=v_indexed).count() == 500


def test_compact_preserves_index(spark, tmp_path, sf_dir):
    """Compaction is maintenance: it must right-size files WITHOUT
    degrading the read path — the bucket layout, index meta, and histogram
    all survive, and pruned ANN search still works."""
    from tests.test_engine import records_df

    engine = Engine.create(spark, str(tmp_path), "compactdb")

    engine.execute("CREATE", collection="emb")
    engine.execute("BULKINSERT", collection="emb", arg=records_df(spark, sf_dir))
    engine.execute("REINDEX", collection="emb")
    col = engine.db.collection("emb")
    # Fragment: several appends → several delta files per bucket.
    for i in range(3):
        engine.execute(
            "INSERT",
            collection="emb",
            arg=[{"id": 20_000 + i, "embedding": [0.1 * (i + 1)] * 64, "payload": "d"}],
        )
    hist_before = dict(col.meta["index"]["histogram"])
    info = col.compact()
    assert info["files_after"] <= info["files_before"]
    meta = col.meta
    assert meta["index"] is not None and meta["index"]["histogram"] == hist_before
    assert {e for e in os.listdir(col.version_dir()) if e.startswith("bucket=")}
    qv = [0.1] * 64
    hit = engine.execute(
        "SEARCHSIMILAR", collection="emb", arg={"vector": qv, "k": 1}
    ).df.collect()
    assert [r["id"] for r in hit] == [20_000]
    assert col.read().count() == 503
    # r14: the indexed compact re-stamps the index to its own commit
    # (post-pointer-swap, so a crash before the re-stamp leaves the old
    # committed stamp — live either way), restoring live_index's
    # stamp==current fast path after maintenance.
    assert meta["index"]["version"] == col.version
    assert col.live_index() is not None


def test_compact_and_truncate_heal_stale_index_meta(spark, tmp_path):
    """Window-C debris (a killed REINDEX's index meta whose version
    stamp never committed — kill-produced end-to-end in
    test_mutation_crash_recovery; fabricated here for the maintenance
    surfaces): COMPACT must treat the collection as FLAT (not wedge on a
    missing bucket column) and clear the stale meta via its rewrite;
    TRUNCATEWAL re-stamps a LIVE index to the checkpoint version."""
    eng = Engine.create(spark, str(tmp_path), "healdb")
    eng.execute("CREATE", collection="c")
    for i in range(3):
        eng.execute("INSERT", collection="c",
                    arg=[{"id": i, "embedding": [float(i), 1.0], "payload": "p"}])
    col = eng.db.collection("c")
    # Fabricate the stale stamp: an index dict naming a version that was
    # never committed (the exact state a kill inside commit_staged_index
    # between update_meta and _commit leaves).
    col.update_meta(index={"kind": "sign_lsh", "n_planes": 2,
                           "planes": [[1.0, 0.0], [0.0, 1.0]],
                           "histogram": {"0": 3}, "version": col.version + 7})
    assert col.live_index() is None
    info = col.compact(target_partitions=1)
    assert info["rows"] == 3
    assert col.meta.get("index") is None, "compact must clear stale index meta"
    assert col.read().count() == 3

    # TRUNCATEWAL re-stamp of a LIVE index: reindex, append (stamp <
    # current), truncate — the stamp must move to the surviving
    # checkpoint version and stay live.
    eng.execute("REINDEX", collection="c", arg={"kind": "sign_lsh", "n_planes": 2})
    eng.execute("INSERT", collection="c",
                arg=[{"id": 10, "embedding": [9.0, 9.0], "payload": "d"}])
    assert col.meta["index"]["version"] < col.version
    eng.execute("TRUNCATEWAL", collection="c")
    assert col.meta["index"]["version"] == col.version
    assert col.live_index() is not None
    hit = eng.execute("SEARCHSIMILAR", collection="c",
                      arg={"vector": [9.0, 9.0], "k": 1}).df.collect()
    assert [r["id"] for r in hit] == [10]
