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
