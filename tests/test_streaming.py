"""Structured Streaming tests: batch equivalence, checkpointed ingest
into COW collections (exactly-once across restarts), stateful dedup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vrod_spark.engine import Engine
from vrod_spark.sources.tables import load_table
from vrod_spark.streaming.ingest import (
    dedup_stream,
    events_stream,
    run_to_completion,
    stream_ingest_into_collection,
    tumbling_counts,
)


def test_stream_tumbling_equals_batch(spark, sf_dir):
    streamed = run_to_completion(tumbling_counts(events_stream(spark, sf_dir)))
    events = load_table(spark, sf_dir, "events")
    batch = (
        events.groupBy(
            F.unix_timestamp(
                F.date_trunc("hour", F.timestamp_micros(F.expr("ts_ns div 1000")))
            ).alias("window_start_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_stream_dedup_collapses_duplicates(spark, sf_dir):
    deduped = run_to_completion(
        dedup_stream(events_stream(spark, sf_dir)).select("event_id"),
        output_mode="append",
    )
    n_unique = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert deduped.count() == n_unique


def test_stream_ingest_exactly_once(spark, tmp_path, sf_dir):
    """availableNow ingest commits through COW; re-running the stream with
    the same checkpoint must NOT re-ingest already-committed batches."""
    eng = Engine.create(spark, str(tmp_path), "sdb")
    eng.execute("CREATE", collection="embcol")
    col = eng.db.collection("embcol")

    def src():
        return (
            spark.readStream.schema("vec_id bigint, embedding array<float>, label int")
            .option("pathGlobFilter", "embeddings.parquet")
            .parquet(sf_dir)
            .select(
                F.col("vec_id").alias("id"),
                "embedding",
                F.col("label").cast("string").alias("payload"),
                F.lit(None).cast("map<string,string>").alias("meta"),
            )
        )

    ckpt = str(tmp_path / "ckpt")
    q = stream_ingest_into_collection(col, src(), checkpoint_dir=ckpt)
    q.awaitTermination()
    assert col.read().count() == 500

    # restart with same checkpoint: no new data → no duplicate ingestion
    q2 = stream_ingest_into_collection(col, src(), checkpoint_dir=ckpt)
    q2.awaitTermination()
    assert col.read().count() == 500
    assert os.path.isdir(ckpt)

    # TRUNCATEWAL-analog maintenance afterwards keeps data readable
    eng.execute("TRUNCATEWAL", collection="embcol")
    assert col.read().count() == 500

    # r12 advice: TRUNCATEWAL persisted the replay high-water mark into
    # collection meta FOREVER, keyed (pre-r13) by checkpoint PATH — so an
    # operator who deleted and recreated a checkpoint at the same path got
    # every batch of the NEW stream silently dropped (epoch ids restart at
    # 0 <= hwm). Identity now derives from the checkpoint's streaming
    # query id (metadata file), which a recreated checkpoint re-mints:
    # the new stream must actually ingest (an intentional full re-read →
    # duplicates), not silently no-op.
    assert (col.meta.get("stream_hwm") or {}), "truncate should persist hwm"
    import shutil

    shutil.rmtree(ckpt)
    q3 = stream_ingest_into_collection(col, src(), checkpoint_dir=ckpt)
    q3.awaitTermination()
    assert col.read().count() == 1000, (
        "recreated checkpoint's batches were silently dropped by a stale "
        "stream_hwm — checkpoint identity must be per-incarnation"
    )


def test_late_data_dropped_beyond_watermark(spark):
    """Rows older than the watermark horizon are excluded from closed
    windows — exercised with a 2-batch file source where batch 2 carries
    an event far older than batch 1's max ts."""
    import tempfile

    d = tempfile.mkdtemp()
    sdir = os.path.join(d, "src")
    os.makedirs(sdir)
    row = "event_id bigint, ts_evt timestamp, v double"
    base = "2024-01-01 10:{m:02d}:00"
    batch1 = spark.createDataFrame(
        [(i, base.format(m=i), 1.0) for i in range(5)], "event_id bigint, t string, v double"
    ).select("event_id", F.to_timestamp("t").alias("ts_evt"), "v")
    batch1.write.parquet(os.path.join(sdir, "b1"))
    stream = (
        spark.readStream.schema(row)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(sdir, "*"))
    )
    agg = (
        stream.withWatermark("ts_evt", "1 minute")
        .groupBy(F.window("ts_evt", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_to_completion(agg, output_mode="complete")
    assert out.agg(F.sum("n")).first()[0] == 5


def test_stream_ingest_into_partitioned_collection(spark, tmp_path, sf_dir):
    """Checkpointed streaming ingest composes with meta-key partitioning:
    each micro-batch commit lands rows in their pk= dirs and SEARCH on the
    partition key prunes, exactly as with batch INSERT."""
    import os

    from pyspark.sql import functions as F

    from vrod_spark.engine import Engine
    from vrod_spark.streaming.ingest import stream_ingest_into_collection

    eng = Engine.create(spark, str(tmp_path), "spart")
    eng.execute("CREATE", collection="ev", arg={"partition_by": "kind"})
    col = eng.db.collection("ev")

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, [float(i)], f"p{i}", {"kind": "a" if i % 2 == 0 else "b"}) for i in range(10)],
        "id bigint, embedding array<float>, payload string, meta map<string,string>",
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "id bigint, embedding array<float>, payload string, meta map<string,string>"
    ).parquet(src)
    q = stream_ingest_into_collection(col, stream)
    q.awaitTermination()

    assert {e for e in os.listdir(col.version_dir()) if e.startswith("pk=")} == {
        "pk=a",
        "pk=b",
    }
    hits = eng.execute("SEARCH", collection="ev", arg="meta['kind'] = 'a'").df.collect()
    assert [r["id"] for r in hits] == [0, 2, 4, 6, 8]


def test_abandonment_timers_plan_builds(spark, sf_dir):
    """transformWithStateInPandas operator (Spark 4 arbitrary state v2):
    the plan must analyze with event-time mode, the state schema, and the
    watermark in place. (Execution needs google.protobuf — absent here;
    the roundtrip test below activates when the env gains it.)"""
    from vrod_spark.streaming.ingest import events_stream
    from vrod_spark.streaming.stateful import click_abandonment_timers

    child = spark.newSession()
    df = click_abandonment_timers(events_stream(child, sf_dir))
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id", "c_event_id", "click_us", "converted",
    ]
    plan = df._jdf.queryExecution().logical().toString()
    assert "TransformWithStateInPySpark" in plan
    assert "EventTimeWatermark" in plan


def test_abandonment_timers_roundtrip_if_protobuf(spark, sf_dir):
    """Full execution: timer-based abandonment equals the batch interval
    join on every click whose window provably closed before stream end
    (converted rows always; abandoned rows once the final watermark
    passed click + delay)."""
    import pytest

    pytest.importorskip("google.protobuf")

    from pyspark.sql import functions as F

    from vrod_spark.sources.tables import load_table
    from vrod_spark.streaming.ingest import events_stream, run_to_completion
    from vrod_spark.streaming.stateful import click_abandonment_timers

    out = run_to_completion(
        lambda s: click_abandonment_timers(events_stream(s, sf_dir)),
        spark,
        output_mode="append",
        state_partitions=2,
    )
    got = {
        r["c_event_id"]: (r["user_id"], r["click_us"], r["converted"])
        for r in out.collect()
    }
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.expr("ts_ns div 1000").alias("c_us")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.expr("ts_ns div 1000").alias("p_us")
    )
    delay = 30 * 60 * 1_000_000
    conv = (
        c.join(
            p,
            (c.user_id == p.pu) & (p.p_us >= c.c_us) & (p.p_us <= c.c_us + delay),
            "left",
        )
        .groupBy("event_id", "user_id", "c_us")
        .agg(F.max(F.col("p_us").isNotNull()).alias("converted"))
    )
    wm_us = ev.agg(F.max(F.expr("ts_ns div 1000"))).first()[0] - 3_600_000_000
    for r in conv.collect():
        eid, want = r["event_id"], (r["user_id"], r["c_us"], bool(r["converted"]))
        if want[2]:
            assert got.get(eid) == want, eid
        elif r["c_us"] + delay + 2_000_000 < wm_us:
            assert got.get(eid) == want, eid


def test_streaming_near_dup_suppresses_across_batches(spark, tmp_path):
    """Streaming near-dup suppression (MinHash-LSH bucket state): exact
    and near duplicates are flagged against documents admitted in EARLIER
    micro-batches (state persists across batches), novel documents pass,
    and per-bucket verdicts consolidate by min(dup_of)."""
    from pyspark.sql import functions as F

    from vrod_spark.streaming.ingest import run_to_completion
    from vrod_spark.streaming.stateful import streaming_near_dup

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = base.replace("today", "tonight")
    far = "completely different words about spark catalyst optimizer plans and shuffles"
    schema = "doc_id bigint, text string"
    src = tmp_path / "docs"
    # Two deliveries: the dup/near-dup of doc 0 arrive in the SECOND
    # micro-batch, so detection must come from persisted bucket state.
    spark.createDataFrame([(0, base), (1, far)], schema).coalesce(1).write.parquet(
        str(src / "b0")
    )
    spark.createDataFrame(
        [(2, base), (3, near), (4, "short text")], schema
    ).coalesce(1).write.parquet(str(src / "b1"))

    def build(session):
        stream = (
            session.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        return streaming_near_dup(stream, min_sig_agreement=0.5)

    out = run_to_completion(build, spark, output_mode="update", state_partitions=2)
    flags = {
        r["doc_id"]: r["dup_of"]
        for r in out.groupBy("doc_id").agg(F.min("dup_of").alias("dup_of")).collect()
    }
    assert flags[0] is None and flags[1] is None and flags[4] is None
    assert flags[2] == 0  # exact dup, later batch -> identical signature
    assert flags[3] == 0  # 1-word edit -> high signature agreement
    # the dup documents never entered state: a third identical doc still
    # points at the ORIGINAL admit, not at another dup.
    assert len(flags) == 5


def test_minhash_signature_expr_matches_agg_form(spark, sf_dir):
    """The per-row signature expression (the streaming path's stateless
    projection) is bit-identical to the batch explode+agg signature."""
    from vrod_spark.operators.dedup import minhash_signature, minhash_signature_expr
    from vrod_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 37 == 1)
    agg = {r["id"]: list(r["sig"]) for r in minhash_signature(docs, k=16, n=3).collect()}
    expr = {
        r["doc_id"]: list(r["sig"])
        for r in docs.select(
            "doc_id", minhash_signature_expr("text", k=16, n=3).alias("sig")
        ).collect()
    }
    assert len(agg) > 5
    for doc_id, sig in agg.items():
        assert expr[doc_id] == sig, doc_id


def test_stream_url_dedup_batch_equivalence(spark, tmp_path):
    """url_dedup_stream under availableNow keeps exactly one row per
    normalized URL (first arrival) plus every malformed-URL row — the
    batch DEDUP strategy "url" contract on the streaming path."""
    import os

    from vrod_spark.streaming.ingest import run_to_completion, url_dedup_stream

    rows = [
        (1, "2024-01-01 00:00:01", "http://Example.com/a?utm_source=x"),
        (2, "2024-01-01 00:00:02", "http://example.com/a"),      # refetch
        (3, "2024-01-01 00:00:03", "http://example.com/a#frag"), # refetch
        (4, "2024-01-01 00:00:04", "http://example.com/b"),
        (5, "2024-01-01 00:00:05", "junk"),
        (6, "2024-01-01 00:00:06", "junk"),  # same junk — must survive
    ]
    src_dir = str(tmp_path / "pages")
    spark.createDataFrame(
        rows, "id long, ts_s string, url string"
    ).select(
        "id", F.col("ts_s").cast("timestamp").alias("ts"), "url"
    ).coalesce(1).write.parquet(src_dir)

    stream = (
        spark.readStream.schema("id long, ts timestamp, url string")
        .parquet(src_dir)
    )
    out = run_to_completion(
        url_dedup_stream(stream).select("id"), output_mode="append"
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 4, 5, 6]


def test_idempotent_stream_insert_skips_replayed_epoch(spark, tmp_path):
    """r11 review: foreachBatch is at-least-once — a replayed epoch (crash
    between the collection commit and the streaming checkpoint commit)
    must be recognized via the WAL's (stream_query, stream_epoch) record
    and skipped, not double-inserted."""
    from vrod_spark.engine import Engine
    from vrod_spark.streaming.ingest import idempotent_stream_insert

    eng = Engine.create(spark, str(tmp_path), "sdb")
    eng.execute("CREATE", collection="s")
    col = eng.db.collection("s")
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, payload string"
    )
    assert idempotent_stream_insert(col, batch, 7, "q1") is True
    assert col.read().count() == 2
    # the same epoch replayed -> skipped
    assert idempotent_stream_insert(col, batch, 7, "q1") is False
    assert col.read().count() == 2
    # a NEW epoch (or another stream) still inserts
    batch2 = spark.createDataFrame([(3, "c")], "id long, payload string")
    assert idempotent_stream_insert(col, batch2, 8, "q1") is True
    assert col.read().count() == 3
    assert col.wal_entries()[-1]["stream_epoch"] == 8


def test_idempotent_stream_insert_cache_and_truncatewal(spark, tmp_path):
    """r11 advice: (a) with an applied_cache the WAL is parsed once —
    subsequent epochs never re-read it; (b) the replay guard survives
    TRUNCATEWAL via the harvested meta stream_hwm, so a post-truncation
    restart cannot duplicate the in-flight epoch."""
    from vrod_spark.engine import Engine
    from vrod_spark.streaming.ingest import idempotent_stream_insert

    eng = Engine.create(spark, str(tmp_path), "sdb2")
    eng.execute("CREATE", collection="s")
    col = eng.db.collection("s")
    batch = spark.createDataFrame([(1, "a")], "id long, payload string")
    cache: dict = {}
    assert idempotent_stream_insert(col, batch, 3, "qA", applied_cache=cache)
    assert cache == {"qA": 3}
    # replay through the cache is skipped WITHOUT touching the WAL
    calls = {"n": 0}
    real = col.wal_entries

    def counting():
        calls["n"] += 1
        return real()

    col.wal_entries = counting
    assert not idempotent_stream_insert(col, batch, 3, "qA", applied_cache=cache)
    assert idempotent_stream_insert(col, batch, 4, "qA", applied_cache=cache)
    assert calls["n"] == 0 and cache == {"qA": 4}
    col.wal_entries = real
    # TRUNCATEWAL harvests the high-water mark into meta...
    eng.execute("TRUNCATEWAL", collection="s")
    assert col.meta["stream_hwm"] == {"qA": 4}
    assert not any(
        e.get("stream_query") == "qA" for e in col.wal_entries()
    )
    # ...so a cold restart (fresh cache, empty WAL) still skips replays
    assert not idempotent_stream_insert(col, batch, 4, "qA", applied_cache={})
    assert not idempotent_stream_insert(col, batch, 4, "qA")  # uncached path
    assert idempotent_stream_insert(col, batch, 5, "qA", applied_cache={})
    assert col.read().count() == 3


def test_run_to_completion_scratch_checkpoint_cleanup(
    spark, tmp_path, monkeypatch, sf_dir
):
    """run_to_completion honors VROD_STREAM_SCRATCH and removes its
    checkpoint dir on every exit path — including a FAILED attempt
    (Spark's own temp checkpoints are only deleted on successful stop,
    so failures used to leak dirs under /tmp)."""
    from vrod_spark.streaming.ingest import _scratch_root

    scratch = tmp_path / "scratch"
    monkeypatch.setenv("VROD_STREAM_SCRATCH", str(scratch))
    root = _scratch_root()
    assert root == str(scratch / "vrod_stream_ckpt")

    out = run_to_completion(
        lambda s: tumbling_counts(events_stream(s, sf_dir)),
        spark,
        output_mode="complete",
        state_partitions=2,
    )
    assert out.count() >= 1
    assert os.listdir(root) == []  # success path: checkpoint removed

    # Failure path: a plan that dies inside the micro-batch (bad UDF) must
    # still clean up its checkpoint dirs after the retry attempts.
    monkeypatch.setenv("SPARK_GRAFT_STREAM_RETRIES", "0")
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    boom = F.udf(lambda v: (_ for _ in ()).throw(RuntimeError("boom")), LongType())
    try:
        run_to_completion(
            lambda s: events_stream(s, sf_dir).select(boom("event_id").alias("b")),
            spark,
            output_mode="append",
            state_partitions=2,
        )
    except Exception:
        pass
    else:  # pragma: no cover - the stream must fail
        raise AssertionError("expected the poisoned stream to fail")
    assert os.listdir(root) == []  # failure path: checkpoint removed too


def test_no_data_batch_optout_is_result_neutral(spark, sf_dir):
    """``no_data_batch=False`` (skip the final no-data micro-batch) must
    return the exact rows of the default run for the shapes that opt in:
    complete-mode aggregation over dropDuplicates (q37's distinct leg)
    and the append-mode INNER interval join (q46's pairs leg). The skipped
    batch only evicts state the run is about to delete with its
    checkpoint; any emitted-row difference here means the opt-out was
    applied to a shape it is not safe for."""
    from vrod_spark.streaming.ingest import click_purchase_join

    def distinct_leg(s):
        return (
            dedup_stream(events_stream(s, sf_dir))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_unique"))
        )

    def pairs_leg(s):
        return click_purchase_join(events_stream(s, sf_dir), max_delay="30 minutes")

    for builder, mode in ((distinct_leg, "complete"), (pairs_leg, "append")):
        base = run_to_completion(
            builder, spark, output_mode=mode, state_partitions=2
        )
        skipped = run_to_completion(
            builder, spark, output_mode=mode, state_partitions=2,
            no_data_batch=False,
        )
        want = sorted(tuple(r) for r in base.collect())
        got = sorted(tuple(r) for r in skipped.collect())
        assert got == want

    # The knob must be scoped to the run's child session, never the parent.
    assert (
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled") == "true"
    )
