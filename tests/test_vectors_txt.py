"""Format parity with the reference's text vector sink
(`f32,...,f32;payload` lines, embeddings.rs:55-62)."""

from __future__ import annotations

import pytest

from vrod_spark.sources.vectors_txt import read_vectors_txt, write_vectors_txt


def test_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, [1.5, -2.0, 3.25], "alice", None),
            (2, [0.0, 0.5, 1.0], "rabbit", None),
        ],
        "id bigint, embedding array<float>, payload string, meta map<string,string>",
    )
    path = str(tmp_path / "vecs")
    write_vectors_txt(df, path, single_file=True)
    back = read_vectors_txt(spark, path)
    rows = {r["payload"]: r["embedding"] for r in back.collect()}
    assert rows["alice"] == pytest.approx([1.5, -2.0, 3.25])
    assert rows["rabbit"] == pytest.approx([0.0, 0.5, 1.0])
    assert back.count() == 2
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "bigint",
        "array<float>",
        "string",
        "map<string,string>",
    ]


def test_python_datasource_reads_vector_format(spark, tmp_path):
    """The registered Spark-4 Python DataSource parses the reference
    format identically to the expression-based reader, with one partition
    per file and stable per-line ids."""
    from vrod_spark.sources.vectors_txt import (
        read_vectors_txt,
        register_vector_datasource,
        write_vectors_txt,
    )

    df = spark.createDataFrame(
        [(i, [float(i), i + 0.5], f"w{i}", None) for i in range(6)],
        "id bigint, embedding array<float>, payload string, meta map<string,string>",
    )
    out = str(tmp_path / "vecs")
    write_vectors_txt(df, out, single_file=True)

    register_vector_datasource(spark)
    via_ds = spark.read.format("vrod_vectors").option("path", out).load()
    got = sorted(
        (r["payload"], [round(x, 3) for x in r["embedding"]])
        for r in via_ds.collect()
    )
    want = sorted(
        (r["payload"], [round(x, 3) for x in r["embedding"]])
        for r in read_vectors_txt(spark, out).collect()
    )
    assert got == want and len(got) == 6
    assert via_ds.schema.simpleString() == "struct<id:bigint,embedding:array<float>,payload:string>"


def test_vector_datasource_streams_new_files_exactly_once(spark, tmp_path):
    """The vector format as a STREAMING source: a checkpointed availableNow
    run consumes the files present, and a later run with the same
    checkpoint picks up ONLY files that arrived in between (offset = index
    into the sorted file list), never re-emitting old rows."""
    from vrod_spark.sources.vectors_txt import register_vector_datasource

    register_vector_datasource(spark)
    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def write_file(n: int, count: int) -> None:
        lines = "\n".join(f"0.5,{i}.25;w{n}_{i}" for i in range(count))
        (src / f"part-{n:05d}.txt").write_text(lines + "\n")

    def run_once() -> list:
        # Durable sink: memory sinks reject checkpoint recovery, and
        # recovery (run 2 resuming the offset log) is the thing under test.
        q = (
            spark.readStream.format("vrod_vectors")
            .option("path", str(src))
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return spark.read.parquet(sink).collect()

    write_file(0, 3)
    write_file(1, 2)
    rows1 = run_once()
    assert sorted(r["payload"] for r in rows1) == [
        "w0_0", "w0_1", "w0_2", "w1_0", "w1_1",
    ]
    write_file(2, 2)
    rows2 = run_once()
    assert sorted(r["payload"] for r in rows2) == sorted(
        [r["payload"] for r in rows1] + ["w2_0", "w2_1"]
    )
    # ids stay globally unique and stable (file index << 40 | line).
    ids = [r["id"] for r in rows2]
    assert len(ids) == len(set(ids))
    assert {r["payload"]: r["id"] for r in rows2}["w2_1"] == (2 << 40) | 1


def test_vector_datasource_stream_sink_roundtrip(spark, tmp_path):
    """The format is a streaming SINK too: stream vector files from one
    directory INTO another through the Python data source on both ends,
    and the written lines parse back identically (source → sink → source
    roundtrip). Batch files land atomically (temp + rename on commit) so
    a reader of the sink dir never sees a torn file."""
    from vrod_spark.sources.vectors_txt import register_vector_datasource

    register_vector_datasource(spark)
    src = tmp_path / "in"
    src.mkdir()
    dst = str(tmp_path / "out")
    (src / "part-00000.txt").write_text("1.5,2.5;alpha\n3.25,4.0;beta\n")
    (src / "part-00001.txt").write_text("0.5,0.75;gamma\n")
    q = (
        spark.readStream.format("vrod_vectors")
        .option("path", str(src))
        .load()
        .writeStream.format("vrod_vectors")
        .option("path", dst)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    import os

    files = sorted(os.listdir(dst))
    assert files and all(f.startswith("batch-") for f in files)
    back = spark.read.format("vrod_vectors").option("path", dst).load()
    got = sorted(
        (r["payload"], [round(float(x), 4) for x in r["embedding"]])
        for r in back.collect()
    )
    assert got == [
        ("alpha", [1.5, 2.5]),
        ("beta", [3.25, 4.0]),
        ("gamma", [0.5, 0.75]),
    ]


def test_malformed_lines_degrade_like_the_expression_reader(spark, tmp_path):
    """A corrupt component in the reference text format must NULL that
    element (the expression reader's cast('float') semantics), never fail
    the scan — and both readers must agree on the degraded values. One
    bad line in a TB-scale corpus must not kill the job."""
    import pytest

    from vrod_spark.sources.vectors_txt import (
        read_vectors_txt,
        register_vector_datasource,
    )

    path = tmp_path / "vecs"
    path.mkdir()
    (path / "part-0.txt").write_text(
        "1.0,2.0,3.0;good\n"
        "1.0,notafloat,3.0;bad_component\n"
        "\n"
        ";empty_vector\n"
    )
    register_vector_datasource(spark)
    expr = {r["payload"]: r["embedding"] for r in read_vectors_txt(spark, str(path)).collect()}
    ds = {
        r["payload"]: r["embedding"]
        for r in spark.read.format("vrod_vectors").option("path", str(path)).load().collect()
    }
    for got in (expr, ds):
        assert got["good"] == pytest.approx([1.0, 2.0, 3.0])
        assert got["bad_component"][0] == pytest.approx(1.0)
        assert got["bad_component"][1] is None
        assert got["bad_component"][2] == pytest.approx(3.0)
        assert got["empty_vector"] in ([], None)


def test_semicolon_in_payload_roundtrip_and_reader_parity(spark, tmp_path):
    """r11 review: payloads containing ';' must survive the write→read
    roundtrip on BOTH readers (the expression reader's unlimited split
    truncated 'a;b' to 'a'), and a line with no ';' yields payload ''
    on both (the expression reader NULLed it)."""
    from pyspark.sql import functions as F

    from vrod_spark.sources.vectors_txt import read_vectors_txt

    p = tmp_path / "v.txt"
    p.write_text("1.0,2.0;a;b\n3.0,4.0\n")
    expr = {
        tuple(r["embedding"]): r["payload"]
        for r in read_vectors_txt(spark, str(p)).collect()
    }
    assert expr[(1.0, 2.0)] == "a;b"
    assert expr[(3.0, 4.0)] == ""
    ds = {
        tuple(r["embedding"]): r["payload"]
        for r in spark.read.format("vrod_vectors").load(str(p)).collect()
    }
    assert ds == expr
