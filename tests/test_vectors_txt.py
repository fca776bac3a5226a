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
