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
