"""Engine SQL surface + multi-format BULKINSERT tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vrod_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine.create(spark, str(tmp_path), "sqldb")
    e.execute("CREATE", collection="vecs")
    e.execute(
        "INSERT",
        collection="vecs",
        arg=[
            {"id": 1, "embedding": [1.0, 0.0], "payload": "alpha", "meta": {"k": "a"}},
            {"id": 2, "embedding": [0.0, 1.0], "payload": "beta", "meta": {"k": "b"}},
            {"id": 3, "embedding": [0.5, 0.5], "payload": "alpha", "meta": None},
        ],
    )
    return e


def test_engine_sql_over_collection(eng):
    rows = eng.sql(
        "SELECT payload, count(*) AS n, round(sum(size(embedding)), 1) AS dims "
        "FROM vecs GROUP BY payload ORDER BY payload"
    ).collect()
    assert [(r["payload"], r["n"]) for r in rows] == [("alpha", 2), ("beta", 1)]


def test_engine_sql_snapshot_stable(eng):
    df = eng.sql("SELECT count(*) AS n FROM vecs")
    eng.execute("DELETE", collection="vecs", arg="id = 3")
    # the view was bound to the pre-delete snapshot
    assert df.first()["n"] == 3
    assert eng.sql("SELECT count(*) AS n FROM vecs").first()["n"] == 2


def test_bulkinsert_csv(eng, spark, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text('id,embedding,payload\n10,"0.1,0.2","gamma"\n11,"0.3,0.4","delta"\n')
    eng.execute("BULKINSERT", collection="vecs", arg=str(csv))
    col = eng.db.collection("vecs")
    rows = {r["id"]: r for r in col.read().collect()}
    assert rows[10]["payload"] == "gamma"
    assert rows[10]["embedding"] == pytest.approx([0.1, 0.2])
    assert rows[10]["meta"] is None  # absent nullable column filled


def test_bulkinsert_jsonl(eng, spark, tmp_path):
    j = tmp_path / "in.jsonl"
    j.write_text(
        '{"id": 20, "embedding": [0.9, 0.1], "payload": "eps", "meta": {"s": "x"}}\n'
    )
    eng.execute("BULKINSERT", collection="vecs", arg=str(j))
    col = eng.db.collection("vecs")
    row = col.read().filter("id = 20").first()
    assert row["payload"] == "eps" and row["meta"] == {"s": "x"}


def test_bulkinsert_csv_dimension_still_enforced(eng, tmp_path):
    from vrod_spark.errors import DimensionMismatchError

    csv = tmp_path / "bad.csv"
    csv.write_text('id,embedding,payload\n30,"0.1,0.2,0.3","bad"\n')
    with pytest.raises(DimensionMismatchError):
        eng.execute("BULKINSERT", collection="vecs", arg=str(csv))


def test_ingest_missing_id_rejected(eng, spark):
    from vrod_spark.errors import CommandArgError

    df = spark.createDataFrame([("x",)], "payload string")
    with pytest.raises(CommandArgError):
        eng.execute("BULKINSERT", collection="vecs", arg=df)


def test_bulkinsert_orc(eng, spark, tmp_path):
    src = str(tmp_path / "in.orc")
    spark.createDataFrame(
        [(40, [0.2, 0.8], "orc row", None)],
        "id bigint, embedding array<float>, payload string, meta map<string,string>",
    ).write.orc(src)
    eng.execute("BULKINSERT", collection="vecs", arg=src)
    assert eng.db.collection("vecs").read().filter("id = 40").first()["payload"] == "orc row"


def test_engine_sql_isolated_from_shared_session_views(spark, tmp_path):
    """Engine.sql runs on a private child session: a poisoned temp view
    with a clashing collection name on the SHARED session must not leak
    into the query, and Engine.sql's own views must not clobber it."""
    from vrod_spark.engine import Engine

    eng = Engine.create(spark, str(tmp_path), "sqliso")
    eng.execute("CREATE", collection="c")
    eng.execute(
        "INSERT",
        collection="c",
        arg=[{"id": 1, "embedding": [1.0], "payload": "real"}],
    )
    spark.createDataFrame([(99, "EVIL")], "id bigint, payload string")\
        .createOrReplaceTempView("c")
    try:
        rows = eng.sql("SELECT id, payload FROM c ORDER BY id").collect()
        assert [(r["id"], r["payload"]) for r in rows] == [(1, "real")]
        # shared-session view untouched by Engine.sql's registration
        shared = spark.sql("SELECT payload FROM c").collect()
        assert [r["payload"] for r in shared] == ["EVIL"]
    finally:
        spark.catalog.dropTempView("c")


def test_project_events_raw_pre_epoch_nanos(spark):
    """r11 review (live-reproduced): pre-1970 epoch nanos made div/%
    produce a negative remainder and make_timestamp_ntz threw under
    ANSI mode; floor semantics render them correctly."""
    from vrod_spark.sources.tables import project_events_raw

    raw = spark.createDataFrame(
        [(1, -1000, 1, "click", 0.0, None), (2, 1000, 1, "click", 0.0, None)],
        "event_id bigint, ts bigint, user_id bigint, "
        "event_type string, value double, props string",
    )
    rows = {r["event_id"]: r for r in project_events_raw(raw).collect()}
    assert str(rows[1]["ts"]) == "1969-12-31 23:59:59.999999"
    assert str(rows[2]["ts"]) == "1970-01-01 00:00:00.000001"
    assert rows[1]["ts_ns"] == -1000 and rows[2]["ts_ns"] == 1000
