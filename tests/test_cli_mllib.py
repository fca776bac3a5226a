"""CLI parity tests (main.rs dispatch order + error semantics) and
MLlib-LSH path tests (recall vs the exact brute-force oracle)."""

from __future__ import annotations

import json

import pytest

from vrod_spark.cli import main as cli_main
from vrod_spark.operators.knn import knn_exact
from vrod_spark.operators.mllib_lsh import (
    brp_approx_knn,
    brp_similarity_join,
    minhash_similarity_join,
)
from vrod_spark.sources.tables import load_table


# -- CLI -------------------------------------------------------------------
def test_cli_init_requires_name(spark, tmp_path, capsys):
    rc = cli_main(["--init-database", str(tmp_path)], spark=spark)
    assert rc == 2  # MissingInitDatabaseNameFlag semantics (main.rs:36-40)
    assert "init-database-name" in capsys.readouterr().err


def test_cli_full_flow(spark, tmp_path, capsys):
    rc = cli_main(
        ["--init-database", str(tmp_path), "--init-database-name", "clidb"], spark=spark
    )
    assert rc == 0
    db_path = json.loads(capsys.readouterr().out)["created"]

    assert cli_main(
        ["--database", db_path, "--collection", "c1", "-e", "CREATE"], spark=spark
    ) == 0
    capsys.readouterr()
    assert cli_main(["--database", db_path, "-e", "LISTCOLLECTIONS"], spark=spark) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["rows"] == [{"collection": "c1"}]

    # duplicate init fails like setup.rs:6-15
    rc = cli_main(
        ["--init-database", str(tmp_path), "--init-database-name", "clidb"], spark=spark
    )
    assert rc == 1
    assert "already exists" in capsys.readouterr().err

    # unrecognized verb surfaces the builder error (builder.rs:77-79)
    rc = cli_main(["--database", db_path, "-e", "BOGUS"], spark=spark)
    assert rc == 1
    assert "unrecognized command" in capsys.readouterr().err


def test_cli_generate_embeddings(spark, tmp_path, capsys):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("tweedledum and tweedledee agreed to have a battle\n")
    out_path = str(tmp_path / "vecs.txt")
    rc = cli_main(
        ["--generate-embeddings", "5", "--corpus", str(corpus), "--output", out_path],
        spark=spark,
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["embeddings"]["count"] == 5
    assert stats["embeddings"]["dimension"] == 64
    with open(out_path + "/" + next(
        f for f in __import__("os").listdir(out_path) if f.startswith("part-")
    )) as f:
        line = f.readline().strip()
    vec, _, word = line.partition(";")
    assert word == "tweedledum" and len(vec.split(",")) == 64


# -- MLlib LSH -------------------------------------------------------------
@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_brp_knn_recall(spark, emb):
    qv = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
    exact_ids = {r["vec_id"] for r in knn_exact(emb, qv, 10).collect()}
    approx = brp_approx_knn(emb, qv, 10, bucket_length=2.0, num_hash_tables=8)
    approx_ids = {r["vec_id"] for r in approx.collect()}
    # generous bucket_length → high recall even on uniform-sphere data
    assert len(exact_ids & approx_ids) / 10 >= 0.5
    assert 3 in approx_ids  # self always found


def test_brp_similarity_join_finds_near_pair(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.01, 0.0]), (2, [5.0, 5.0])],
        "vec_id bigint, embedding array<float>",
    )
    pairs = brp_similarity_join(df, df, threshold=0.5, bucket_length=1.0).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]


def test_mllib_minhash_join_finds_planted_dup(spark):
    base = "the quick brown fox jumps over the lazy dog near the river"
    rows = [(0, base), (1, base.replace("river", "creek")), (2, "totally unrelated words here")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_similarity_join(df, 0.6).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_cli_json_args_reach_engine(spark, tmp_path, capsys):
    """JSON command args parse into dicts/lists: CREATE with partition_by,
    INSERT with record lists, and SEARCH partition pruning — the whole
    round-2 arg surface is shell-reachable."""
    rc = cli_main(
        ["--init-database", str(tmp_path), "--init-database-name", "jsondb"], spark=spark
    )
    assert rc == 0
    db_path = json.loads(capsys.readouterr().out)["created"]

    assert cli_main(
        ["--database", db_path, "--collection", "p", "-e", "CREATE",
         "-a", '{"partition_by": "region"}'],
        spark=spark,
    ) == 0
    capsys.readouterr()
    assert cli_main(
        ["--database", db_path, "--collection", "p", "-e", "INSERT",
         "-a", '[{"id": 1, "embedding": [1.0, 0.0], "payload": "a", "meta": {"region": "EU"}},'
               ' {"id": 2, "embedding": [0.0, 1.0], "payload": "b", "meta": {"region": "US"}}]'],
        spark=spark,
    ) == 0
    assert json.loads(capsys.readouterr().out)["info"]["rows"] == 2
    assert cli_main(
        ["--database", db_path, "--collection", "p", "-e", "SEARCH",
         "-a", "meta['region'] = 'EU'"],
        spark=spark,
    ) == 0
    out = json.loads(capsys.readouterr().out)
    assert [r["id"] for r in out["rows"]] == [1]


def test_cli_export_and_hybrid_reach_engine(spark, tmp_path, capsys):
    """The r10 verbs/modes are reachable flag-for-flag through the CLI's
    generic JSON arg path: EXPORT writes shards, hybrid SEARCH returns
    fused rows — no CLI-side special-casing required."""
    rc = cli_main(
        ["--init-database", str(tmp_path), "--init-database-name", "clix"],
        spark=spark,
    )
    assert rc == 0
    db_path = json.loads(capsys.readouterr().out)["created"]
    assert cli_main(
        ["--database", db_path, "--collection", "c", "-e", "CREATE"], spark=spark
    ) == 0
    capsys.readouterr()
    docs = json.dumps(
        [
            {"id": i, "embedding": [float(i), 1.0, 0.0],
             "payload": f"spark hash join doc {i}", "meta": None}
            for i in range(6)
        ]
    )
    rows_path = tmp_path / "rows.json"
    rows_path.write_text("\n".join(json.dumps(r) for r in json.loads(docs)))
    assert cli_main(
        ["--database", db_path, "--collection", "c", "-e", "BULKINSERT",
         "-a", str(rows_path)],
        spark=spark,
    ) == 0
    capsys.readouterr()
    out_dir = tmp_path / "shards"
    assert cli_main(
        ["--database", db_path, "--collection", "c", "-e", "EXPORT",
         "-a", json.dumps({"path": str(out_dir)})],
        spark=spark,
    ) == 0
    info = json.loads(capsys.readouterr().out)["info"]
    assert info["rows"] == 6 and info["format"] == "jsonl"
    assert cli_main(
        ["--database", db_path, "--collection", "c", "-e", "SEARCH",
         "-a", json.dumps({"where": "true",
                           "rank": {"bm25": "hash join",
                                    "vector": [2.0, 1.0, 0.0]},
                           "limit": 3})],
        spark=spark,
    ) == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["rows"]) == 3
    assert out["rows"][0]["fused_rank"] == 1


def test_cli_restore_and_history_reach_engine(spark, tmp_path, capsys):
    """The r11 lifecycle verbs flow through the CLI's generic arg path:
    RESTORE rolls the collection back (version number or as-of ts JSON),
    HISTORY prints the commit rows."""
    rc = cli_main(
        ["--init-database", str(tmp_path), "--init-database-name", "clir"],
        spark=spark,
    )
    assert rc == 0
    db_path = json.loads(capsys.readouterr().out)["created"]
    assert cli_main(
        ["--database", db_path, "--collection", "c", "-e", "CREATE"], spark=spark
    ) == 0
    capsys.readouterr()
    rows_path = tmp_path / "r.json"
    rows_path.write_text(
        "\n".join(json.dumps({"id": i, "payload": f"p{i}"}) for i in range(4))
    )
    assert cli_main(
        ["--database", db_path, "--collection", "c", "-e", "BULKINSERT",
         "-a", str(rows_path)],
        spark=spark,
    ) == 0
    capsys.readouterr()
    assert cli_main(
        ["--database", db_path, "--collection", "c", "-e", "DELETE",
         "-a", "id >= 2"],
        spark=spark,
    ) == 0
    capsys.readouterr()
    # RESTORE by version number (string arg -> json int through the CLI)
    assert cli_main(
        ["--database", db_path, "--collection", "c", "-e", "RESTORE",
         "-a", "1"],
        spark=spark,
    ) == 0
    info = json.loads(capsys.readouterr().out)["info"]
    assert info["restored_from"] == 1 and info["rows"] == 4
    # HISTORY returns the commit rows through the DataFrame result path
    assert cli_main(
        ["--database", db_path, "--collection", "c", "-e", "HISTORY"],
        spark=spark,
    ) == 0
    out = json.loads(capsys.readouterr().out)
    ops = [r["op"] for r in out["rows"]]
    # BULKINSERT commits through Collection.insert -> WAL op "INSERT"
    assert ops == ["CREATE", "INSERT", "DELETE", "RESTORE"]
    assert out["rows"][-1]["current"] is True
