"""End-to-end crash-window recovery for checkpointed streaming ingest.

The replay guard's whole reason to exist is the at-least-once window:
foreachBatch commits the COW snapshot, then the process dies BEFORE
Spark commits the batch to the streaming checkpoint — on restart Spark
replays the epoch and a plain insert would duplicate its rows. The
model test (test_stream_replay_model.py) pins the guard's logic; the
graceful test (test_streaming.py) pins resume semantics. This one
produces the REAL window: a subprocess runs the actual
``stream_ingest_into_collection`` wiring against a real checkpoint and
``os._exit``s inside foreachBatch immediately after the collection
commit of batch 0 — the checkpoint never learns the batch finished.
A second subprocess resumes the same checkpoint to completion; the
collection must hold exactly the source rows (the replayed epoch 0
skipped via the WAL high-water mark, every later epoch applied)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

SCRIPT = r"""
import os, sys
sys.path.insert(0, sys.argv[1])
base, crash = sys.argv[2], sys.argv[3] == "crash"
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from vrod_spark.engine import Engine
from vrod_spark.streaming.ingest import stream_ingest_into_collection

if crash:
    eng = Engine.create(spark, base, "cdb")
    eng.execute("CREATE", collection="c")
else:
    eng = Engine.load(spark, os.path.join(base, "cdb"))
col = eng.db.collection("c")

# 3-file source read one file per micro-batch -> 3 epochs.
src_dir = os.path.join(base, "src")
if crash:
    os.makedirs(src_dir)
    full = (
        spark.read.parquet(sys.argv[4])
        .select(
            F.col("vec_id").alias("id"),
            "embedding",
            F.col("label").cast("string").alias("payload"),
            F.lit(None).cast("map<string,string>").alias("meta"),
        )
    )
    for i in range(3):
        full.filter(F.col("id") % 3 == i).coalesce(1).write.parquet(
            os.path.join(src_dir, f"part{i}")
        )

stream = (
    spark.readStream.schema(
        "id bigint, embedding array<float>, payload string, meta map<string,string>"
    )
    .option("maxFilesPerTrigger", "1")
    .option("recursiveFileLookup", "true")
    .parquet(src_dir)
)

if crash:
    # Die INSIDE foreachBatch, after the collection commit of batch 0 and
    # before Spark records the batch in the checkpoint: the documented
    # at-least-once window, produced for real (os._exit skips every
    # shutdown hook, like an OOM kill).
    class CrashAfterFirstInsert:
        def __init__(self, real):
            self._real = real
            self._inserted = False
        def insert(self, df, **kw):
            n = self._real.insert(df, **kw)
            os._exit(7)
        def __getattr__(self, name):
            return getattr(self._real, name)
    col = CrashAfterFirstInsert(col)

q = stream_ingest_into_collection(
    col, stream, checkpoint_dir=os.path.join(base, "ckpt")
)
q.awaitTermination()
print("ROWS", col.read().count(), flush=True)
spark.stop()
"""


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_crash_window_replay_is_exactly_once(tmp_path):
    emb = os.path.join(SF, "embeddings.parquet")
    base = str(tmp_path / "wh")

    def run(phase: str):
        return subprocess.run(
            [sys.executable, "-c", SCRIPT, REPO, base, phase, emb],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=str(tmp_path),
        )

    crashed = run("crash")
    assert crashed.returncode == 7, (
        f"crash phase should die via os._exit(7) inside batch 0: "
        f"rc={crashed.returncode}\nstderr: {crashed.stderr[-1500:]}"
    )

    resumed = run("resume")
    assert resumed.returncode == 0, (
        f"resume phase failed: rc={resumed.returncode}\n"
        f"stderr: {resumed.stderr[-1500:]}"
    )
    rows = int(resumed.stdout.strip().splitlines()[-1].split()[-1])
    # Exactly the source rows: the replayed epoch 0 (committed to the
    # collection, never to the checkpoint) must be skipped by the WAL
    # high-water mark, and epochs 1-2 applied once each.
    assert rows == 500, (
        f"expected exactly 500 rows after crash+resume, got {rows} — "
        f"{'duplicated replayed epoch' if rows > 500 else 'dropped batches'}"
    )
