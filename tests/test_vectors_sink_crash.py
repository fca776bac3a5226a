"""Kill-window recovery for the vectors_txt STREAMING SINK commit.

The sink's commit protocol (sources/vectors_txt.py _StreamWriter) is
delete-stale → rename-temps-in-partition-order; it claims exactly-once
across replays without a transaction log because final names are
deterministic per (batchId, partition). r14 verdict item 3: this was the
one committing surface without a kill test. Three windows, produced for
real (``os._exit`` inside the commit body, injected via env because the
commit runs in Spark's Python sink-runner process, unreachable by
monkeypatch):

- W0: die after the stale-deletes, before ANY rename — the batch is
  entirely invisible, temps orphaned.
- W1: die mid-commit after one rename — the batch is PARTIALLY visible
  (the documented torn window readers must not list during).
- W-all: die after the LAST rename, before the streaming checkpoint
  records the batch — the classic at-least-once replay window.

Each phase-2 restart resumes the same checkpoint; the replayed commit
must repair (delete the crashed attempt's partial files, re-rename) so a
fresh reader sees exactly the source rows once, with stable ids, and no
``_tmp-*`` debris is visible to the reader (``_``-prefixed names are
skipped by both readers)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import os, sys
sys.path.insert(0, sys.argv[1])
base = sys.argv[2]
kill_after = sys.argv[3]  # "-1" = run to completion
if kill_after != "-1":
    os.environ["VROD_VECTORS_SINK_KILL_AFTER_RENAMES"] = kill_after
else:
    os.environ.pop("VROD_VECTORS_SINK_KILL_AFTER_RENAMES", None)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from vrod_spark.sources.vectors_txt import register_vector_datasource

register_vector_datasource(spark)
src = os.path.join(base, "src")
dst = os.path.join(base, "dst")
ckpt = os.path.join(base, "ckpt")

q = (
    spark.readStream.format("vrod_vectors")
    .option("path", src)
    .load()
    .repartition(3)  # several sink partitions -> several renames to kill between
    .writeStream.format("vrod_vectors")
    .option("path", dst)
    .option("checkpointLocation", ckpt)
    .outputMode("append")
    .trigger(availableNow=True)
    .start()
)
try:
    q.awaitTermination(180)
    print("DONE", flush=True)
except Exception as e:  # the killed sink-runner surfaces as a query error
    print("QUERYFAIL", type(e).__name__, flush=True)
    spark.stop()
    sys.exit(3)
spark.stop()
"""


def _source_lines(src: str) -> None:
    os.makedirs(src)
    with open(os.path.join(src, "part-00000.txt"), "w") as f:
        for i in range(30):
            f.write(f"0.5,{i}.25;row_{i}\n")


def _read_back(tmp_path, dst: str) -> list[tuple]:
    """Fresh interpreter + fresh session: what a cold reader sees."""
    out = subprocess.run(
        [sys.executable, "-c", r"""
import os, sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
from vrod_spark.sources.vectors_txt import register_vector_datasource
register_vector_datasource(spark)
for r in sorted(
    (r["payload"], r["id"])
    for r in spark.read.format("vrod_vectors").option("path", sys.argv[2]).load().collect()
):
    print("ROW", r[0], r[1])
spark.stop()
""", REPO, dst],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-1500:]
    return [
        tuple(ln.split()[1:]) for ln in out.stdout.splitlines() if ln.startswith("ROW")
    ]


def _window_chain(tmp_path, window: str):
    base = str(tmp_path / "wh")
    os.makedirs(base)
    _source_lines(os.path.join(base, "src"))
    dst = os.path.join(base, "dst")

    def run(kill_after: str):
        return subprocess.run(
            [sys.executable, "-c", SCRIPT, REPO, base, kill_after],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=str(tmp_path),
        )

    # The repartition(3) over 30 rows fills 3 sink partitions -> 3 renames.
    kill_after = {"0": "0", "1": "1", "all": "3"}[window]
    crashed = run(kill_after)
    assert crashed.returncode != 0, (
        f"phase 1 should die in the commit window: {crashed.stdout}\n"
        f"{crashed.stderr[-1000:]}"
    )
    batch_files = sorted(
        f for f in os.listdir(dst) if f.startswith("batch-")
    ) if os.path.isdir(dst) else []
    expect_visible = {"0": 0, "1": 1, "all": 3}[window]
    assert len(batch_files) == expect_visible, (
        f"window {window}: expected {expect_visible} committed shard(s) on "
        f"disk after the kill, found {batch_files}"
    )

    resumed = run("-1")
    assert resumed.returncode == 0 and "DONE" in resumed.stdout, (
        f"resume failed: {resumed.stdout}\n{resumed.stderr[-1500:]}"
    )
    rows = _read_back(tmp_path, dst)
    payloads = sorted(p for p, _ in rows)
    assert payloads == sorted(f"row_{i}" for i in range(30)), (
        f"window {window}: reader sees torn/duplicated batch: "
        f"{len(payloads)} rows"
    )
    # ids are the reader's (file_index << 40 | line) mint — uniqueness
    # proves no duplicated shard survived beside the repaired one.
    assert len({i for _, i in rows}) == 30


@pytest.fixture(scope="module")
def window_results(tmp_path_factory):
    """All three windows' crash→resume→cold-read chains run CONCURRENTLY
    (isolated tmp dirs; ~3 JVM boots each — serially this module was
    ~2.7 min of mostly-idle pytest wall)."""
    from concurrent.futures import ThreadPoolExecutor

    # mktemp on the main thread only — TempPathFactory is not thread-safe.
    tmps = {w: tmp_path_factory.mktemp(f"w{w}") for w in ("0", "1", "all")}

    def one(window: str):
        try:
            _window_chain(tmps[window], window)
            return ("ok", None)
        except BaseException as e:
            return ("err", e)

    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = {w: pool.submit(one, w) for w in tmps}
        return {w: f.result() for w, f in futs.items()}


@pytest.mark.parametrize("window", ["0", "1", "all"])
def test_sink_commit_kill_windows_repair_to_exactly_once(window_results, window):
    status, err = window_results[window]
    if status == "err":
        raise err
