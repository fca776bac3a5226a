"""Multi-JVM execution smoke: a gate slice under ``local-cluster``.

``local[N]`` runs driver and executors in ONE JVM, which silently
forgives whole classes of cluster bugs: driver-local filesystem or
sys.path assumptions inside worker closures (functions pickled by
reference resolve against the driver's modules), broadcast values that
were never actually serialized across a process boundary, and
accumulator/state shared through process memory. ``local-cluster[w,c,m]``
launches REAL separate executor JVMs (Spark's own cluster-regime test
harness), so everything a 1000-executor deployment would serialize gets
serialized here too.

The slice spans the pickling-sensitive families: engine lifecycle (q48:
COW commits + EXPORT/RESTORE/HISTORY driven from executor tasks),
streaming (q37: state store + dedup), a trained-model broadcast join
(q54: DSIR + classifier scoring), kNN (q05: vector kernels), and the
Arrow/mapInPandas multimodal path (q51). The full 50-gate surface was
run green under this master at round 13 (PERF.md); this CI smoke keeps
the regime from silently regressing. Runs from /tmp in a subprocess —
workers must not inherit the repo cwd (the pickling trap the verify
recipe documents).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"

SCRIPT = r"""
import sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder
    .master("local-cluster[2,4,2048]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.executor.memory", "2g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as E
qs = E.queries()
for name in ("q05_knn_metrics", "q37_stream_dedup", "q54_mixture_sampling",
             "q48_dedup_engine_roundtrip", "q51_multimodal_decode"):
    n = len(qs[name](spark, sys.argv[2]).collect())
    assert n > 0, name
    print(f"{name}: OK ({n} rows)", flush=True)
spark.stop()
print("LOCAL_CLUSTER_OK")
"""

#: Table-mode snapshot leg (r13 verdict item 4): VROD_SNAPSHOT_MODE=table
#: is the CLUSTER-grade snapshot seam (parquet roundtrip on a shared dir,
#: survives executor loss — the r13 chaos run's fix for the q54
#: infra-fail), so it must be exercised in the multi-JVM regime it exists
#: for, not only under local[N]. q54 is exactly the gate whose
#: localcheckpoint snapshots died with SIGKILLed executors.
TABLE_MODE_SCRIPT = r"""
import sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder
    .master("local-cluster[2,4,2048]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.executor.memory", "2g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as E
rows = E.queries()["q54_mixture_sampling"](spark, sys.argv[2]).collect()
assert len(rows) > 0
print(f"q54_mixture_sampling[table]: OK ({len(rows)} rows)", flush=True)
spark.stop()
print("TABLE_MODE_OK")
"""


@pytest.fixture(scope="module")
def cluster_runs(tmp_path_factory):
    """Both multi-JVM legs run CONCURRENTLY (each spawns its own
    local-cluster master + 2 executor JVMs in an isolated cwd)."""
    from concurrent.futures import ThreadPoolExecutor

    # mktemp on the main thread only — TempPathFactory is not thread-safe.
    tmps = [tmp_path_factory.mktemp("lc"), tmp_path_factory.mktemp("lc")]

    def run(script: str, env: dict | None):
        tmp = tmps.pop()
        if env is not None:
            env = {**os.environ, **env,
                   "VROD_SNAPSHOT_DIR": str(tmp / "snapshots")}
        return subprocess.run(
            [sys.executable, "-c", script, REPO, SF],
            capture_output=True,
            text=True,
            timeout=900,
            cwd=str(tmp),  # NOT the repo: workers must not see it either
            env=env,
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        gates = pool.submit(run, SCRIPT, None)
        table = pool.submit(run, TABLE_MODE_SCRIPT, {"VROD_SNAPSHOT_MODE": "table"})
        return {"gates": gates.result(), "table": table.result()}


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_gates_under_local_cluster(cluster_runs):
    res = cluster_runs["gates"]
    assert res.returncode == 0, (
        f"local-cluster slice failed: rc={res.returncode}\n"
        f"stdout tail: {res.stdout[-2000:]}\nstderr tail: {res.stderr[-2000:]}"
    )
    assert "LOCAL_CLUSTER_OK" in res.stdout


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_table_mode_snapshots_under_local_cluster(cluster_runs):
    res = cluster_runs["table"]
    assert res.returncode == 0, (
        f"table-mode local-cluster leg failed: rc={res.returncode}\n"
        f"stdout tail: {res.stdout[-2000:]}\nstderr tail: {res.stderr[-2000:]}"
    )
    assert "TABLE_MODE_OK" in res.stdout
