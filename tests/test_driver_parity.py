"""Driver-parity regression tests: the engine verb surface under a
session WITHOUT Arrow (``spark.sql.execution.arrow.pyspark.enabled``
unset/false) — the driver's configuration.

Two consecutive driver-red rounds were builder-vs-driver REPRESENTATION
gaps invisible to every in-session check because the builder's session
(session.py) always enables Arrow:

- r8–r10: DuckDB HUGEINT → float64 on the driver's pandas fetch path
  (closed by ``::BIGINT`` oracle casts + tools/check_oracle.py's
  DRIVER_SAFE_TYPES guard).
- r11: HISTORY built its commit log via ``pd.DataFrame(rows)`` where
  the ``rows`` column mixes ints with None (the synthesized CREATE v0
  row always has rows=None); pandas coerces to float64/NaN and
  ``createDataFrame(pdf, "... rows bigint ...")`` dies on the NON-Arrow
  conversion path with "LongType() can not accept object nan"
  (CORRECTNESS_r11 q48). Fixed by routing through localdf.local_df.

This file runs every engine verb that constructs a local DataFrame
(HISTORY with None-bearing bigint columns, LISTCOLLECTIONS, INSERT from
dict records, EXPORT + manifest, RESTORE, EXPLAIN, SEARCH facets) in a
FRESH subprocess whose session disables Arrow — Arrow enablement binds
at session creation, so it cannot share the conftest session. A red
here means red in the driver even when all Arrow-on tests are green.

tools/perturb_gates.py carries the same configuration as its
``arrow_off`` matrix entry for the full gate-query surface.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The subprocess body: one Arrow-less session, the whole local-DataFrame
# verb surface. Prints MARKER on success; any exception propagates as a
# nonzero exit with the traceback on stderr.
SCRIPT = r"""
import os, sys, tempfile
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("driver-parity")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    # THE point of this test: the driver never enables Arrow, so local
    # DataFrames take the strict row-pickling conversion path.
    .config("spark.sql.execution.arrow.pyspark.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "false"

from vrod_spark.engine import Engine
from vrod_spark.localdf import local_df

# local_df itself: a None inside a bigint column must survive (this is
# the exact shape that killed HISTORY in r11).
df = local_df(spark, [(1, None), (None, 2)], "a bigint, b bigint")
got = sorted(
    [(r["a"], r["b"]) for r in df.collect()],
    key=lambda t: (t[0] is None, t[0]),
)
assert got == [(1, None), (None, 2)], got

with tempfile.TemporaryDirectory() as tmp:
    eng = Engine.create(spark, tmp, "paritydb")
    eng.execute("CREATE", collection="c")
    eng.execute(
        "INSERT",
        collection="c",
        arg=[
            {"id": 1, "payload": "a"},
            {"id": 2, "payload": "b"},
            {"id": 3, "payload": None},  # None payload through dict-records
        ],
    )
    eng.execute("DELETE", collection="c", arg="id = 1")
    eng.execute("RESTORE", collection="c", arg=1)

    # HISTORY: v0 CREATE row has rows=None, RESTORE row has
    # restored_from set — both int+None mixes in bigint columns.
    hist = (
        eng.execute("HISTORY", collection="c").df.orderBy("version").collect()
    )
    assert [r["op"] for r in hist] == ["CREATE", "INSERT", "DELETE", "RESTORE"]
    assert hist[0]["rows"] is None and hist[0]["restored_from"] is None
    assert hist[-1]["restored_from"] == 1
    assert all(isinstance(r["version"], int) for r in hist)

    # TRUNCATEWAL then HISTORY: the synthesized CHECKPOINT row is
    # another all-None-numerics row.
    eng.execute("TRUNCATEWAL", collection="c")
    hist2 = (
        eng.execute("HISTORY", collection="c").df.orderBy("version").collect()
    )
    assert hist2[-1]["op"] == "CHECKPOINT" and hist2[-1]["rows"] is None

    # LISTCOLLECTIONS (local_df over names).
    names = [r[0] for r in eng.execute("LISTCOLLECTIONS").df.collect()]
    assert names == ["c"]

    # SEARCH with a facet aggregation (groupBy over the filtered rows).
    res = eng.execute(
        "SEARCH",
        collection="c",
        arg={"where": "id >= 1", "facet": "lang"},
    )
    assert res.df.count() >= 1

    # EXPLAIN (plan string construction, no execution).
    plan = eng.execute(
        "EXPLAIN",
        collection="c",
        arg={"command": "SEARCH", "arg": {"where": "id = 2"}},
    ).info["plan"]
    assert "id" in plan

    # EXPORT (post-RESTORE snapshot has the 3 v1 rows), then an
    # incremental EXPORT of the delta after the checkpoint.
    out = os.path.join(tmp, "export")
    r = eng.execute(
        "EXPORT", collection="c", arg={"path": out, "format": "jsonl"}
    )
    assert r.info["rows"] == 3, r.info
    ckpt = hist2[-1]["version"]
    eng.execute(
        "INSERT", collection="c", arg=[{"id": 9, "payload": "z"}]
    )
    out2 = os.path.join(tmp, "export_delta")
    r2 = eng.execute(
        "EXPORT",
        collection="c",
        arg={"path": out2, "format": "jsonl", "since_version": ckpt},
    )
    assert r2.info["rows"] == 1, r2.info

spark.stop()
print("PARITY-OK")
"""


def test_engine_verbs_without_arrow():
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    env.pop("SPARK_GRAFT_SHUFFLE", None)
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT, REPO],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )
    assert res.returncode == 0, f"stderr tail:\n{res.stderr[-3000:]}"
    assert "PARITY-OK" in res.stdout
