"""End-to-end crash recovery for the COW commit protocol.

test_engine.py already proves the DISK STATE a crashed writer leaves
behind is harmless (a fabricated orphan v-dir is unrestorable, invisible
to readers, reclaimable) and that concurrent readers never see a torn
snapshot. This file produces that state FOR REAL: a subprocess runs an
actual ``INSERT`` whose process dies via ``os._exit`` at each crash
window of the commit tail —

- window A: after the staging write, before the version-dir rename
  (``_next_version_dir`` never called → only a ``.staging-*`` dir);
- window B: after the version-dir rename, before the commit record
  (``_commit`` never runs → an orphan v-dir, no WAL line, no pointer);

— then a fresh process verifies the collection still reads the
pre-crash snapshot exactly, HISTORY shows no phantom commit, the orphan
is not restorable, and a NEW insert commits cleanly on top (the
recovered writer path, which must skip over the orphan's version
number or land safely)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import os, sys
sys.path.insert(0, sys.argv[1])
base, phase = sys.argv[2], sys.argv[3]
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from vrod_spark.engine import Engine
from vrod_spark import catalog as C

if phase == "setup":
    eng = Engine.create(spark, base, "cdb")
    eng.execute("CREATE", collection="c")
    eng.execute("INSERT", collection="c", arg=[{"id": 1, "payload": "a"},
                                               {"id": 2, "payload": "b"}])
    print("SETUP", eng.db.collection("c").read().count(), flush=True)
elif phase in ("crashA", "crashB"):
    eng = Engine.load(spark, os.path.join(base, "cdb"))
    # Patch the CLASS: the engine may hand out a fresh Collection object
    # per command, so an instance patch would miss the one INSERT uses.
    if phase == "crashA":
        # die after staging is written, before the version-dir rename
        C.Collection._next_version_dir = lambda self: os._exit(7)
    else:
        # die after the version-dir rename, before the commit record
        C.Collection._commit = lambda self, *a, **k: os._exit(7)
    eng.execute("INSERT", collection="c", arg=[{"id": 99, "payload": "DOOMED"}])
elif phase == "verify":
    eng = Engine.load(spark, os.path.join(base, "cdb"))
    col = eng.db.collection("c")
    rows = sorted(r["id"] for r in col.read().collect())
    hist = eng.execute("HISTORY", collection="c").df.collect()
    ops = [r["op"] for r in hist]
    # a later insert must commit cleanly on top of the crash debris
    eng.execute("INSERT", collection="c", arg=[{"id": 3, "payload": "c"}])
    rows2 = sorted(r["id"] for r in col.read().collect())
    print("VERIFY", repr((rows, ops, rows2)), flush=True)
spark.stop()
"""


def _run(base: str, phase: str, cwd: str):
    return subprocess.run(
        [sys.executable, "-c", SCRIPT, REPO, base, phase],
        capture_output=True, text=True, timeout=600, cwd=cwd,
    )


def _chain(tmp_path, window: str):
    base = str(tmp_path / "wh")
    setup = _run(base, "setup", str(tmp_path))
    assert setup.returncode == 0, setup.stderr[-1500:]
    assert "SETUP 2" in setup.stdout

    crashed = _run(base, window, str(tmp_path))
    assert crashed.returncode == 7, (
        f"{window} should die via os._exit(7): rc={crashed.returncode}\n"
        f"{crashed.stderr[-1500:]}"
    )

    verify = _run(base, "verify", str(tmp_path))
    assert verify.returncode == 0, verify.stderr[-1500:]
    line = [ln for ln in verify.stdout.splitlines() if ln.startswith("VERIFY")][0]
    return eval(line.removeprefix("VERIFY "), {"__builtins__": {}}, {})  # noqa: S307 — our own repr


@pytest.fixture(scope="module")
def crash_results(tmp_path_factory):
    """Both windows' subprocess chains run CONCURRENTLY (isolated tmp
    dirs); serially this module was ~110 s of mostly-idle pytest wall."""
    from concurrent.futures import ThreadPoolExecutor

    # mktemp on the main thread only — TempPathFactory is not thread-safe.
    tmps = {w: tmp_path_factory.mktemp(w) for w in ("crashA", "crashB")}

    def one(window: str):
        try:
            return ("ok", _chain(tmps[window], window))
        except BaseException as e:
            return ("err", e)

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = {w: pool.submit(one, w) for w in tmps}
        return {w: f.result() for w, f in futs.items()}


@pytest.mark.parametrize("window", ["crashA", "crashB"])
def test_insert_crash_leaves_committed_snapshot(crash_results, window):
    status, value = crash_results[window]
    if status == "err":
        raise value
    rows, ops, rows2 = value
    assert rows == [1, 2], f"{window}: doomed insert leaked rows: {rows}"
    assert "INSERT" in ops and len([o for o in ops if o == "INSERT"]) == 1, (
        f"{window}: phantom commit in history: {ops}"
    )
    assert rows2 == [1, 2, 3], f"{window}: post-crash insert broken: {rows2}"
