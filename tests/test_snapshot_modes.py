"""Snapshot materialization modes must be result-identical.

``_shared_materialized`` has two modes (VROD_SNAPSHOT_MODE):
``localcheckpoint`` (default — executor-local DISK_ONLY blocks, fast,
not fault-tolerant) and ``table`` (parquet write + fresh scan under
VROD_SNAPSHOT_DIR — the cluster-grade swap that survives executor loss,
verified by the r13 chaos runs). The swap is only legitimate if it is
invisible to every consumer: same rows, bit-identical values, through
every gate that fans out from a shared snapshot."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

#: Every gate that consumes a _shared_materialized snapshot: the jaccard
#: edge graph (q26, q59), the tokenized corpus + bm25 ranks (q53), the
#: span/winnow/line snapshots (q49), the ngram bucket table (q54), and
#: the trigram LM model (q29).
SNAPSHOT_GATES = [
    "q26_jaccard_top_pairs",
    "q29_lang_quality",
    "q49_repetition_ratio",
    "q53_vocab_top_tokens",
    "q54_mixture_sampling",
    "q59_corpus_assembly",
]


def _canon(df) -> list[tuple]:
    return sorted(tuple(repr(v) for v in row) for row in df.collect())


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
@pytest.mark.parametrize("name", SNAPSHOT_GATES)
def test_table_mode_matches_localcheckpoint(spark, tmp_path, monkeypatch, name):
    from vrod_spark.queries import RAW_QUERIES

    monkeypatch.delenv("VROD_SNAPSHOT_MODE", raising=False)
    base = _canon(RAW_QUERIES[name](spark, SF))

    monkeypatch.setenv("VROD_SNAPSHOT_MODE", "table")
    monkeypatch.setenv("VROD_SNAPSHOT_DIR", str(tmp_path / "snapshots"))
    table = _canon(RAW_QUERIES[name](spark, SF))

    assert table == base, f"{name}: table-mode snapshot changed the result"


def test_unknown_mode_rejected(spark, monkeypatch):
    from vrod_spark.queries import _shared_materialized

    monkeypatch.setenv("VROD_SNAPSHOT_MODE", "inmemory")
    with pytest.raises(ValueError, match="VROD_SNAPSHOT_MODE"):
        _shared_materialized(spark, ("mode_probe",), lambda: spark.range(1))


def test_table_mode_paths_are_per_session(spark, tmp_path, monkeypatch):
    """r13 advice: VROD_SNAPSHOT_DIR may be a SHARED filesystem, and the
    per-key build lock is per-process — two sessions materializing the
    same key must not overwrite one target in place (overwrite =
    delete-then-rewrite; a concurrent reader's scan can hit a torn dir).
    The target path therefore carries a per-process incarnation token:
    this session's writes land under paths containing it, and a fresh
    interpreter (simulating the second session) mints a DIFFERENT token
    — so the two sessions' targets can never collide."""
    import subprocess
    import sys

    from vrod_spark.queries import _shared_materialized, _snapshot_incarnation

    snap_dir = tmp_path / "shared_snapshots"
    monkeypatch.setenv("VROD_SNAPSHOT_MODE", "table")
    monkeypatch.setenv("VROD_SNAPSHOT_DIR", str(snap_dir))
    tok = _snapshot_incarnation()
    got = _shared_materialized(
        spark, ("incarnation_probe",), lambda: spark.range(3)
    )
    assert got.count() == 3
    dirs = os.listdir(snap_dir)
    assert dirs and all(d.endswith("-" + tok) for d in dirs), dirs
    # A second process (same repo, same env) must mint a different token.
    other = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[1]); "
         "from vrod_spark.queries import _snapshot_incarnation; "
         "print(_snapshot_incarnation())",
         os.path.dirname(os.path.dirname(os.path.abspath(__file__)))],
        capture_output=True, text=True, timeout=60,
    )
    assert other.returncode == 0, other.stderr[-500:]
    assert other.stdout.strip() and other.stdout.strip() != tok


def test_table_mode_gc_reclaims_cold_foreign_incarnations(spark, tmp_path, monkeypatch):
    """ADVICE r14: a shared VROD_SNAPSHOT_DIR must not accumulate one dir
    set per session forever. The next same-key build reclaims FOREIGN
    incarnation dirs older than the GC age, and only those: a cold
    foreign dir under a DIFFERENT key survives (its own next build owns
    it), a recent foreign dir survives (could be a live session), and
    this session's own target survives."""
    import hashlib
    import time as _time

    from vrod_spark.queries import _shared_materialized, _snapshot_incarnation

    snap_dir = tmp_path / "shared_snapshots"
    snap_dir.mkdir()
    monkeypatch.setenv("VROD_SNAPSHOT_MODE", "table")
    monkeypatch.setenv("VROD_SNAPSHOT_DIR", str(snap_dir))

    key = ("gc_probe",)
    # The on-disk path hashes the RAW key (the mode prefix only enters
    # the in-process cache key).
    key_sha = hashlib.sha256(repr(key).encode()).hexdigest()[:24]
    old = snap_dir / f"{key_sha}-deadbeefcafe"
    recent = snap_dir / f"{key_sha}-feedfacecafe"
    otherkey = snap_dir / f"{'0' * 24}-deadbeefcafe"
    for d in (old, recent, otherkey):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"stale")
    stale_ts = _time.time() - 48 * 3600
    os.utime(old, (stale_ts, stale_ts))
    os.utime(otherkey, (stale_ts, stale_ts))

    got = _shared_materialized(spark, key, lambda: spark.range(3))
    assert got.count() == 3
    entries = set(os.listdir(snap_dir))
    assert old.name not in entries, "cold same-key foreign dir not reclaimed"
    assert recent.name in entries, "recent foreign dir must survive (may be live)"
    assert otherkey.name in entries, "foreign-KEY dir is not ours to reclaim"
    assert f"{key_sha}-{_snapshot_incarnation()}" in entries
