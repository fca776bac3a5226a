"""Property test: the streaming replay guard against a Python model.

``idempotent_stream_insert`` (streaming/ingest.py) promises exactly-once
ingest under foreachBatch's at-least-once delivery: epochs commit in
order within one stream; a replayed epoch (<= the applied high-water
mark) is skipped; the mark survives process restarts via the WAL and
survives TRUNCATEWAL via the harvested ``stream_hwm`` collection meta.
r11 added the caller-held hwm cache, r12's advice fixed the identity
keying, and this file pins the guard's *logic* (the engine-independent
part) against a trivially-correct model across generated op sequences:

- insert(epoch): deliveries may repeat (replay after crash) and restart
  from any applied point, but never skip forward past unseen epochs
  out of order within one incarnation (Spark's contract);
- restart: the caller's hwm cache is dropped (new foreachBatch run) —
  the guard must recover the mark from WAL + meta alone;
- truncate: WAL marks harvested into meta then the WAL cleared — the
  TRUNCATEWAL shape from catalog.py:1349.

The invariant: the collection's inserted-epoch multiset equals the
model's (each accepted epoch exactly once, strictly increasing). Pure
Python — no Spark session, so hypothesis can run real sequence volume.
"""

from __future__ import annotations

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vrod_spark.streaming.ingest import idempotent_stream_insert  # noqa: E402

QTAG = "model-stream"


class _Batch:
    def isEmpty(self) -> bool:  # noqa: N802 — pyspark DataFrame API name
        return False


class _StubCollection:
    """Just enough Collection surface for the guard: a WAL entry list,
    a meta dict, and an insert that records (stream_query, stream_epoch)
    the way Collection.insert's commit_detail lands in wal_entries()."""

    name = "stub"

    def __init__(self) -> None:
        self.wal: list[dict] = []
        self.meta: dict = {}
        self.inserted: list[int] = []

    def wal_entries(self):
        return list(self.wal)

    def insert(self, batch_df, commit_detail):
        self.inserted.append(int(commit_detail["stream_epoch"]))
        self.wal.append(dict(commit_detail))

    def update_meta(self, **fields):
        # catalog.py:293's read-modify-write shape (the guard persists
        # the epoch-0 identity anchor through it).
        self.meta.update(fields)
        return self.meta

    def truncate(self) -> None:
        # catalog.py:1349's harvest: max applied epoch per qtag into
        # meta['stream_hwm'], then the log restarts empty.
        hwm = dict(self.meta.get("stream_hwm") or {})
        for e in self.wal:
            q = e.get("stream_query")
            if q is not None and "stream_epoch" in e:
                hwm[str(q)] = max(int(hwm.get(str(q), -1)), int(e["stream_epoch"]))
        if hwm:
            self.meta["stream_hwm"] = hwm
        self.wal = []


#: An op sequence: each element advances the stream (deliver the next
#: epoch), replays (re-deliver an already-delivered epoch — the
#: at-least-once failure shape), restarts the caller (drop the hwm
#: cache), or truncates the WAL.
OPS = st.lists(
    st.one_of(
        st.just(("advance",)),
        st.tuples(st.just("replay"), st.integers(min_value=0, max_value=30)),
        st.just(("restart",)),
        st.just(("truncate",)),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(ops=OPS)
def test_replay_guard_matches_model(ops):
    col = _StubCollection()
    cache: dict = {}
    next_epoch = 0  # the stream's frontier: what "advance" delivers next
    model_applied: list[int] = []

    for op in ops:
        if op[0] == "advance":
            epoch = next_epoch
            next_epoch += 1
            accepted = idempotent_stream_insert(
                col, _Batch(), epoch, QTAG, applied_cache=cache
            )
            assert accepted, f"fresh epoch {epoch} must insert"
            model_applied.append(epoch)
        elif op[0] == "replay":
            # Replay any previously-DELIVERED epoch (Spark re-runs only
            # batches it has offsets for).
            if next_epoch == 0:
                continue
            epoch = op[1] % next_epoch
            accepted = idempotent_stream_insert(
                col, _Batch(), epoch, QTAG, applied_cache=cache
            )
            assert not accepted, f"replayed epoch {epoch} must be skipped"
        elif op[0] == "restart":
            cache = {}  # new foreachBatch incarnation: WAL+meta must carry it
        elif op[0] == "truncate":
            col.truncate()

    assert col.inserted == model_applied
    assert col.inserted == sorted(set(col.inserted)), "dup or disorder"


def test_legacy_tag_adoption_on_upgrade():
    """The pre-r13 path-derived identity's marks must keep guarding a
    CONTINUING stream across the code upgrade: a restart whose first
    delivery is a replayed epoch > 0 (the crash-window shape) adopts the
    legacy tag's hwm; a FRESH stream entering at epoch 0 (a recreated
    checkpoint) must NOT adopt it — and an empty epoch 0 still anchors
    that fresh identity for the epochs after it."""
    legacy = "old-path-tag"

    # History recorded by old code under the path tag, then truncated.
    col = _StubCollection()
    for e in range(5):
        idempotent_stream_insert(col, _Batch(), e, legacy, applied_cache={})
    col.truncate()

    # Upgrade: same checkpoint continues under the new qid tag. The
    # replayed epoch 4 must skip (adopted legacy hwm), epoch 5 inserts.
    cache: dict = {}
    assert not idempotent_stream_insert(
        col, _Batch(), 4, "new-qid-tag", applied_cache=cache,
        legacy_qtags=(legacy,),
    )
    assert idempotent_stream_insert(
        col, _Batch(), 5, "new-qid-tag", applied_cache=cache,
        legacy_qtags=(legacy,),
    )

    # Recreated checkpoint (fresh identity, epochs restart at 0): the
    # stale legacy mark must not throttle it even when epoch 0 is EMPTY
    # — the identity anchors on first resolution, not first insert.
    class _EmptyBatch:
        def isEmpty(self):  # noqa: N802
            return True

    cache2: dict = {}
    assert not idempotent_stream_insert(
        col, _EmptyBatch(), 0, "recreated-qid", applied_cache=cache2,
        legacy_qtags=(legacy,),
    )
    assert idempotent_stream_insert(
        col, _Batch(), 1, "recreated-qid", applied_cache=cache2,
        legacy_qtags=(legacy,),
    ), "empty epoch 0 must anchor the fresh identity, not defer to legacy"


def test_anchor_survives_restart_before_first_insert():
    """The r13-advice crash window: an EMPTY epoch 0 of a recreated
    checkpoint, then a PROCESS RESTART (applied_cache dropped) before any
    non-empty insert. The next delivery is epoch 1 with no WAL history
    under the new tag — without a persisted anchor it would adopt the
    stale legacy hwm and silently drop every epoch <= it. The anchor must
    live in collection meta, not just the in-process cache."""
    legacy = "old-path-tag"
    col = _StubCollection()
    for e in range(5):
        idempotent_stream_insert(col, _Batch(), e, legacy, applied_cache={})
    col.truncate()  # legacy hwm=4 persisted in meta forever

    # New incarnation: empty epoch 0 resolves (and must persist) the
    # fresh identity's anchor...
    class _EmptyBatch:
        def isEmpty(self):  # noqa: N802
            return True

    assert not idempotent_stream_insert(
        col, _EmptyBatch(), 0, "recreated-qid-b", applied_cache={},
        legacy_qtags=(legacy,),
    )
    assert "recreated-qid-b" in col.meta.get("stream_hwm", {}), (
        "epoch 0 must persist the identity anchor in collection meta"
    )
    # ...then the process restarts (fresh cache) before any insert:
    # epoch 1 <= legacy hwm 4 must still be INGESTED, not dropped.
    assert idempotent_stream_insert(
        col, _Batch(), 1, "recreated-qid-b", applied_cache={},
        legacy_qtags=(legacy,),
    ), "persisted anchor must block legacy adoption across a restart"
    # And the continuing-upgrade path is unaffected: a tag with real WAL
    # history never consults legacy even after restarts.
    assert not idempotent_stream_insert(
        col, _Batch(), 1, "recreated-qid-b", applied_cache={},
        legacy_qtags=(legacy,),
    ), "replayed epoch must still skip under the anchored identity"


@settings(max_examples=50, deadline=None)
@given(ops=OPS)
def test_fresh_identity_is_immune_to_stale_hwm(ops):
    """The r12-advice loss mode, as a law: whatever sequence ran under
    one identity — including truncation persisting its hwm forever — a
    NEW qtag (a recreated checkpoint's new query id) starting at epoch 0
    always ingests."""
    col = _StubCollection()
    cache: dict = {}
    next_epoch = 0
    for op in ops:
        if op[0] == "advance":
            idempotent_stream_insert(col, _Batch(), next_epoch, QTAG, applied_cache=cache)
            next_epoch += 1
        elif op[0] == "truncate":
            col.truncate()
    col.truncate()  # persist whatever marks remain
    before = len(col.inserted)
    assert idempotent_stream_insert(
        col, _Batch(), 0, "recreated-checkpoint-new-id", applied_cache={}
    ), "a fresh stream identity must never be throttled by another's hwm"
    assert len(col.inserted) == before + 1
