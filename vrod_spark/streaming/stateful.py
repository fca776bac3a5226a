"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.3: "applyInPandasWithState for custom stateful operators").

The state store holds one row per key; each micro-batch delivers that
key's new rows as Arrow batches and the operator updates its state —
this is the escape hatch for stateful logic the built-in windowed
aggregations can't express (running totals with custom emit policy,
per-entity anomaly flags, cross-batch counters).

Scale notes: state is partitioned by the grouping key across the state
store (RocksDB/HDFS-backed on a cluster); the operator must keep state
O(1) per key — these examples store two numbers per user.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_TOTALS_OUTPUT = "user_id bigint, n_events bigint, total_value double"
USER_TOTALS_STATE = "n bigint, v double"


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user event count + value total, re-emitted every
    micro-batch a user appears in (update mode). The cross-batch state is
    exactly two numbers per user.

    The update function is deliberately a CLOSURE: cloudpickle serializes
    closures by value, so Python workers never need ``vrod_spark`` on
    their import path. A module-level function would pickle by reference
    and break on any deployment where the package isn't installed on the
    workers (caught live by a driver-simulation run from outside the
    repo)."""

    def update_user_totals(key, pdfs, state: GroupState):
        import numpy as np

        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            # nansum == fillna(0).sum() (NaN↦0, empty↦0.0) without the
            # intermediate Series copies — this function runs once per
            # GROUP, so per-call pandas overhead is the operator's floor
            # (guide §4.2): 289 → 198 µs/group measured on the gate's
            # group shape.
            v += float(np.nansum(pdf["value"].to_numpy()))
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 4)]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_user_totals,
            outputStructType=USER_TOTALS_OUTPUT,
            stateStructType=USER_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ABANDON_OUTPUT = "user_id bigint, c_event_id bigint, click_us bigint, converted boolean"


def click_abandonment_timers(events: DataFrame, *, max_delay_min: int = 30) -> DataFrame:
    """Funnel abandonment with ``transformWithStateInPandas`` (Spark 4
    arbitrary state v2): per-user explicit state + event-time TIMERS.

    The left-outer interval join (streaming/ingest.click_abandonment_join)
    expresses the same question declaratively but needs TWO streams, four
    state stores per partition, and its negative rows emit only through
    the join's internal watermark bookkeeping. This operator is the
    production-native formulation on ONE stream:

    - a click is buffered in ``ListState`` and registers an event-time
      timer at click + delay;
    - a purchase converts every buffered click whose window covers it
      (emitted immediately, state cleared);
    - when the watermark passes a click's timer, the click emits
      ``converted=false`` and leaves state — explicit, prompt, and
      O(open windows) state per user.

    Purchases are buffered too (a same-batch or later click can open a
    window covering an earlier purchase) and evicted once the watermark
    proves no future click can reach them. All comparisons are in exact
    MICROSECONDS (timers are ms-granular, so expiry is rounded up +2 ms —
    firing strictly after the window closes, never early).

    The processor class is defined in-function so cloudpickle serializes
    it by value (workers cannot import vrod_spark).

    ENV NOTE: executing this operator requires ``google.protobuf`` (the
    transformWithState driver-worker protocol) which is absent from this
    container — plan construction and analysis work everywhere and are
    plan-tested; the execution roundtrip test auto-activates via
    ``pytest.importorskip`` the moment the env gains protobuf (same
    pattern as the fastembed embedding seam)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    delay_us = max_delay_min * 60_000_000

    class Abandonment(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.clicks = handle.getListState("clicks", "c_event_id bigint, c_us bigint")
            self.purchases = handle.getListState("purchases", "p_us bigint")

        def _pending(self):
            return (
                [(int(r[0]), int(r[1])) for r in self.clicks.get()]
                if self.clicks.exists()
                else []
            )

        def _purch(self):
            return (
                [int(r[0]) for r in self.purchases.get()]
                if self.purchases.exists()
                else []
            )

        def _store(self, pending, purch):
            self.clicks.clear()
            if pending:
                self.clicks.put(pending)
            self.purchases.clear()
            if purch:
                self.purchases.put([(p,) for p in purch])

        def _frame(self, user, rows):
            return pd.DataFrame(
                {
                    "user_id": [user] * len(rows),
                    "c_event_id": [r[0] for r in rows],
                    "click_us": [r[1] for r in rows],
                    "converted": [r[2] for r in rows],
                }
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            user = int(key[0])
            wm_ms = timerValues.getCurrentWatermarkInMs()
            new_clicks, new_purch = [], []
            for pdf in rows:
                for et, eid, us in zip(pdf["event_type"], pdf["event_id"], pdf["ev_us"]):
                    if et == "click":
                        new_clicks.append((int(eid), int(us)))
                    else:
                        new_purch.append(int(us))
            pending = self._pending() + new_clicks
            purch = self._purch() + new_purch
            emitted, still = [], []
            for cid, cus in pending:
                if any(cus <= pus <= cus + delay_us for pus in purch):
                    emitted.append((cid, cus, True))
                else:
                    still.append((cid, cus))
            for cid, cus in new_clicks:
                # Timer per click; ms granularity rounded up so it can
                # only fire once the µs window is provably closed.
                self.handle.registerTimer((cus + delay_us) // 1000 + 2)
            # A future click arrives with event time ≥ watermark, and can
            # only convert via a purchase at-or-after it — purchases older
            # than the watermark are unreachable, evict them.
            purch = [p for p in purch if wm_ms <= 0 or p >= wm_ms * 1000]
            self._store(still, purch)
            yield self._frame(user, emitted)

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            user = int(key[0])
            expiry_us = expiredTimerInfo.getExpiryTimeInMs() * 1000
            wm_ms = timerValues.getCurrentWatermarkInMs()
            expired, still = [], []
            for cid, cus in self._pending():
                if cus + delay_us < expiry_us:
                    expired.append((cid, cus, False))
                else:
                    still.append((cid, cus))
            # Purchases older than the watermark are unreachable here too
            # (r11 review): a key whose last inputs were purchases never
            # re-enters handleInputRows, so without this the buffered
            # purchase list leaked for the stream's lifetime.
            purch = self._purch()
            purch = [p for p in purch if wm_ms <= 0 or p >= wm_ms * 1000]
            self._store(still, purch)
            yield self._frame(user, expired)

        def close(self) -> None:
            pass

    projected = (
        # Only the funnel's two event kinds reach the operator — without
        # this filter every other type (view/signup/error) would land in
        # the purchases else-branch and falsely convert clicks.
        events.filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.expr("ts_ns div 1000").alias("ev_us"),
            "ts_evt",
        )
        .withWatermark("ts_evt", "1 hour")
    )
    return projected.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Abandonment(),
        outputStructType=ABANDON_OUTPUT,
        outputMode="Append",
        timeMode="EventTime",
    )


NEAR_DUP_OUTPUT = "doc_id bigint, band int, bucket bigint, dup_of bigint"
NEAR_DUP_STATE = "ids array<bigint>, sigs array<array<bigint>>"


def streaming_near_dup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    min_sig_agreement: float = 0.5,
    max_per_bucket: int | None = None,
) -> DataFrame:
    """Streaming near-duplicate SUPPRESSION: as documents arrive, flag
    each as a near-dup of an earlier document or admit it as novel — the
    missing streaming member of the dedup family (operators/dedup.py has
    the batch MinHash/SimHash/Jaccard/embedding paths; streaming/ingest
    has exact ``dropDuplicates``). The LLM-pipeline use is ingest-time
    corpus hygiene: suppress near-dups against ALL history without
    re-running batch dedup per delivery.

    Shape: per-row MinHash signature (``minhash_signature_expr`` — a
    stateless projection, because an aggregation here would make the
    query multi-stateful) → explode into ``bands`` LSH band buckets
    (identical banding to the batch path: xxhash64 over the
    comma-joined band slice) → ``applyInPandasWithState`` keyed by
    (band, bucket). Each bucket's state holds the (id, signature) pairs
    admitted through it; a new document whose signature agrees with a
    stored one on ≥ ``min_sig_agreement`` of the k components (the
    unbiased MinHash estimate of Jaccard similarity) emits
    ``dup_of=<earliest such id>``, else ``dup_of=NULL`` and joins the
    bucket state.

    A document appears in every band bucket its signature hashes to, so
    the per-bucket verdicts compose by OR: consolidate downstream with
    ``groupBy(doc_id).agg(min(dup_of))`` in the sink's ``foreachBatch``
    (or in batch after an availableNow run) — kept OUT of this operator
    because chaining a streaming aggregation after a stateful operator
    is the one shape Structured Streaming restricts.

    State contract at scale: O(admitted docs × k longs) per bucket and
    only NOVEL documents grow it — duplicates never enter state. History
    is deliberately unbounded (dedup against everything ever seen);
    bounded deployments pass ``max_per_bucket`` for FIFO eviction, which
    trades recall against the oldest history. Determinism: rows are
    processed in ``doc_id`` order within each micro-batch, so replays
    of the same batch make identical decisions.
    """
    from pyspark.sql import functions as F

    from vrod_spark.operators.dedup import minhash_band_expr, minhash_signature_expr

    assert k % bands == 0, "k must divide into equal bands"
    sig = minhash_signature_expr(text_col, k=k, n=n)
    banded = (
        docs.select(F.col(id_col).alias("doc_id"), sig.alias("sig"))
        .select(
            "doc_id",
            "sig",
            F.explode(minhash_band_expr("sig", k=k, bands=bands)).alias("bb"),
        )
        .select("doc_id", "sig", "bb.band", "bb.bucket")
    )

    thresh = float(min_sig_agreement)
    cap = max_per_bucket

    def update(key, pdfs, state: GroupState):
        import numpy as np

        band, bucket = int(key[0]), int(key[1])
        if state.exists:
            ids, sigs = state.get
            ids = list(ids)
            mat = [np.asarray(s, dtype=np.int64) for s in sigs]
        else:
            ids, mat = [], []
        out_id, out_dup = [], []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values("doc_id")
            for doc_id, s in zip(pdf["doc_id"], pdf["sig"]):
                sv = np.asarray(list(s), dtype=np.int64)
                dup = None
                if mat:
                    agree = (np.stack(mat) == sv).mean(axis=1)
                    hits = np.nonzero(agree >= thresh)[0]
                    if len(hits):
                        # earliest admitted match — ids grow in arrival
                        # order, so index order IS seniority order.
                        dup = ids[int(hits[0])]
                out_id.append(int(doc_id))
                out_dup.append(dup)
                if dup is None:
                    ids.append(int(doc_id))
                    mat.append(sv)
            if cap is not None and len(ids) > cap:
                ids, mat = ids[-cap:], mat[-cap:]
            state.update((ids, [m.tolist() for m in mat]))
        yield pd.DataFrame(
            {
                "doc_id": out_id,
                "band": [band] * len(out_id),
                "bucket": [bucket] * len(out_id),
                "dup_of": pd.array(out_dup, dtype="Int64"),
            }
        )

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        update,
        outputStructType=NEAR_DUP_OUTPUT,
        stateStructType=NEAR_DUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
