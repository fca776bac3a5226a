"""Per-stream micro-batch profiler for the five streaming gates.

For each gate stream (run in isolation, same builder form the gates use)
this prints: number of micro-batches, per-batch durationMs breakdown
(addBatch / getBatch / latestOffset / queryPlanning / walCommit /
commitOffsets), and rows processed — the evidence base for micro-batch
floor work (guide §1.4-1.5). Reuses run_to_completion's exact setup so
the numbers are the gate's numbers.

Usage: python tools/stream_probe.py /root/testdata/sf0.1 [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vrod_spark.session import get_spark  # noqa: E402


def probe(spark, name, builder, *, output_mode, state_partitions):
    """run_to_completion's body, instrumented: returns (wall, progresses)."""
    from vrod_spark.streaming.ingest import _scratch_root

    session = spark.newSession()
    if state_partitions is not None:
        session.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    stream_df = builder(session)
    qname = f"probe_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(_scratch_root(), qname)
    t0 = time.perf_counter()
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    wall = time.perf_counter() - t0
    progresses = [json.loads(p.json) for p in q.recentProgress]
    n_rows = session.table(qname).count()
    q.stop()
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    return wall, progresses, n_rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark()
    from pyspark.sql import functions as F

    from vrod_spark.streaming.ingest import (
        click_purchase_join,
        click_abandonment_join,
        dedup_stream,
        events_stream,
        session_stats,
        sliding_counts,
        tumbling_counts,
    )
    from vrod_spark.streaming.stateful import stateful_user_totals

    gates = {
        "q34_tumbling(complete)": (
            lambda s: tumbling_counts(events_stream(s, sf_dir)),
            "complete",
            2,
        ),
        "q36_sessions(complete)": (
            lambda s: session_stats(events_stream(s, sf_dir), gap="10 minutes"),
            "complete",
            2,
        ),
        "q37_distinct(complete)": (
            lambda s: dedup_stream(events_stream(s, sf_dir))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_unique")),
            "complete",
            2,
        ),
        "q34_sliding(complete)": (
            lambda s: sliding_counts(events_stream(s, sf_dir)),
            "complete",
            2,
        ),
        "q40_totals(update)": (
            lambda s: stateful_user_totals(events_stream(s, sf_dir)),
            "update",
            2,
        ),
        "q46_pairs(append)": (
            lambda s: click_purchase_join(events_stream(s, sf_dir), max_delay="30 minutes"),
            "append",
            2,
        ),
        "q46_outer(append)": (
            lambda s: click_abandonment_join(events_stream(s, sf_dir), max_delay="30 minutes"),
            "append",
            2,
        ),
    }
    for rep in range(reps):
        for name, (builder, mode, parts) in gates.items():
            try:
                wall, progs, n_rows = probe(
                    spark, name, builder, output_mode=mode, state_partitions=parts
                )
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: ERROR {type(exc).__name__}: {exc}")
                continue
            print(f"\n=== {name} rep{rep}: wall {wall:.2f}s, {len(progs)} batches, {n_rows} sink rows")
            for p in progs:
                dm = p.get("durationMs", {})
                rows = p.get("numInputRows", 0)
                print(
                    f"  batch {p.get('batchId')}: rows={rows} "
                    f"triggerExecution={dm.get('triggerExecution')} "
                    f"addBatch={dm.get('addBatch')} latestOffset={dm.get('latestOffset')} "
                    f"getBatch={dm.get('getBatch')} queryPlanning={dm.get('queryPlanning')} "
                    f"walCommit={dm.get('walCommit')} commitOffsets={dm.get('commitOffsets')} "
                    f"stateOps={json.dumps(p.get('stateOperators', []))[:200]}"
                )


if __name__ == "__main__":
    main()
