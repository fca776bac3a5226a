"""CI promotion of tools/scale_audit.py (r11 verdict ask #8): the
exchange SHAPE of every audited headline query must be identical at
sf0.001 and sf0.01 — a shuffle count that varies with SF, or a
broadcast that degrades to a shuffle as the data grows, is a hidden
data-dependent stage that becomes the 100 TB cliff the round it
regresses, and should fail CI that round, not a later ad-hoc audit.

Plans are built but NOT executed (the ad-hoc tool also measures walls;
CI only needs shapes), so the whole matrix costs plan-build time —
~60-90 s for the 16 audited queries x 2 SFs on this box, dominated by
the few queries that train bounded models at plan-construction time.
sf0.1 is deliberately excluded (runtime budget; the per-round ad-hoc
tool still covers it).
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scale_audit import DEFAULT, plan_shape  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

#: The single-partition-window audit covers the shape-audited plans PLUS
#: every window-bearing gate (r14 verdict item 1: q25's unpartitioned
#: ntile/percent_rank was the last unbounded single-partition WindowExec;
#: this list keeps the whole surface regression-proof).
WINDOW_AUDIT = sorted(
    set(DEFAULT)
    | {
        "q03_top_orders",
        "q04_window_rank",
        "q07_knn_per_label",
        "q15_window_analytics",
        "q22_distinct_percentiles",
        "q25_distribution_windows",
    }
)


@pytest.mark.skipif(
    not all(os.path.isdir(sf) for sf in SFS), reason="driver testdata absent"
)
@pytest.mark.parametrize("name", DEFAULT)
def test_plan_shape_invariant_across_sf(spark, name):
    # RAW builders: the plan cache can hand back an already-EXECUTED
    # DataFrame (another test collected it), whose explain shows the
    # final AQE plan — runtime-converted exchanges would make the shape
    # compare order-dependent across the test session.
    from vrod_spark.queries import RAW_QUERIES

    shapes = []
    for sf in SFS:
        shapes.append(plan_shape(RAW_QUERIES[name](spark, sf)))
    shufs = [s for s, _ in shapes]
    bcs = [b for _, b in shapes]
    assert len(set(shufs)) == 1, (
        f"{name}: shuffle-exchange count varies with SF "
        f"{list(zip(SFS, shufs))} — a data-dependent stage appeared"
    )
    assert all(b >= bcs[0] for b in bcs[1:]), (
        f"{name}: broadcast count DROPS as SF grows {list(zip(SFS, bcs))} "
        f"— a broadcast silently degraded to a shuffle"
    )


@pytest.mark.skipif(
    not os.path.isdir(SFS[0]), reason="driver testdata absent"
)
@pytest.mark.parametrize("name", WINDOW_AUDIT)
def test_no_unbounded_single_partition_window(spark, name):
    """r14 verdict item 1: no audited plan may contain a WindowExec fed
    by a SinglePartition exchange over an unbounded subtree — the
    every-row-through-one-task shape that was q25's 100x cliff. Bounded
    feeders (a tiny aggregate histogram, a limit) are allowed; the
    detector's contract lives in plans/inspect.py."""
    from vrod_spark.plans.inspect import single_partition_window_violations
    from vrod_spark.queries import RAW_QUERIES

    # sf0.001: SinglePartition insertion is STRUCTURAL (AllTuples
    # required distribution), not stats-driven, so the smoke SF proves
    # the same property while sharing the suite's warm model caches.
    violations = single_partition_window_violations(
        RAW_QUERIES[name](spark, SFS[0])
    )
    assert not violations, f"{name}: {violations}"


@pytest.mark.skipif(
    not os.path.isdir(SFS[0]), reason="driver testdata absent"
)
def test_no_planner_forced_single_partition_anywhere(spark):
    """Generalized r15 audit over EVERY gate plan: Catalyst must never
    insert a SinglePartition exchange (ENSURE_REQUIREMENTS) over an
    unbounded subtree to satisfy a distribution — whatever the consumer.
    Explicit repartition(1) collapses are exempt (authorial, bound
    argued at the call site); planner-forced ones are always an accident
    and a 100x cliff."""
    from vrod_spark.plans.inspect import unbounded_single_partition_violations
    from vrod_spark.queries import RAW_QUERIES

    bad = {}
    for name in sorted(RAW_QUERIES):
        violations = unbounded_single_partition_violations(
            RAW_QUERIES[name](spark, SFS[0])
        )
        if violations:
            bad[name] = violations
    assert not bad, f"planner-forced single-partition stages: {bad}"


def test_detector_flags_high_cardinality_aggregate_feed(spark):
    """r15 verdict's one residual soft spot, closed in r16: the audit
    used to accept ANY Aggregate below a SinglePartition exchange as
    bounding, so a high-cardinality groupBy feeding an unpartitioned
    window slipped through. The tightened detector accepts only global
    aggregates, all-literal keys, and call-site-declared `_bounded_`
    keys — this synthetic groupBy(high_card_key) → global window plan
    MUST be flagged by both detectors."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vrod_spark.plans.inspect import (
        single_partition_window_violations,
        unbounded_single_partition_violations,
    )

    high_card = (
        spark.range(100_000)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(Window.orderBy("id")))
    )
    assert single_partition_window_violations(high_card), (
        "high-cardinality aggregate feeding a SinglePartition window "
        "was not flagged — the r15 _BOUNDED_MARKERS hole is back"
    )
    assert unbounded_single_partition_violations(high_card)

    # Positive controls: the declared-bounded and global-aggregate forms
    # must stay clean.
    declared = (
        spark.range(100_000)
        .groupBy((F.col("id") % 8).alias("_bounded_g"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(Window.orderBy("_bounded_g")))
    )
    assert not single_partition_window_violations(declared)
    glob = (
        spark.range(100_000)
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(Window.orderBy("c")))
    )
    assert not single_partition_window_violations(glob)


@pytest.mark.skipif(
    not os.path.isdir(SFS[1]), reason="driver testdata absent"
)
def test_q25_ordinal_contract(spark):
    """r15 verdict item 2: q25's two-pass rank arithmetic assumes the
    ``monotonically_increasing_id`` contract — id = pid·2³³ + DENSE
    0-based local index within a pinned range exchange — so global
    rn = broadcast_offset + local ordinal. Pin that contract at runtime
    with the exact construction q25 uses (queries.py:1560-1570): per
    partition the minted local ordinals must be exactly 1..cnt (dense,
    min 1, max == count), and the histogram total must equal the table
    count. A Spark-version semantic change (id stride, non-dense ids,
    AQE re-coalescing the pinned exchange) fails HERE, loudly, not as
    silent rank corruption in q25's output."""
    from pyspark.sql import functions as F

    from vrod_spark.sources.tables import load_table

    cust = load_table(spark, SFS[1], "customer")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    local = (
        cust.repartitionByRange(n_parts, "c_acctbal", "c_custkey")
        .sortWithinPartitions("c_acctbal", "c_custkey")
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrn",
            F.col("_mid") - F.col("_pid").cast("long") * F.lit(1 << 33) + 1,
        )
    )
    hist = (
        local.groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("_lrn").alias("lo"),
            F.max("_lrn").alias("hi"),
            F.countDistinct("_lrn").alias("nd"),
        )
        .collect()
    )
    total = cust.count()
    assert sum(r["cnt"] for r in hist) == total > 0
    for r in hist:
        assert r["lo"] == 1, f"partition {r['_pid']}: ordinals not 1-based ({r['lo']})"
        assert r["hi"] == r["cnt"], (
            f"partition {r['_pid']}: max ordinal {r['hi']} != count {r['cnt']} — "
            "monotonically_increasing_id is no longer pid*2^33 + dense index"
        )
        assert r["nd"] == r["cnt"], f"partition {r['_pid']}: ordinals not distinct"


def test_shared_snapshots_never_cache_in_heap(spark):
    """r13 (verdict item 4): every session-shared materialized snapshot
    must keep its blocks OUT of the execution heap — the r12 JVM death
    was MEMORY_AND_DISK localCheckpoint blocks stacking on top of
    broadcasts + codegen cache under the concurrent suite. Pin the
    storage level of the blocks _shared_materialized actually creates
    (df.storageLevel stays NONE for checkpointed frames; the truth is in
    the SparkContext's RDD storage info)."""
    from vrod_spark.queries import _shared_materialized

    def storage_levels() -> dict[int, str]:
        return {
            info.id(): info.storageLevel().toString()
            for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    before = storage_levels()
    df = _shared_materialized(
        spark, ("scale_audit_heap_probe",), lambda: spark.range(1000)
    )
    assert df.count() == 1000
    # Diff against the pre-materialization snapshot: a shared pytest
    # session may carry other tests' (legitimately heap-cached) RDDs.
    ours = {
        rid: lvl for rid, lvl in storage_levels().items() if rid not in before
    }
    assert ours, "no cached RDD appeared for the shared snapshot"
    for rid, lvl in ours.items():
        assert "memory" not in lvl.lower(), (
            f"shared snapshot blocks are heap-resident (rdd {rid}: {lvl}) — "
            "the r12 concurrent-suite death mode"
        )
