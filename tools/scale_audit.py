"""Scale audit: evidence that plans are SCALE-INVARIANT in shape.

The 100 TB question is never "is it fast at sf0.1" — it is "does the
PLAN change shape as the data grows". A query whose physical plan holds
the same exchange (shuffle/broadcast) structure at sf0.001, sf0.01, and
sf0.1 scales by adding partitions/executors, not by re-planning; one
whose exchange count GROWS with SF has a hidden data-dependent stage
(a driver collect feeding a literal, a size-triggered join-strategy
flip on the BIG side) that becomes the bottleneck at 1000x.

For each audited query this tool reports, per SF:
- #shuffle exchanges / #broadcast exchanges in the final plan
  (AQE's isFinalPlan=false initial plan — strategy flips on the big
  side would still show as a changed exchange structure),
- serial execution wall.

Broadcast-count DECREASES at larger SF are flagged loudly (a broadcast
that silently becomes a shuffle at scale is the classic 100 TB cliff);
CBO/AQE flips TO broadcast at small SF are reported as info.

Run: ``python tools/scale_audit.py [q1 q2 ...]``.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

#: Headline queries across the operator families: relational joins/aggs,
#: windows, dedup (exact + LSH + embedding), text pipelines, retrieval,
#: sampling, graph. Engine-roundtrip and streaming gates are excluded
#: (their walls are verb/write-job floors, not scan-proportional work).
DEFAULT = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q04_window_rank",
    "q08b_dedup_keep_first",
    "q22_distinct_percentiles",
    "q25_distribution_windows",
    "q26_jaccard_top_pairs",
    "q28_embedding_near_dup",
    "q29_lang_quality",
    "q30_text_profile",
    "q49_repetition_ratio",
    "q50_decontamination",
    "q52_clean_corpus_pipeline",
    "q53_vocab_top_tokens",
    "q54_mixture_sampling",
    "q59_corpus_assembly",
]


def plan_shape(df) -> tuple[int, int]:
    from vrod_spark.plans.inspect import explain_str

    plan = explain_str(df, "formatted")
    shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
    bcasts = len(re.findall(r"\(\d+\) BroadcastExchange\b", plan))
    return shuffles, bcasts


def main() -> int:
    names = sys.argv[1:] or DEFAULT

    import bench
    from vrod_spark.queries import QUERIES
    from vrod_spark.session import get_spark

    spark = get_spark(app_name="scale-audit")
    bench._warmup(spark, SFS[-1])
    failures = 0
    print(f"{'query':<34} {'sf':>7} {'shuf':>5} {'bcast':>6} {'wall_s':>8}")
    for name in names:
        fn = QUERIES[name]
        rows = []
        for sf in SFS:
            df = fn(spark, sf)
            shuf, bc = plan_shape(df)
            t0 = time.time()
            df.collect()
            rows.append((sf.rsplit("sf", 1)[-1], shuf, bc, time.time() - t0))
        for sf, shuf, bc, wall in rows:
            print(f"{name:<34} {sf:>7} {shuf:>5} {bc:>6} {wall:>8.2f}")
        shufs = {r[1] for r in rows}
        bcs = [r[2] for r in rows]  # ordered small SF → large SF
        # A query can violate BOTH checks — count it as ONE unstable
        # query, not two, so the N/M summary stays a query tally.
        failed = False
        if len(shufs) > 1:
            failed = True
            print(f"{name}: FAIL — shuffle-exchange count varies with SF: "
                  f"{[r[1] for r in rows]}")
        if any(b < bcs[0] for b in bcs[1:]):
            # FEWER broadcasts at a LARGER sf = a broadcast silently
            # degraded as the data grew — the classic 100 TB cliff.
            failed = True
            print(f"{name}: FAIL — broadcast count drops as SF grows: {bcs}")
        elif len(set(bcs)) > 1:
            # more broadcasts at larger sf (CBO flip toward broadcast)
            # is not a scaling hazard — report as info.
            print(f"{name}: info — broadcast counts across SFs: {bcs}")
        failures += int(failed)
    print(f"\n{len(names) - failures}/{len(names)} shape-stable")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
