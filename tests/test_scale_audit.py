"""CI promotion of tools/scale_audit.py (r11 verdict ask #8): the
exchange SHAPE of every audited headline query must be identical at
sf0.001 and sf0.01 — a shuffle count that varies with SF, or a
broadcast that degrades to a shuffle as the data grows, is a hidden
data-dependent stage that becomes the 100 TB cliff the round it
regresses, and should fail CI that round, not a later ad-hoc audit.

Plans are built but NOT executed (the ad-hoc tool also measures walls;
CI only needs shapes), so the whole matrix costs plan-build time —
~60-90 s for 15 queries x 2 SFs on this box, dominated by the few
queries that train bounded models at plan-construction time. sf0.1 is
deliberately excluded (runtime budget; the per-round ad-hoc tool still
covers it).
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scale_audit import DEFAULT, plan_shape  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


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
