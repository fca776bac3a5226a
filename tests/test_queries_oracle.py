"""t2 correctness: every declared query hash-matches its DuckDB oracle
(at smoke scale here; the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from tools.check_oracle import canon, duck_connect
from vrod_spark.queries import ORACLES, QUERIES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    rel = duck.execute(ORACLES[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert canon(srows, sdf.columns) == canon(drows, dcols)
