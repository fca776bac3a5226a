"""Cold-latency probe for the weak-query set: fresh warmed session, each
query executed once (cold plan build + execution), printed alongside the
DuckDB oracle serial time for the same SQL.  Usage:

    python tools/cold_probe.py [sf_dir] [q26_jaccard_top_pairs ...]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

DEFAULT = [
    "q22_distinct_percentiles",
    "q26_jaccard_top_pairs",
    "q26b_prob_near_dup",
    "q30_text_profile",
    "q50_decontamination",
    "q52_clean_corpus_pipeline",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT

    import bench
    from vrod_spark.session import get_spark

    spark = get_spark(app_name="cold-probe")
    bench._warmup(spark, sf_dir)

    # The raw registry, NOT __spark_entry__.queries(): the r12 gate-dump
    # wrapper adds a compare collect + a DuckDB run to each first call,
    # which would inflate every cold number here (bench.py bypasses it
    # the same way).
    from vrod_spark.queries import ORACLES as oracles
    from vrod_spark.queries import QUERIES as qs

    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    print(f"{'query':35s} {'cold_s':>8s} {'warm_s':>8s} {'duck_s':>8s} {'ratio':>6s}")
    for name in names:
        start = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        cold = time.perf_counter() - start
        start = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        warm = time.perf_counter() - start
        duck = float("nan")
        if name in oracles:
            start = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            duck = time.perf_counter() - start
        ratio = cold / duck if duck == duck and duck > 0 else float("nan")
        print(f"{name:35s} {cold:8.3f} {warm:8.3f} {duck:8.3f} {ratio:6.2f}")


if __name__ == "__main__":
    main()
