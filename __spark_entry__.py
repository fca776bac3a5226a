"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship SEARCHSIMILAR query (exact kNN over the
embeddings collection — the reference's raison d'être, builder.rs:68-72) on
sf0.001. ``queries()`` / ``oracle_sql()`` expose the declared corpus from
``vrod_spark.queries`` (SURVEY.md §2.4) for the DuckDB correctness gate.

Gate dumps (r10, widened r12): every ``queries()`` entry is wrapped so
a red gate leaves evidence in ``gate_dumps/`` IN THE DRIVER'S OWN
ENVIRONMENT, making the diagnosis a one-file diff instead of another
blind hardening round (r8-r10 HUGEINT and r11 NaN both burned a round
for lack of exactly this):

- build or collect raises → ``{name}.error.txt`` (traceback + env
  fingerprint), the exception still propagating to the driver;
- the in-wrapper oracle compare mismatches → both engines'
  canonicalized rows + status + env;
- gates in ``VROD_GATE_DUMPS`` (default: the float-ordering-sensitive
  set) → rows dumped unconditionally, even when green.

The compare costs one extra collect + DuckDB run per gate at the
correctness gate's sf0.01 — bench.py imports ``vrod_spark.queries``
directly and never pays for any of this. Disable with
``VROD_GATE_DUMPS=`` (empty) and ``VROD_GATE_DUMP_ALL=0``.
"""

from __future__ import annotations

import math
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from vrod_spark.queries import ORACLES, QUERIES  # noqa: E402

#: Gates whose rows are dumped even when the in-wrapper compare says
#: match — the float-ordering-sensitive set (tools/perturb_gates.GATES)
#: whose pins have historically drifted between environments.
_DUMP_GATES = tuple(
    g
    for g in os.environ.get(
        "VROD_GATE_DUMPS",
        "q05_knn_metrics,q28b_embedding_near_dup_bucketed,"
        "q49_repetition_ratio,q53_vocab_top_tokens,"
        "q48_dedup_engine_roundtrip,q54_mixture_sampling",
    ).split(",")
    if g
)
#: Wrap EVERY gate with error-dump + compare-mismatch-dump (r12). "0"
#: restores the r10 behavior (only _DUMP_GATES, unconditionally).
_DUMP_ALL = os.environ.get("VROD_GATE_DUMP_ALL", "1") != "0"
_DUMP_DIR = os.path.join(_REPO, "gate_dumps")


def _canon_lines(rows, colnames) -> list[str]:
    """Order-insensitive canonical text form of a result set. Floats are
    written BOTH 6dp-rounded (the compare grid tools/check_oracle.py uses)
    and full-repr — the full repr is what turns an ulp-level drift into a
    visible diff."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                r6 = "NaN" if math.isnan(v) else repr(round(v, 6))
                vals.append(f"{r6}⟦{v!r}⟧")
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            else:
                vals.append(repr(v))
        out.append("\t".join(vals))
    return sorted(out)


def _env_fingerprint(spark: SparkSession) -> str:
    import platform

    import duckdb
    import numpy
    import pandas
    import pyarrow
    import pyspark

    jvm_props = {}
    try:
        jsys = spark.sparkContext._jvm.java.lang.System  # type: ignore[union-attr]
        for p in ("java.version", "user.language", "user.country", "user.timezone"):
            jvm_props[p] = jsys.getProperty(p)
    except Exception:
        pass
    confs = {}
    for k in (
        "spark.master",
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        "spark.default.parallelism",
    ):
        try:
            confs[k] = spark.conf.get(k, "<unset>")
        except Exception:
            confs[k] = "<error>"
    envs = {
        k: os.environ.get(k, "<unset>")
        for k in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                  "TZ", "LANG", "LC_ALL", "SPARK_GRAFT_CPUS")
    }
    lines = [
        f"python={sys.version!r}",
        f"platform={platform.platform()}",
        f"pyspark={pyspark.__version__} duckdb={duckdb.__version__} "
        f"numpy={numpy.__version__} pandas={pandas.__version__} "
        f"pyarrow={pyarrow.__version__}",
        f"jvm={jvm_props}",
        f"conf={confs}",
        f"env={envs}",
    ]
    return "\n".join(lines) + "\n"


def _dump_gate(
    name: str, df: DataFrame, spark: SparkSession, sf_dir: str, always: bool
) -> None:
    import duckdb

    from vrod_spark.sources.tables import TABLE_NAMES

    srows = [tuple(r) for r in df.collect()]
    slines = _canon_lines(srows, df.columns)
    dlines: list[str] = []
    dcols: list[str] = []
    if name in ORACLES:
        con = duckdb.connect()
        try:
            for t in TABLE_NAMES:
                path = os.path.join(sf_dir, f"{t}.parquet")
                if os.path.exists(path):
                    con.execute(
                        f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{path}')"
                    )
            rel = con.execute(ORACLES[name])
            dcols = [d[0] for d in rel.description]
            dlines = _canon_lines(rel.fetchall(), dcols)
        finally:
            con.close()
    # Strip the full-repr suffix for the match verdict: the driver's own
    # compare works on a rounded grid, and ulp-level float tails would
    # make every legitimately-matching float row read as a mismatch here.
    def grid(lines: list[str]) -> list[str]:
        import re

        return [re.sub("⟦[^⟧]*⟧", "", ln) for ln in lines]

    if name not in ORACLES:
        # rows-only gate: no duck side exists — a MISMATCH verdict here
        # would falsely report an engine disagreement.
        verdict = "no-oracle"
    elif grid(slines) == grid(dlines) and sorted(df.columns) == sorted(dcols):
        verdict = "match"
    else:
        verdict = "MISMATCH"
    if not always and verdict != "MISMATCH":
        # Green again: retire any stale red evidence from an earlier
        # round so it cannot read as live red — but ARCHIVE it
        # (rename → .prev) instead of unlinking (r12 advice): the
        # wrapper's verdict uses the 6dp-rounded grid, and if the
        # driver's own compare disagrees (the r8/r9 'driver red, every
        # re-run green' shape), the prior round's evidence is exactly
        # what the diagnosis needs.
        _archive_dump(name)
        return
    os.makedirs(_DUMP_DIR, exist_ok=True)
    with open(os.path.join(_DUMP_DIR, f"{name}.spark.txt"), "w") as f:
        f.write("\t".join(sorted(df.columns)) + "\n")
        f.write("\n".join(slines) + "\n")
    if name in ORACLES:
        with open(os.path.join(_DUMP_DIR, f"{name}.duck.txt"), "w") as f:
            f.write("\t".join(sorted(dcols)) + "\n")
            f.write("\n".join(dlines) + "\n")
    with open(os.path.join(_DUMP_DIR, f"{name}.status.txt"), "w") as f:
        f.write(f"{verdict} sf_dir={sf_dir} spark_rows={len(slines)} "
                f"duck_rows={len(dlines)}\n")
    with open(os.path.join(_DUMP_DIR, "env.txt"), "w") as f:
        f.write(_env_fingerprint(spark))
    # A successful dump supersedes any earlier error record (archived,
    # not unlinked — same rationale as _archive_dump).
    err = os.path.join(_DUMP_DIR, f"{name}.error.txt")
    try:
        os.replace(err, err + ".prev")
    except OSError:
        pass


def _archive_dump(name: str) -> None:
    """Move a gate's live dump files aside as ``*.txt.prev`` (latest
    superseded evidence only — each archive overwrites the previous one)."""
    for suffix in ("status", "spark", "duck", "error"):
        live = os.path.join(_DUMP_DIR, f"{name}.{suffix}.txt")
        try:
            os.replace(live, live + ".prev")
        except OSError:
            pass


def _dump_error(name: str, spark: SparkSession, sf_dir: str) -> None:
    import traceback

    os.makedirs(_DUMP_DIR, exist_ok=True)
    with open(os.path.join(_DUMP_DIR, f"{name}.error.txt"), "w") as f:
        f.write(f"sf_dir={sf_dir}\n")
        f.write(traceback.format_exc())
        try:
            f.write("\n" + _env_fingerprint(spark))
        except Exception:
            f.write("\n<env fingerprint failed>\n")


def _with_dump(name: str, fn: Callable, always: bool) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            df = fn(spark, sf_dir)
        except Exception:
            # A build-time raise (r11: HISTORY's createDataFrame died on
            # the driver's non-Arrow path) leaves its traceback + env in
            # gate_dumps/ and still propagates — the driver must see red.
            try:
                _dump_error(name, spark, sf_dir)
            except Exception:
                pass
            raise
        try:
            _dump_gate(name, df, spark, sf_dir, always)
        except Exception:
            # A collect-time raise is recorded too, but NOT propagated:
            # the driver's own collect will hit it and own the verdict —
            # diagnostics must never break (or fail) the gate themselves.
            try:
                _dump_error(name, spark, sf_dir)
            except Exception:
                pass
        return df

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q05_knn_metrics"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable] = dict(QUERIES)
    for name in out:
        always = name in _DUMP_GATES
        if always or _DUMP_ALL:
            out[name] = _with_dump(name, out[name], always)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    return dict(ORACLES)
