"""SparkSession factory tuned for the engine.

Defaults are sized for local[N] testing but every knob is the one that
matters on a real cluster too: AQE for runtime re-planning (skew joins,
partition coalescing), Arrow for the Python boundary, UTC session time
zone so results are oracle-comparable, and shuffle partitions matched to
parallelism instead of the legacy 200.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

#: Default local-mode driver heap. In local mode the ONE JVM is driver +
#: all executor threads, and Spark's own default is 1 GiB — marginal
#: under a ~50-query concurrent suite (the BENCH_r12 death).
DEFAULT_DRIVER_MEM = "12g"


_MEM_UNIT_MIB = {"k": 1 / 1024, "m": 1, "g": 1024, "t": 1024 * 1024}
#: Spark's own driver floor is ~450 MiB (it refuses to start below it);
#: anything smaller is a typo, not a choice.
_MIN_DRIVER_MIB = 512


def parse_driver_mem(raw: str | None) -> str:
    """Tolerant parse of the SPARK_GRAFT_DRIVER_MEM knob: a JVM memory
    string (digits + k/m/g/t unit) of at least 512 MiB passes through
    lowercased; anything else — empty, garbage, a bare number (Spark
    reads "12" as 12 MiB, far below its own floor, never what the
    operator meant), or a sub-floor value like "0g"/"1k" the JVM cannot
    start with — falls back to the default instead of crashing deep
    inside the py4j gateway launch (the r11 SPARK_GRAFT_CPUS lesson).
    The substitution is LOUD (one stderr line) whenever a non-empty
    value is overridden — a silently upsized heap on a constrained box
    is its own failure mode."""
    import sys

    val = (raw or "").strip().lower()
    # Optional trailing 'b' (r13 advice): Spark's own JavaUtils
    # byteStringAsBytes accepts '12gb'/'2048mb' — rejecting them here
    # silently substituted a 12g default for an operator deliberately
    # capping the heap. Normalize to the single-letter form.
    m = re.fullmatch(r"([0-9]+)([kmgt])b?", val)
    if m and int(m.group(1)) * _MEM_UNIT_MIB[m.group(2)] >= _MIN_DRIVER_MIB:
        return m.group(1) + m.group(2)
    if val:
        print(
            f"SPARK_GRAFT_DRIVER_MEM={raw!r} is not a usable JVM memory "
            f"string (need digits + k/m/g/t unit, >= {_MIN_DRIVER_MIB}m); "
            f"using {DEFAULT_DRIVER_MEM}",
            file=sys.stderr,
            flush=True,
        )
    return DEFAULT_DRIVER_MEM


def get_spark(
    app_name: str = "vrod-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a cluster, ``master`` comes from spark-submit; locally we default to
    ``local[$SPARK_GRAFT_CPUS]`` (all cores). ``shuffle_partitions`` defaults
    to the local parallelism; at 100 TB scale it should be set so that
    post-shuffle partitions land in the 100-200 MB range — AQE's
    ``coalescePartitions`` handles the fine-tuning at runtime either way.
    """
    # Tolerant parse for BOTH env knobs (r11 review: only SHUFFLE was
    # tolerant; `SPARK_GRAFT_CPUS= python bench.py` crashed on int('')
    # and produced master 'local[]'): empty/garbage/non-positive falls
    # back to '*'.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*").strip() or "*"
    if cpus != "*":
        try:
            cpus = str(max(int(cpus), 1))
        except ValueError:
            cpus = "*"
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            env_shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE") or "0")
        except ValueError:
            env_shuffle = 0
        shuffle_partitions = (
            env_shuffle if env_shuffle > 0 else (32 if cpus == "*" else int(cpus))
        )

    # Driver heap (r12 verdict's hard failure): in local mode the ONE JVM
    # is driver + all executor threads, and Spark's default is 1 GiB —
    # marginal under a ~50-query concurrent suite with a 64 MB broadcast
    # threshold, a 4096-entry codegen cache, and eagerly-materialized
    # shared snapshots (BENCH_r12 died mid-suite with py4j
    # ConnectionRefused when the default-heap JVM exited; the GCLocker
    # warnings at the -Xlog config below were the earlier symptom). Only
    # binds when THIS call launches the JVM (always in practice — the
    # factory is the engine's entry point); on a cluster spark-submit
    # owns it. Tolerant parse: see parse_driver_mem.
    driver_mem = parse_driver_mem(os.environ.get("SPARK_GRAFT_DRIVER_MEM"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE sort-merge → shuffled-hash rewrite (guide §3.1): OFF by
        # default (Spark's own default). Isolated-query probes favored it
        # (q53 0.84→0.56 s, q54 1.31→0.97 s, q42 0.71→0.57 s serial at
        # sf0.1), but the engine is multi-tenant: under the 46-query
        # concurrent suite every converted join's per-partition hash
        # build bids against every other query's operators for the ONE
        # unified execution-memory pool, and the suite wall regressed
        # 12-13 s → ≥17.3 s across 8 measured passes (min-statistics;
        # same windows read 9.2-15.7 s with the rewrite off — r16
        # bisect, OPTIMIZATION_r16.md). Sort-merge's streaming/spill
        # path degrades gracefully under that contention; the hash build
        # does not. Deployments with per-executor memory isolation (a
        # real cluster, where concurrent queries do not share one pool)
        # can opt in: VROD_SHJ_LOCALMAP_BYTES=67108864.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("VROD_SHJ_LOCALMAP_BYTES", "0"),
        )
        # Fair scheduling across concurrently-submitted jobs (the engine is
        # multi-tenant: the SQL surface, streams, and bench submit from
        # many threads; FIFO would head-of-line-block behind big stages).
        .config("spark.scheduler.mode", "FAIR")
        # Arrow-vectorized transfer for every Python/pandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic, oracle-comparable timestamps.
        .config("spark.sql.session.timeZone", "UTC")
        # Small dims (region/nation/supplier) should always broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Generated-class cache sized for the engine's query library. The
        # default (100 entries) evicts constantly under a ~50-query
        # workload whose plans compile to several classes each, so every
        # re-planned query pays Janino again; a long-lived engine keeps
        # its compiled operators resident (read at first codegen — must be
        # set at session build, not at runtime).
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        # Python workers over Unix domain sockets (Spark 4.1+): the local
        # TCP loopback path pays Nagle/delayed-ACK style stalls on every
        # JVM->worker task handshake (~60 ms per python-boundary job
        # measured on this kernel); UDS has no such machinery. Safe on a
        # single host; on a cluster the sockets are per-executor-local
        # anyway.
        .config("spark.python.unix.domain.socket.enabled", "true")
        # JVM unified logging defaults to STDOUT (-Xlog:all=warning:stdout),
        # so a GC warning under memory pressure (observed: "Retried waiting
        # for GCLocker too often") lands BETWEEN bench.py's JSON lines and
        # corrupts any stdout-JSON consumer. Route JVM warnings to stderr;
        # only effective for sessions that launch the JVM (i.e. always in
        # practice — the factory is the engine's entry point).
        .config(
            "spark.driver.defaultJavaOptions",
            "-Xlog:all=warning:stderr:uptime,level,tags",
        )
        # Quiet UI/retries for non-interactive runs.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    # Pool declarations (vrod_build, the weighted FAIR pool the session-
    # shared snapshot builders can OPT INTO via VROD_BUILD_POOL — see
    # conf/fairscheduler.xml and queries._shared_cached; nothing selects
    # it by default). Undeclared pools keep Spark's defaults, so the file
    # changes nothing for ordinary query jobs. Only set when the file
    # actually exists: an explicitly-configured missing allocation file
    # fails SparkContext start, whereas omitting the conf just leaves
    # every pool at default.
    alloc = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "conf", "fairscheduler.xml"
    )
    if os.path.exists(alloc):
        builder = builder.config("spark.scheduler.allocation.file", alloc)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
