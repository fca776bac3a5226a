"""Reader/writer for the reference's text vector format.

One record per line: ``f32,f32,...,f32;payload`` — the exact sink format of
the reference's embedding pipeline (write_embeddings_to_file,
/root/reference/src/utils/embeddings.rs:55-62). Kept for format parity so a
vRod user's existing embedding files bulk-load directly.

Parsing is pure built-in expressions (split / transform / cast) — JVM-side,
no Python per-row cost; at scale this is a plain distributed text scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_vectors_txt(spark: SparkSession, path: str) -> DataFrame:
    """Text vector file → records (id, embedding, payload, meta).

    The format has no explicit id (ordinal position is the reference's only
    identity, SURVEY §1.2) — we mint a stable id from the line's position
    per file via a zipWithIndex-free monotonic id + window-less approach:
    ids are unique but not necessarily dense across partitions, which is
    exactly what an id column needs to be at scale.
    """
    raw = spark.read.text(path)
    # Split on the FIRST ';' only (limit=2), exactly like the Python
    # DataSource reader's str.partition: a payload containing ';' must
    # survive the write→read roundtrip intact, and a line with no ';'
    # yields payload '' on both readers (r11 review — getItem(1) of an
    # unlimited split truncated 'a;b' to 'a'). F.get, not getItem: under
    # ANSI mode an out-of-bounds getItem THROWS on the no-';' line.
    vec_part = F.split(F.col("value"), ";", 2).getItem(0)
    payload = F.coalesce(
        F.get(F.split(F.col("value"), ";", 2), 1), F.lit("")
    )
    # try_cast, not cast: under Spark 4's default ANSI mode a malformed
    # float component would THROW and fail the whole scan — one corrupt
    # line in a TB-scale corpus must instead degrade to a NULL element.
    # Empty components (trailing commas, empty vector part) are dropped
    # before the cast; the Python DataSource reader mirrors both
    # semantics exactly.
    embedding = F.transform(
        F.filter(F.split(vec_part, ","), lambda x: F.length(x) > 0),
        lambda x: x.try_cast("float"),
    )
    return (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.monotonically_increasing_id().alias("id"),
            embedding.alias("embedding"),
            payload.alias("payload"),
            F.lit(None).cast("map<string,string>").alias("meta"),
        )
    )


def write_vectors_txt(df: DataFrame, path: str, *, single_file: bool = False) -> None:
    """Records → ``f32,...,f32;payload`` lines (embeddings.rs:55-62 parity)."""
    lines = df.select(
        F.concat_ws(
            ";",
            F.concat_ws(",", F.transform(F.col("embedding"), lambda x: x.cast("string"))),
            F.coalesce(F.col("payload"), F.lit("")),
        ).alias("value")
    )
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)


def register_vector_datasource(spark: SparkSession) -> None:
    """Register the reference's vector text format as a first-class
    PYTHON DATA SOURCE (Spark 4 ``pyspark.sql.datasource`` API):

        spark.read.format("vrod_vectors").load(path)

    One InputPartition per file → parallel scans; each executor parses its
    own file, no driver involvement. Ids are minted as
    ``(partition_index << 40) | line_number`` — unique and stable (the
    format's only identity is ordinal position, SURVEY §1.2), not dense,
    which is what an id needs to be at scale.

    The source is also a STREAMING source (``spark.readStream.format(
    "vrod_vectors").load(dir)``): the reference's embedding pipeline
    appends vector files, and the stream tails the directory — offsets
    are an index into the lexicographically-sorted file list (files must
    arrive with ascending names, the part-file convention), one
    InputPartition per new file, executor-side parsing, exactly-once
    under checkpointing because the offset log replays file ranges.

    All classes are defined INSIDE this function on purpose: cloudpickle
    then serializes them by value, so executors never need vrod_spark on
    their import path (same worker-closure rule as every UDF here)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    class _Part(InputPartition):
        def __init__(self, index: int, path: str):
            self.index = index
            self.path = path

    def _read_file(partition):
        """Shared per-file parser (batch AND streaming readers): ids are
        ``file_index << 40 | line_number`` — one format contract, one
        implementation, so the two paths can never drift."""
        base = partition.index << 40

        def _f(x: str):
            # Match the expression reader's cast('float') semantics: a
            # malformed component becomes NULL, it does not kill the scan
            # (one corrupt line in a TB-scale text corpus must not fail
            # the job). errors='replace' below mirrors the JVM text
            # reader's U+FFFD substitution for invalid UTF-8.
            try:
                return float(x)
            except ValueError:
                return None

        with open(partition.path, encoding="utf-8", errors="replace") as f:
            for i, line in enumerate(f):
                line = line.strip()
                if not line:
                    continue
                vec_part, _, payload = line.partition(";")
                yield (
                    base | i,
                    [_f(x) for x in vec_part.split(",") if x],
                    payload,
                )

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.options = options

        def partitions(self):
            import glob
            import os

            path = self.options.get("path")
            if path is None:
                raise ValueError("vrod_vectors requires a path")
            if os.path.isdir(path):
                files = sorted(
                    os.path.join(path, p)
                    for p in os.listdir(path)
                    if not p.startswith(("_", "."))
                )
            elif any(ch in path for ch in "*?["):
                files = sorted(glob.glob(path))
            else:
                files = [path]
            return [_Part(i, p) for i, p in enumerate(files)]

        def read(self, partition):
            return _read_file(partition)

    def _list_files(path: str) -> list[str]:
        import os

        if not os.path.isdir(path):
            raise ValueError(f"vrod_vectors stream requires a directory: {path}")
        return sorted(
            os.path.join(path, p)
            for p in os.listdir(path)
            if not p.startswith(("_", "."))
        )

    class _StreamReader(DataSourceStreamReader):
        """Offsets are {'idx': N} = the first N files (sorted) consumed.
        Growth-only and O(1)-sized — the file list itself is re-derived,
        never embedded in the offset log."""

        def __init__(self, options):
            self.path = options.get("path")
            if self.path is None:
                raise ValueError("vrod_vectors requires a path")

        def initialOffset(self) -> dict:
            return {"idx": 0}

        def latestOffset(self) -> dict:
            return {"idx": len(_list_files(self.path))}

        def partitions(self, start: dict, end: dict):
            files = _list_files(self.path)
            return [
                _Part(i, files[i]) for i in range(start["idx"], end["idx"])
            ]

        def read(self, partition):
            return _read_file(partition)

        def commit(self, end: dict) -> None:
            pass  # nothing to clean: files are the durable log

    from pyspark.sql.datasource import DataSourceStreamWriter, WriterCommitMessage

    class _WroteFile(WriterCommitMessage):
        def __init__(self, tmp_path: str, rows: int, partition_id: int):
            self.tmp_path = tmp_path
            self.rows = rows
            self.partition_id = partition_id

    class _StreamWriter(DataSourceStreamWriter):
        """Streaming SINK in the reference's own line format. Executors
        write per-partition temp files; the driver renames them to
        deterministic ``batch-<id>-<n>.txt`` names on commit — a replayed
        micro-batch overwrites the same final names, so delivery stays
        exactly-once without a transaction log."""

        def __init__(self, options):
            self.path = options.get("path")
            if self.path is None:
                raise ValueError("vrod_vectors requires a path")

        def write(self, iterator):
            import os
            import uuid

            from pyspark import TaskContext

            os.makedirs(self.path, exist_ok=True)
            tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.txt")
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            n = 0
            with open(tmp, "w", encoding="utf-8") as f:
                for row in iterator:
                    vec = ",".join(str(float(x)) for x in (row["embedding"] or []))
                    f.write(f"{vec};{row['payload'] or ''}\n")
                    n += 1
            return _WroteFile(tmp, n, pid)

        def commit(self, messages, batchId) -> None:
            import glob
            import os

            # Final indices are assigned by PARTITION ID, not temp-file
            # name: a replayed micro-batch shuffles the same rows into the
            # same partitions, so every replay produces byte-identical
            # batch-<id>-<n>.txt assignments and downstream ids
            # (file_index<<40 | line) are stable across replays.
            #
            # A replayed batch may still land in FEWER non-empty partitions
            # than a crashed attempt wrote — remove every existing file of
            # this batch id first, or the old attempt's tail would survive
            # beside the new files as duplicates. NOTE: readers must not
            # list the sink dir while a batch commit is in flight — between
            # the deletes and the last rename the batch is partially
            # visible (same contract as Spark's own _temporary-dir file
            # sinks without a manifest). A crash inside that window is
            # repaired by the replay, which re-runs this same commit.
            # Crash-window test seam (tests/test_vectors_sink_crash.py):
            # the commit body runs inside Spark's Python sink-runner
            # process, out of reach of in-test monkeypatching, so the
            # kill-test injects through the environment. N = die before
            # the (N+1)-th rename (mid-commit torn window); N == #files =
            # die after the last rename, before the checkpoint learns the
            # batch committed (the replay window). Unset in production.
            # Tolerant parse (ADVICE r15): a non-integer value (operator
            # typo, stray export) must not raise inside the commit body
            # and fail the stream with an opaque error — it means "no
            # kill seam", the production default.
            try:
                kill_after = int(
                    os.environ.get("VROD_VECTORS_SINK_KILL_AFTER_RENAMES", "-1")
                )
            except ValueError:
                kill_after = -1
            for stale in glob.glob(
                os.path.join(self.path, f"batch-{batchId:010d}-*.txt")
            ):
                os.remove(stale)
            kept = [m for m in messages if m is not None and m.rows > 0]
            for i, m in enumerate(sorted(kept, key=lambda m: m.partition_id)):
                if i == kill_after:
                    os._exit(7)
                final = os.path.join(self.path, f"batch-{batchId:010d}-{i:05d}.txt")
                os.replace(m.tmp_path, final)
            if kill_after == len(kept):
                os._exit(7)
            for m in messages:
                if m is not None and m.rows == 0 and os.path.exists(m.tmp_path):
                    os.remove(m.tmp_path)

        def abort(self, messages, batchId) -> None:
            import os

            for m in messages:
                if m is not None and os.path.exists(m.tmp_path):
                    os.remove(m.tmp_path)

    class VrodVectorsDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "vrod_vectors"

        def schema(self) -> str:
            return "id bigint, embedding array<float>, payload string"

        def reader(self, schema):
            return _Reader(self.options)

        def streamReader(self, schema):
            return _StreamReader(self.options)

        def streamWriter(self, schema, overwrite):
            return _StreamWriter(self.options)

    spark.dataSource.register(VrodVectorsDataSource)
