"""Training-data export sink: gzipped JSONL shards.

The counterpart of the engine's JSONL.gz BULKINSERT reader
(engine.py `_bulkinsert` extension dispatch): a curated corpus leaves
the engine as compressed line-delimited JSON shards — the interchange
format every training stack ingests. Reference provenance: the
reference persists collections but has no export surface
(`src/database/mod.rs` storage is `todo!`); this is part of the
BASELINE.json LLM-pipeline extension surface.

Scale shape: a plain distributed ``DataFrameWriter.json`` — one writer
task per partition, no driver involvement, no shuffle unless the caller
asks for re-sharding. ``max_records_per_file`` bounds shard size (the
writer rolls files), so downstream loaders get uniform work units;
``shards`` triggers ONE round-robin repartition when a specific shard
count matters more than avoiding the exchange. Binary columns are
rejected loudly: Spark would base64 them silently, and a training
pipeline that wants blobs should export parquet instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    *,
    max_records_per_file: int = 100_000,
    shards: int | None = None,
    compression: str = "gzip",
    mode: str = "error",
) -> None:
    """Write ``df`` as line-delimited JSON shards under ``path``.

    ``max_records_per_file`` caps records per output file (Spark rolls
    additional files per task past the cap). ``shards`` optionally
    repartitions to a fixed file count first — useful when a loader
    wants N roughly-equal shards; leave None to keep the input
    partitioning (no exchange). ``compression``: "gzip" (default),
    "none", or any codec Spark's JSON writer knows.
    """
    from pyspark.sql.types import BinaryType

    binary_cols = [f.name for f in df.schema.fields
                   if isinstance(f.dataType, BinaryType)]
    if binary_cols:
        raise ValueError(
            f"JSONL export would silently base64-encode binary columns "
            f"{binary_cols}; export parquet for blob columns"
        )
    out = df.repartition(shards) if shards else df
    writer = (
        out.write.mode(mode)
        .option("maxRecordsPerFile", int(max_records_per_file))
    )
    if compression and compression != "none":
        writer = writer.option("compression", compression)
    writer.json(path)
