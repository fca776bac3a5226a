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


def write_export_manifest(
    path: str,
    *,
    fmt: str,
    rows: int,
    collection: str,
    version: int | None = None,
    since_version: int | None = None,
    columns: list[str] | None = None,
    where: str | None = None,
) -> str:
    """Write ``_manifest.json`` next to the shards: the inventory a
    training loader consumes (shard names + sizes, per-shard row counts
    for parquet, provenance back to the collection snapshot).

    The leading underscore keeps it invisible to every reader that
    matters: Spark/Hadoop data-source listings skip ``_``/``.`` files,
    and BULKINSERT's ``*.json.gz`` glob never matches it — so re-ingest
    roundtrips are unaffected.

    Driver-side O(files): one directory listing (the same listing the
    write's commit protocol just produced) plus, for parquet, a footer
    read per shard — no data scan, no Spark job. ``rows`` is the count
    observed on THIS export's write job; with ``mode="append"`` the file
    list covers the whole directory while ``rows`` stays per-export."""
    import json
    import os
    import time

    files = []
    for fname in sorted(os.listdir(path)):
        full = os.path.join(path, fname)
        if fname.startswith(("_", ".")) or not os.path.isfile(full):
            continue
        entry: dict = {"name": fname, "bytes": os.path.getsize(full)}
        if fmt == "parquet" and fname.endswith(".parquet"):
            import pyarrow.parquet as pq

            entry["rows"] = pq.ParquetFile(full).metadata.num_rows
        files.append(entry)
    manifest = {
        "format": fmt,
        "rows": int(rows),
        "collection": collection,
        "version": version,
        "since_version": since_version,
        "columns": columns,
        "where": where,
        "n_files": len(files),
        "files": files,
        "created_at": time.time(),
    }
    out = os.path.join(path, "_manifest.json")
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, out)
    return out
