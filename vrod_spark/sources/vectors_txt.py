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
    vec_part = F.split(F.col("value"), ";").getItem(0)
    payload = F.split(F.col("value"), ";").getItem(1)
    embedding = F.transform(F.split(vec_part, ","), lambda x: x.cast("float"))
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
