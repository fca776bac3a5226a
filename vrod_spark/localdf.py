"""Arrow-path construction of small local DataFrames.

``spark.createDataFrame(list, schema)`` pickles the rows into a
defaultParallelism-slice python RDD; every EXECUTION of the resulting
plan re-forks a python worker per slice just to deserialize the
literals (measured on this box: ~1.3 s to collect ONE local binary row,
~3.9 s through an identity mapInPandas). Routing through a pandas
intermediate uses the Arrow conversion instead — record batches the JVM
reads natively (0.03 s / 0.39 s on the same probes).

Every small literal/dimension table the engine builds at plan time
(kNN query vectors, classifier weights, tier tables, synthesized gate
corpora) should come through here; on a real cluster these are exactly
the broadcast-dimension inputs, and Arrow is also how they would ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Local rows → DataFrame via pandas/Arrow. ``schema`` is a DDL
    string; field names come from Spark's own DDL parser, so
    comma-bearing types (``map<string,string>``, ``decimal(10,2)``,
    nested structs) parse correctly. bytearray/memoryview values are
    normalized to bytes for Arrow, and every column is built as a
    dtype=object Series so a None in a numeric column stays a NULL
    (pandas would otherwise coerce int+None to float64/NaN and change
    the Arrow conversion's behavior vs the list path)."""
    import pandas as pd
    from pyspark.sql.types import StructType

    struct = StructType.fromDDL(schema)
    names = struct.fieldNames()
    data = {
        n: pd.Series(
            [bytes(r[i]) if isinstance(r[i], (bytearray, memoryview)) else r[i]
             for r in rows],
            dtype=object,
        )
        for i, n in enumerate(names)
    }
    return spark.createDataFrame(pd.DataFrame(data, columns=names), schema)
