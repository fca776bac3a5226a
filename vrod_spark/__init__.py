"""vrod-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of sekulas/vRod (reference read-only at
/root/reference), re-expressed Spark-first.

Collections are Parquet-backed DataFrames; commands (CREATE/DROP/INSERT/
SEARCH/SEARCHSIMILAR/... — reference dispatch at src/command/builder.rs:29-80)
become declarative DataFrame plans optimized by Catalyst; vector similarity
uses built-in array expressions (zip_with/aggregate) with an MLlib-LSH
approximate path; streaming ingest is Structured Streaming.
"""

from vrod_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
