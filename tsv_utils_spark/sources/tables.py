"""Catalog-or-path table access — the Iceberg on-ramp.

The north rule targets Iceberg tables of source-code files. In
production the entire engine reaches Iceberg through ONE call:
``spark.read.table("catalog.db.files")`` (plus the iceberg-spark-runtime
jar + catalog conf on the session) — every operator here consumes plain
DataFrames, so nothing else changes. The sandbox has no Iceberg jar, so
tests exercise the same call path through Spark's built-in catalog
(temp views / managed tables) and parquet paths.

``read_table`` unifies the three source shapes a pipeline meets:
- a catalog table name (``db.table`` / ``cat.db.table``) -> read.table
  (Iceberg/DSv2: hidden-partition pruning and snapshot reads apply);
- a directory/file path -> read.parquet;
- ``snapshot``/``as_of`` options pass through as DSv2 read options
  (Iceberg time travel: ``snapshot-id`` / ``as-of-timestamp``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, source: str,
               snapshot_id: int | None = None,
               as_of_timestamp: int | None = None) -> DataFrame:
    """Read a catalog table (Iceberg in production) or a parquet path."""
    looks_like_path = ("/" in source or source.endswith(".parquet")
                       or os.path.exists(source))
    if looks_like_path:
        if snapshot_id is not None or as_of_timestamp is not None:
            raise ValueError("time travel needs a catalog table source")
        return spark.read.parquet(source)
    r = spark.read
    if snapshot_id is not None:
        r = r.option("snapshot-id", str(snapshot_id))
    if as_of_timestamp is not None:
        r = r.option("as-of-timestamp", str(as_of_timestamp))
    return r.table(source)
