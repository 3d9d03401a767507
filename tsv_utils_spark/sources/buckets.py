"""Bucketed tables: pre-partitioned storage for shuffle-free joins.

At 100 TB the dominant cost of a repeated big-big equi-join is the
shuffle. Spark's bucketing amortizes it: write each side ONCE bucketed
by the join key (``bucketBy(n, keys).sortBy(keys)``), and every later
join between tables with the same bucket count and keys plans as a
SortMergeJoin with ZERO Exchange on either side — each task zips bucket
i with bucket i. The same mechanism drives bucket-local aggregation
(groupBy on the bucket key needs no shuffle either).

This is the static complement to the engine's runtime skew tools
(salted_join, AQE): bucket once at ingest, join forever for free. In
production the same intent is expressed as an Iceberg bucket partition
transform (``bucket(n, key)``); Spark's managed-table bucketing is the
sandbox-runnable equivalent on the built-in catalog.

Requirements Spark imposes (asserted here so misuse fails loudly, not
silently as a plan regression):
- bucketed writes go through ``saveAsTable`` (a catalog entry records
  the bucket spec; a bare parquet path cannot);
- both join sides need the same bucket count (or an integer multiple);
- ``spark.sql.sources.bucketing.enabled`` (default true) at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   n_buckets: int, sort: bool = True,
                   mode: str = "overwrite", path: str | None = None) -> None:
    """Persist ``df`` as a parquet table bucketed by ``keys``.

    ``sort=True`` also sorts within buckets by the keys — that is what
    lets the later SortMergeJoin skip its per-task Sort too. ``path``
    makes it an external table at that location (managed under the
    session warehouse otherwise).
    """
    if not keys:
        raise ValueError("write_bucketed needs at least one bucket key")
    w = (df.write.format("parquet").mode(mode)
           .bucketBy(n_buckets, keys[0], *keys[1:]))
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)


def write_partitioned(df: DataFrame, path: str, keys: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-style directory partitioning (``partitionBy``): the scan
    prunes whole directories for predicates on ``keys`` (shows up as
    ``PartitionFilters`` in the plan — zero IO for non-matching
    partitions). Use for LOW-cardinality filter columns (lang, date,
    source); use bucketing for HIGH-cardinality join keys. The Iceberg
    equivalents are identity/day/hour partition transforms.
    """
    if not keys:
        raise ValueError("write_partitioned needs at least one key")
    df.write.mode(mode).partitionBy(*keys).parquet(path)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  keys: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables. With matching bucket specs the plan
    has no Exchange on either side (pinned by tests/test_plans.py)."""
    left = spark.read.table(left_table)
    right = spark.read.table(right_table)
    return left.join(right, keys, how)
