"""tsv-split parity: random assignment, key-hash assignment, size-capped
files.

Reference: tsv-split/src/tsv_utils/tsv-split.d. The key-assignment mode
(MurmurHash3_32(seed, key) % N, :975-1042) is the reference's manual
re-implementation of a shuffle — its own docs say it exists to "enable
parallel computation based on the key" (:136-144). In Spark that IS
``repartition(n, hash(keys))``; we also expose the assignment as a column
(deterministic, PySpark F.hash = Murmur3-32) for writing partitioned
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_by_key(df: DataFrame, n: int, keys: list[str], seed: int = 0,
                 assignment_col: str | None = "bucket") -> DataFrame:
    """--n N --k FIELDS: deterministic key-hash bucket (tsv-split.d:1008,
    :1038). Same key always lands in the same bucket — across runs and
    cluster sizes."""
    h = F.hash(F.lit(seed), *[F.col(k) for k in keys])
    bucket = F.pmod(h, F.lit(n))
    out = df.withColumn(assignment_col or "bucket", bucket)
    return out


def split_random(df: DataFrame, n: int, seed: int | None = None,
                 assignment_col: str = "bucket") -> DataFrame:
    """--n N without keys: uniform random assignment (tsv-split.d:947-967)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return df.withColumn(assignment_col, F.floor(r * n).cast("int"))


def write_split(df: DataFrame, path: str, n: int | None = None,
                keys: list[str] | None = None,
                lines_per_file: int | None = None, seed: int = 0) -> None:
    """Materialize the split. --l lines-per-file maps to Spark's
    maxRecordsPerFile writer option (tsv-split.d:1049 splitByLineCount);
    bucketed modes partition the output directory by the assignment."""
    if lines_per_file:
        df.write.option("maxRecordsPerFile", lines_per_file).parquet(path)
        return
    assert n is not None
    out = split_by_key(df, n, keys, seed) if keys else split_random(df, n, seed)
    out.write.partitionBy("bucket").parquet(path)
