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


def hash_split(df: DataFrame, key_cols, fractions: dict,
               split_col: str = "split") -> DataFrame:
    """Deterministic fractional split (train/val/test) by content hash
    — every engine and every run assigns the same row to the same
    split, and adding rows never reassigns existing ones (the property
    random splits lack). ``fractions`` maps name -> fraction; must sum
    to 1 (+-1e-9). Assignment: u = first 52 md5 bits of the key / 2^52
    (a power-of-two division of an exactly-representable integer —
    bit-identical across engines, the repo's standard uniform trick),
    then the half-open cumulative interval [c_i, c_{i+1}) picks the
    split, names in insertion order.

    Returns the input plus ``split_col``. Pure projection — no
    shuffle; at any scale the split is a free column on the scan.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bad = {n: f for n, f in fractions.items() if not f > 0}
    if bad:
        raise ValueError(f"fractions must be > 0, got {bad}")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string")
                                for c in key_cols])
    u = (F.conv(F.substring(F.md5(key), 1, 13), 16, 10)
         .cast("double") / F.lit(4503599627370496.0))
    names = list(fractions)
    cum = 0.0
    expr = F.lit(names[-1])  # the last split takes the tail incl. u=1
    bounds = []
    for name in names[:-1]:
        cum += fractions[name]
        bounds.append((name, cum))
    for name, b in reversed(bounds):
        expr = F.when(u < F.lit(b), F.lit(name)).otherwise(expr)
    # NULL keys raise in-plan (family convention) — the guard wraps the
    # WHOLE assignment (not the key expression: a single-fraction split
    # never evaluates the key, and concat_ws would otherwise silently
    # hash NULLs as "" and collide distinct multi-column keys)
    null_any = F.lit(False)
    for c in key_cols:
        null_any = null_any | F.col(c).isNull()
    guarded = F.when(null_any, F.raise_error(F.lit(
        f"hash_split: NULL in key {key_cols} — assign surrogate keys "
        f"first"))).otherwise(expr)
    return df.withColumn(split_col, guarded)
