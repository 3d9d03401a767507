"""Distributed exact prefix sums and GPT-style sequence packing.

``running_total`` is the primitive: an EXACT global running sum over a
deterministic order column, with no single-task window — the same
hex-prefix bucketing as ``sample_to_budget(materialize=False)``
(operators/sample.py), generalized to annotate every row instead of
cutting a prefix. For INTEGER weight columns the arithmetic stays int64
end-to-end (bucket subtotals, driver offsets, per-bucket cumsum), so
the result is bit-identical to a sequential window cumsum regardless of
partitioning; float weights inherit float associativity (documented).

``pack_sequences`` builds on it: the standard pretraining
"concatenate in deterministic order, then cut every ``seq_len``
tokens" bookkeeping. Each document gets the sequence id it STARTS in,
its offset inside that sequence, and how many sequences it spans — all
a downstream writer needs to materialize packed training rows. A
document may straddle a boundary (that is the published method:
sequences are cut mid-document), so ``n_seqs >= 2`` marks the
straddlers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_TYPES = ("tinyint", "smallint", "int", "bigint")


def _hex_buckets(df: DataFrame, order_col: str, buckets: int,
                 context: str) -> DataFrame:
    """Tag rows with a bucket id monotone in the lexicographic order of
    a fixed-width lowercase-hex ``order_col`` (bucket = first 8 hex
    digits scaled into ``buckets``). NULL order values raise in-plan:
    they have no position in the prefix order."""
    width = float(1 << 32) / buckets
    ord_checked = F.when(
        F.col(order_col).isNull(),
        F.raise_error(F.lit(
            f"{context}: NULL {order_col} has no deterministic "
            f"position — filter NULLs out first"))) \
        .otherwise(F.col(order_col))
    bucket = (F.conv(F.substring(ord_checked, 1, 8), 16, 10)
               .cast("long") / F.lit(width)).cast("int")
    return df.withColumn("__bkt", bucket)


def running_total(df: DataFrame, weight_col: str, order_col: str,
                  out_col: str = "cum_excl",
                  buckets: int | None = None) -> DataFrame:
    """Append the EXCLUSIVE running sum of ``weight_col`` in the global
    order of ``order_col`` (a fixed-width hex column, e.g. md5) — the
    distributed, deterministic form of
    ``sum(w) OVER (ORDER BY ord ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING)`` with no single-task window. NULL weights count as 0.

    Integer weights are summed in int64 end-to-end (exact, partition-
    order-independent); other types use float64 and inherit float
    associativity across bucket subtotals.
    """
    spark = df.sparkSession
    parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions",
                                      "32")))
    buckets = buckets or min(1 << 20, max(2048, parts * 64))
    integral = dict(df.dtypes)[weight_col] in _INT_TYPES
    acc_t = "long" if integral else "double"
    tagged = _hex_buckets(df, order_col, buckets, "running_total")
    # NULL-coalesce + widen the weight JVM-side: a NULLABLE int column
    # reaches pandas as float64 (NaN for NULLs), and fillna().astype
    # ('int64') round-trips through float — inexact above 2^53, silently
    # breaking the bit-exact int64 contract. __w64 arrives non-null
    # int64 (or float64) and is dropped before returning.
    tagged = tagged.withColumn(
        "__w64", F.coalesce(F.col(weight_col).cast(acc_t),
                            F.lit(0).cast(acc_t)))
    sums = (tagged.groupBy("__bkt")
                  .agg(F.sum("__w64").alias("__w"))
                  .orderBy("__bkt").collect())
    offsets, acc = {}, 0 if integral else 0.0
    for r in sums:
        offsets[r["__bkt"]] = acc
        acc += r["__w"] or (0 if integral else 0.0)
    boff = spark.sparkContext.broadcast(offsets)
    np_t = "int64" if integral else "float64"

    def per_bucket(pdf):
        off = boff.value.get(int(pdf["__bkt"].iloc[0]),
                             0 if integral else 0.0)
        pdf = pdf.sort_values(order_col, kind="mergesort")
        w = pdf["__w64"].to_numpy()
        assert w.dtype == np_t, f"weight arrived as {w.dtype}"
        pdf = pdf.drop(columns=["__bkt", "__w64"])
        pdf[out_col] = off + w.cumsum() - w
        return pdf

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} {acc_t}"])
    return (tagged.groupBy("__bkt").applyInPandas(per_bucket,
                                                 schema=schema))


def pack_sequences(df: DataFrame, weight_col: str, seq_len: int,
                   order_col: str) -> DataFrame:
    """Assign each document its place in the concatenate-then-chunk
    packing: ``seq_id`` (the sequence its first token lands in),
    ``seq_offset`` (token offset inside that sequence) and ``n_seqs``
    (sequences it spans; >= 2 for boundary straddlers). Requires an
    integer ``weight_col`` (token counts) — packing fractional tokens
    is meaningless and int64 keeps the bookkeeping exact."""
    if dict(df.dtypes)[weight_col] not in _INT_TYPES:
        raise ValueError(
            f"pack_sequences needs an integer token-count column; "
            f"{weight_col!r} is {dict(df.dtypes)[weight_col]}")
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    # SQL DIV, not floor(a / b): Spark's `/` on longs is DOUBLE
    # division, which loses integer precision past 2^53 tokens — DIV
    # keeps the bookkeeping int64 end-to-end as documented
    rt = running_total(df, weight_col, order_col, out_col="__cum") \
        .withColumn("__w", F.coalesce(F.col(weight_col), F.lit(0))
                            .cast("long"))
    seq_id = F.expr(f"__cum DIV {seq_len}")
    last = F.expr(f"(__cum + greatest(__w, 1L) - 1L) DIV {seq_len}")
    return rt.select(
        *df.columns,
        seq_id.alias("seq_id"),
        (F.col("__cum") % seq_len).cast("long").alias("seq_offset"),
        (last - seq_id + 1).cast("long").alias("n_seqs"))


def pack_segments(df: DataFrame, weight_col: str, seq_len: int,
                  order_col: str) -> DataFrame:
    """The writer-side explode of ``pack_sequences``: one row per
    (document, sequence) pair with the token SLICE of the document that
    lands in that sequence — ``slice_start``/``slice_len`` in document
    token coordinates, ``seq_pos`` where the slice begins inside the
    sequence. ``groupBy(seq_id)`` over this output (collecting slices
    ordered by seq_pos) materializes finished training sequences; a
    straddling document appears once per spanned sequence with adjacent
    slices. Zero-token documents are dropped (they occupy no tokens).
    Pure Catalyst: explode(sequence(first, last)) — no Python."""
    if dict(df.dtypes)[weight_col] not in _INT_TYPES:
        raise ValueError(
            f"pack_segments needs an integer token-count column; "
            f"{weight_col!r} is {dict(df.dtypes)[weight_col]}")
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    # SQL DIV for the same 2^53 reason as pack_sequences
    rt = running_total(df, weight_col, order_col, out_col="__cum") \
        .withColumn("__w", F.coalesce(F.col(weight_col), F.lit(0))
                            .cast("long"))
    w = F.col("__w")
    first = F.expr(f"__cum DIV {seq_len}")
    last = F.expr(f"(__cum + __w - 1L) DIV {seq_len}")
    ex = rt.where(w > 0).select(
        *df.columns, "__cum", "__w",
        F.explode(F.sequence(first, last)).alias("seq_id"))
    s = F.col("seq_id")
    seg_lo = F.greatest(F.col("__cum"), s * seq_len)
    seg_hi = F.least(F.col("__cum") + F.col("__w"), (s + 1) * seq_len)
    return ex.select(
        *df.columns, "seq_id",
        (seg_lo - F.col("__cum")).cast("long").alias("slice_start"),
        (seg_hi - seg_lo).cast("long").alias("slice_len"),
        (seg_lo % seq_len).cast("long").alias("seq_pos"))
