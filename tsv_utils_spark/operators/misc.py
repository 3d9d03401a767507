"""Small-tool parity: number-lines, keep-header, tsv-pretty.

- ``number_lines`` — number-lines.d:37-46: prepend a line number starting
  at ``start``. Needs a total order (order_col); at scale prefer a
  per-partition-offset scheme (zipWithIndex-style) over a global window —
  both provided.
- keep-header (keep-header.d:11-33) needs no operator: schema survives
  every DataFrame op by construction.
- ``pretty`` — tsv-pretty's aligned console render (tsv-pretty.d:50-120);
  here a driver-side convenience over a LIMITED sample (never the full
  distributed result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def number_lines(df: DataFrame, order_col: str, start: int = 1,
                 out_col: str = "line") -> DataFrame:
    """Global line numbers by order_col — DISTRIBUTED by default: range-
    partition on order_col, sort within partitions, then per-partition
    offsets. Identical numbering to a global row_number window, with no
    single-task bottleneck. Use ``number_lines_window`` only when you
    specifically want the window plan (small ordered exports)."""
    spark = df.sparkSession
    parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    ranged = (df.repartitionByRange(parts, F.col(order_col))
                .sortWithinPartitions(order_col))
    return number_lines_distributed(ranged, start, out_col)


def number_lines_window(df: DataFrame, order_col: str, start: int = 1,
                        out_col: str = "line") -> DataFrame:
    """Window-based numbering: exact, but the global sort serializes
    through one task for the final numbering — the opt-in variant."""
    w = Window.orderBy(F.col(order_col))
    return df.withColumn(out_col,
                         F.row_number().over(w) + (start - 1)) \
        .select(out_col, *df.columns)


def number_lines_distributed(df: DataFrame, start: int = 1,
                             out_col: str = "line") -> DataFrame:
    """Scale path: per-partition counts -> offsets (tiny driver step) ->
    per-partition running index. No global sort; numbering follows the
    current partition order. The input partitioning is materialized once
    (localCheckpoint) so the count job and the numbering job cannot
    observe different partition placements (nondeterministic shuffles)."""
    df = df.localCheckpoint(eager=True)
    spark = df.sparkSession
    counts = (df.withColumn("__pid", F.spark_partition_id())
                .groupBy("__pid").count().orderBy("__pid").collect())
    offsets = {}
    acc = start
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["count"]
    boff = spark.sparkContext.broadcast(offsets)

    def gen(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nxt = boff.value.get(pid, start)
        for pdf in batches:
            n = len(pdf)
            pdf = pdf.copy()
            pdf.insert(0, out_col, range(nxt, nxt + n))
            nxt += n
            yield pdf

    schema = f"{out_col} long, " + ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(gen, schema=schema)


def pretty(df: DataFrame, n: int = 20, max_width: int = 40) -> str:
    """Aligned text render of the first n rows (driver-side sample)."""
    pdf = df.limit(n).toPandas()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str).str.slice(0, max_width)
    return pdf.to_string(index=False)
