"""tsv-uniq parity: dedup, equivalence classes, occurrence numbering.

Reference: tsv-uniq/src/tsv_utils/tsv-uniq.d — one streaming pass over an
in-memory key -> EquivEntry{equivID, count} hash (:355-356, modes :438-477,
~10M-entry practical limit per README.md:270).

Spark-first: all modes are window/aggregate expressions over a key — one
shuffle, no memory wall. "First occurrence" needs a total order standing in
for input order: pass ``order_col`` (any unique, stable column — file
offset, event id...). Where order doesn't matter, ``uniq`` without
order_col plans a plain hash aggregate (dropDuplicates — cheaper: partial
dedup map-side).

The Bloom-based probabilistic variant for the "have I seen this key"
pattern at 10^12 scale lives in operators.dedup (bloom path) — here
everything is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsv_utils_spark.functions.joins import join_null_safe


def _key_cols(df: DataFrame, keys: list[str] | None, ignore_case: bool):
    # key = whole line when no fields given (tsv-uniq.d:250-254 field 0)
    keys = keys or df.columns
    if ignore_case:
        return [F.lower(F.col(k).cast("string")).alias(f"__k_{k}") for k in keys]
    return [F.col(k).alias(f"__k_{k}") for k in keys]


def uniq(df: DataFrame,
         keys: list[str] | None = None,
         order_col: str | None = None,
         mode: str = "uniq",
         ignore_case: bool = False,
         equiv_start: int = 1,
         at_least: int | None = None,
         at_most: int | None = None) -> DataFrame:
    """tsv-uniq modes over a DataFrame.

    mode:
    - 'uniq'     — first row per key (tsv-uniq.d:441-447). With order_col:
                   exact first-by-order; without: an arbitrary-but-
                   deterministic representative via dropDuplicates.
    - 'equiv'    — append equivalence-class id (--e, :444,:466-469), ids
                   assigned in first-seen order of the key (needs order_col),
                   starting at ``equiv_start`` (--equiv-start).
    - 'number'   — append per-key occurrence number (--z, :451,:471-474;
                   needs order_col).
    - 'repeated' — only rows whose occurrence number is in
                   [at_least, at_most] (--r/--a/--m, :256-261,:454-459;
                   needs order_col for exact reference semantics).

    When ``order_col`` is omitted and the input is a fresh file scan, a
    (file, offset) ``row_id`` is derived automatically (functions.rowid)
    so every mode gets exact reference input-order semantics for free.
    """
    keys = list(keys or df.columns)  # resolve BEFORE any derived column
    auto_order = None
    if order_col is None:
        from tsv_utils_spark.functions.rowid import (
            AUTO_ROW_ID_COL,
            try_input_row_id,
        )

        derived = try_input_row_id(df, AUTO_ROW_ID_COL)
        if derived is not None:
            df, order_col, auto_order = derived, AUTO_ROW_ID_COL, AUTO_ROW_ID_COL
    kc = _key_cols(df, keys, ignore_case)
    knames = [f"__k_{k}" for k in keys]
    work = df.select("*", *kc)
    def drop_auto(out: DataFrame) -> DataFrame:
        # hide the auto-derived order column from the mode's output
        return out.drop(auto_order) if auto_order else out

    if mode == "uniq":
        if order_col is None:
            out = work.dropDuplicates(knames)
        else:
            w = Window.partitionBy(*knames).orderBy(F.col(order_col))
            out = (work.withColumn("__rn", F.row_number().over(w))
                       .filter(F.col("__rn") == 1).drop("__rn"))
        return drop_auto(out.drop(*knames))

    if mode == "equiv":
        if order_col is None:
            raise ValueError("equiv mode needs order_col (first-seen id order)")
        # Rank DISTINCT keys (small relation) rather than windowing the full
        # data: groupBy keeps the big side shuffle-once. The id assignment
        # over distinct keys is a global sequence — done via a single-
        # partition dense_rank below ~10^6 keys, else via the distributed
        # range-partition + offset scheme (no single-partition stage).
        firsts = work.groupBy(*knames).agg(F.min(order_col).alias("__first"))
        ids = _assign_dense_ids(firsts, "__first", "equiv_id", equiv_start)
        # null-safe join: NULL key fields form a real equivalence class
        return drop_auto(
            join_null_safe(work, ids, knames).drop(*knames, "__first"))

    if mode == "number":
        if order_col is None:
            raise ValueError("number mode needs order_col")
        w = Window.partitionBy(*knames).orderBy(F.col(order_col))
        return drop_auto(work.withColumn(
            "equiv_count", F.row_number().over(w)).drop(*knames))

    if mode == "repeated":
        lo = at_least if at_least is not None else 2
        if order_col is not None:
            w = Window.partitionBy(*knames).orderBy(F.col(order_col))
            num = work.withColumn("__rn", F.row_number().over(w))
            cond = F.col("__rn") >= lo
            if at_most is not None:
                cond = cond & (F.col("__rn") <= at_most)
            return drop_auto(num.filter(cond).drop("__rn", *knames))
        # order-free variant: keys occurring >= lo times (set semantics)
        cw = Window.partitionBy(*knames)
        return drop_auto(
            work.withColumn("__cnt", F.count(F.lit(1)).over(cw))
                .filter(F.col("__cnt") >= lo).drop("__cnt", *knames))

    raise ValueError(f"bad mode {mode!r}")


def _assign_dense_ids(firsts, order_col: str, id_col: str, start: int,
                      small_threshold: int = 1_000_000):
    """Assign 1-up ids over ``firsts`` ordered by ``order_col``.

    Small relations: one dense_rank (single-partition, fine to ~10^6).
    Large: repartitionByRange on the order column, count each range
    partition (tiny driver step), then per-partition running index +
    broadcast offset — the zipWithIndex pattern with no global sort
    bottleneck. Requires ``order_col`` values to be distinct per row
    (true here: min(order_col) of disjoint key groups over a unique
    order column).
    """
    n = firsts.count()
    if n <= small_threshold:
        w = Window.orderBy(F.col(order_col))
        return firsts.withColumn(id_col, F.dense_rank().over(w) + (start - 1))

    spark = firsts.sparkSession
    parts = max(32, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    # Materialize the range partitioning ONCE (localCheckpoint): the
    # RangePartitioner samples boundaries with an RDD-id-derived seed, so
    # re-executing repartitionByRange in a second job could place rows in
    # different partitions than the count job observed, misaligning the
    # broadcast offsets. Both jobs below read the same checkpointed blocks.
    ranged = (firsts.repartitionByRange(parts, F.col(order_col))
                    .sortWithinPartitions(order_col)
                    .localCheckpoint(eager=True))
    counts = (ranged.withColumn("__pid", F.spark_partition_id())
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
            pdf = pdf.copy()
            pdf[id_col] = range(nxt, nxt + len(pdf))
            nxt += len(pdf)
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in ranged.schema.fields) + f", {id_col} long"
    return ranged.mapInPandas(gen, schema=schema)
