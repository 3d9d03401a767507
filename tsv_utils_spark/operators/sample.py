"""tsv-sample parity: Bernoulli, distinct-key, reservoir (weighted and
unweighted), shuffle, with-replacement — all as single Catalyst plans.

Reference: tsv-sample/src/tsv_utils/tsv-sample.d (mode dispatch :535-567).

Distributed translations (SURVEY.md §2.5):
- Bernoulli (--p): ``df.sample`` — Spark's BernoulliSampler gap-samples
  internally, the same optimization the reference applies below p<=0.04
  (:585,:705-815). ``compat`` mode materializes the per-row uniform like
  --compatibility-mode (:182-194) so bigger samples are supersets.
- Distinct (--k --p): deterministic key-hash bucketing
  ``pmod(hash(key), round(1/p)) == 0`` — the reference uses
  MurmurHash3_32 % buckets (:864,:915-944); PySpark's F.hash IS
  Murmur3-32, so semantics (deterministic, same keys always sampled
  together) carry over exactly.
- Reservoir --n N: top-N by a per-row random score — Catalyst plans
  TakeOrderedAndProject: per-partition heaps + driver merge, the exact
  distributed generalization of the reference's Efraimidis-Spirakis heap
  (:1088-1228).
- Weighted reservoir (--n --w): score = u^(1/w) (:1169-1174) — same
  top-N plan; matches the A-Res weighted-reservoir scheme.
- Shuffle: global sort by the random score (:1530-1562 Fisher-Yates is
  the single-node special case).
- With replacement (--r): ``df.sample(True, ...)``.

Determinism: every mode takes ``seed``; same seed + same partitioning =>
same sample (Spark ties rand() streams to partition ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample(df: DataFrame,
           mode: str = "bernoulli",
           p: float | None = None,
           n: int | None = None,
           keys: list[str] | None = None,
           weight: str | None = None,
           seed: int = 2438424139,  # the reference's --static-seed value (:449)
           compat: bool = False,
           print_random: bool = False,
           inorder_col: str | None = None,
           u_expr=None) -> DataFrame:
    """One entry point mirroring tsvSample's mode dispatch (:535-567).

    ``u_expr`` (a Column of uniform(0,1) values) overrides ``F.rand(seed)``
    as the per-row randomness source for the reservoir/shuffle modes —
    deterministic twins derive it from md5 so a DuckDB oracle can replay
    the exact sample (same precedent as ``draw_expr`` in
    ``sample_with_replacement``)."""
    if mode == "bernoulli":
        if p is None:
            raise ValueError("bernoulli needs p")
        if compat or print_random:
            scored = df.withColumn("random_value", F.rand(seed))
            out = scored.filter(F.col("random_value") < p)
            if not print_random:
                out = out.drop("random_value")
        else:
            out = df.sample(False, p, seed)
        return _maybe_inorder(out, inorder_col)

    if mode == "distinct":
        if p is None or not keys:
            raise ValueError("distinct needs p and keys")
        buckets = max(1, round(1.0 / p))
        key_hash = F.hash(F.lit(seed), *[F.col(k) for k in keys])
        out = df.filter(F.pmod(key_hash, F.lit(buckets)) == 0)
        return _maybe_inorder(out, inorder_col)

    if mode == "reservoir":
        if n is None:
            raise ValueError("reservoir needs n")
        u = u_expr if u_expr is not None else F.rand(seed)
        if weight:
            # A-Res: score = u^(1/w); w <= 0 -> score 0 (:1169-1174)
            w = F.col(weight).try_cast("double")
            score = F.when(w > 0, F.pow(u, 1.0 / w)).otherwise(F.lit(0.0))
        else:
            score = u
        scored = df.withColumn("random_value", score)
        out = scored.orderBy(F.col("random_value").desc()).limit(n)
        if not print_random:
            out = out.drop("random_value")
        return _maybe_inorder(out, inorder_col)

    if mode == "shuffle":
        u = u_expr if u_expr is not None else F.rand(seed)
        if weight:
            w = F.col(weight).try_cast("double")
            score = F.when(w > 0, F.pow(u, 1.0 / w)).otherwise(F.lit(0.0))
        else:
            score = u
        out = df.withColumn("random_value", score).orderBy(F.col("random_value").desc())
        if not print_random:
            out = out.drop("random_value")
        return out

    if mode == "replacement":
        # exact-N draws (tsv-sample.d:1571-1598) when n is given; the
        # fraction form (expected-size, Poisson per row) when only p is
        if n is not None:
            return sample_with_replacement(df, n, order_col=inorder_col,
                                           seed=seed)
        if p is None:
            raise ValueError("replacement needs n (exact draws) or p "
                             "(expected fraction)")
        return df.sample(True, p, seed)

    raise ValueError(f"bad mode {mode!r}")


def sample_with_replacement(df: DataFrame, n: int,
                            order_col: str | None = None,
                            seed: int = 2438424139,
                            draw_expr=None) -> DataFrame:
    """EXACTLY n rows drawn uniformly with replacement — the reference's
    --r|replacement semantics (tsv-sample.d:1571-1598 buffers all lines
    and draws n indices; here the multinomial is distributed).

    Plan: number rows 0..L-1 (per-partition offsets, no global sort —
    ordered by ``order_col`` when given, else current partition order),
    materialize the n draw indices as a tiny relation ``spark.range(n)``,
    reduce it to (index, multiplicity) — the multinomial counts — then one
    broadcast join + sequence-explode replicates each chosen row its
    multiplicity. Shuffle cost is O(distinct draws), not O(n·row_width),
    and the big side moves ZERO rows that were never drawn.

    ``draw_expr(i_col, L)`` overrides the draw index for draw number i
    (default ``floor(rand(seed)*L)``) — deterministic twins use this.
    """
    from tsv_utils_spark.operators.misc import (
        number_lines,
        number_lines_distributed,
    )

    spark = df.sparkSession
    if order_col is not None:
        numbered = number_lines(df, order_col, start=0, out_col="__idx")
    else:
        numbered = number_lines_distributed(df, start=0, out_col="__idx")
    total = numbered.count()
    if total == 0:
        return df
    if draw_expr is not None:
        draw = draw_expr(F.col("id"), total)
    else:
        draw = F.floor(F.rand(seed) * total).cast("long")
    counts = (spark.range(n).select(draw.alias("__idx"))
              .groupBy("__idx").agg(F.count(F.lit(1)).alias("__m")))
    # counts has <= min(n, L) rows of two longs — broadcast while that
    # comfortably fits an executor; fall back to a shuffle join for huge n
    if n <= 4_000_000:
        counts = F.broadcast(counts)
    out = (numbered.join(counts, "__idx")
           .withColumn("__rep", F.explode(F.sequence(F.lit(1), F.col("__m"))))
           .drop("__idx", "__m", "__rep"))
    return out


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 2438424139,
                      u_expr=None) -> DataFrame:
    """Per-stratum Bernoulli sampling (language-balanced corpus
    selection): keep a row iff its uniform draw < fractions[stratum].
    Strata absent from ``fractions`` are dropped (fraction 0). With
    ``u_expr`` (md5-derived uniform) the sample is exactly replayable
    cross-engine; default is Spark's seeded rand. Pure filter — no
    shuffle, pushes the fraction lookup into codegen via a literal map.
    """
    u = u_expr if u_expr is not None else F.rand(seed)
    kv = []
    for k, v in fractions.items():
        kv += [F.lit(k), F.lit(float(v))]
    frac = F.element_at(F.create_map(*kv), F.col(strata_col))
    return df.where(u < F.coalesce(frac, F.lit(0.0)))


def mixture_sample(df: DataFrame, strata_col: str,
                   targets: dict | str = "equalize",
                   seed: int = 2438424139, u_expr=None) -> DataFrame:
    """Training-data MIXING: down-sample each stratum (source corpus,
    language, domain) toward a target composition. ``targets`` is
    either a dict of desired APPROXIMATE row counts per stratum, or
    ``"equalize"`` (every stratum down-sampled to the size of the
    smallest — the standard balanced-mixture recipe). Rates are
    target/count capped at 1 (a stratum is never up-sampled; use
    ``sample_with_replacement`` for that), computed from ONE tiny
    count aggregate, then applied as a per-stratum Bernoulli filter —
    the stratified_sample machinery, so with an md5 ``u_expr`` the
    mixture is exactly replayable cross-engine.

    Like ``stratified_sample``, strata ABSENT from a dict ``targets``
    are DROPPED ENTIRELY (target 0) — passing {'web': 1e7} keeps only
    web rows; list every stratum you want retained. NULL strata are
    always dropped and never influence the equalize floor.
    """
    if targets != "equalize" and not isinstance(targets, dict):
        raise ValueError("targets must be a dict or 'equalize'")
    counts = {r["k"]: r["n"] for r in
              df.groupBy(F.col(strata_col).alias("k"))
                .agg(F.count(F.lit(1)).alias("n")).collect()
              if r["k"] is not None}
    if not counts:
        return df.limit(0)
    if targets == "equalize":
        # floor over REAL strata only: a tiny NULL group must not
        # collapse every language to its size
        floor_n = min(counts.values())
        targets = {k: floor_n for k in counts}
    fractions = {k: min(1.0, targets.get(k, 0) / n)
                 for k, n in counts.items()}
    return stratified_sample(df, strata_col, fractions,
                             seed=seed, u_expr=u_expr)


def sample_to_budget(df: DataFrame, weight_col: str, budget: float,
                     order_col: str, materialize: bool = True) -> DataFrame:
    """Greedy prefix under a weight budget: order rows by ``order_col``
    (pass an md5 expression column name for a deterministic shuffle
    order) and keep every row whose cumulative weight BEFORE it is
    < budget — the boundary-crossing row is included. The standard
    token-budget corpus selection ("take ~1B tokens").

    NULL weights count as 0 (matching ``F.sum``'s null-skipping
    semantics) in both passes.

    Two physical strategies, both a distributed cumulative sum with no
    single-task window:

    ``materialize=True`` (default, any orderable ``order_col``):
    range-partition on the order column, localCheckpoint to pin the
    RangePartitioner's sampled boundaries (the per-partition-sums job
    and the final job are separate plan instantiations, so without the
    pin each would re-sample boundaries and the driver offsets could
    disagree with final placement), per-partition totals -> driver
    offsets (one tiny collect) -> per-partition running sums.

    ``materialize=False`` (for DETERMINISTIC uniformly-distributed
    fixed-width lowercase-hex order columns — md5/sha2, the
    deterministic-shuffle-order use case): no checkpoint, no sampling.
    Rows are bucketed by the numeric value of the first 8 hex digits
    (a monotone prefix of the lexicographic order), per-bucket totals
    -> driver offsets in bucket order, then one ``applyInPandas`` per
    bucket sorts by ``order_col`` and applies its offset. Placement is
    a pure function of the data, so the two jobs can never disagree —
    and at 100 TB nothing is materialized to executor-local storage.
    """
    spark = df.sparkSession
    parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    bcols = list(df.columns)
    if not materialize:
        # bucket count >> shuffle partitions: each live bucket becomes
        # ONE applyInPandas group, so buckets bound the per-task memory
        # (and dead buckets are pruned before the shuffle entirely)
        buckets = min(1 << 20, max(2048, parts * 64))
        return _budget_by_hex_buckets(df, weight_col, budget, order_col,
                                      buckets, bcols)
    ranged = (df.repartitionByRange(parts, F.col(order_col))
                .sortWithinPartitions(order_col)
                .localCheckpoint(eager=True))
    sums = (ranged.withColumn("__pid", F.spark_partition_id())
                  .groupBy("__pid")
                  .agg(F.sum(F.col(weight_col).cast("double")).alias("__w"))
                  .orderBy("__pid").collect())
    offsets, acc = {}, 0.0
    for r in sums:
        offsets[r["__pid"]] = acc
        acc += r["__w"] or 0.0
    boff = spark.sparkContext.broadcast(offsets)

    def gen(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        run = boff.value.get(pid, 0.0)
        for pdf in batches:
            if run >= budget:
                return
            w = pdf[weight_col].astype("float64").fillna(0.0).to_numpy()
            cum_excl = run + w.cumsum() - w
            run += float(w.sum())
            yield pdf[cum_excl < budget]

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in ranged.schema.fields)
    return ranged.mapInPandas(gen, schema=schema).select(*bcols)


def _budget_by_hex_buckets(df: DataFrame, weight_col: str, budget: float,
                           order_col: str, buckets: int,
                           bcols: list) -> DataFrame:
    """Deterministic no-materialize budget prefix (see sample_to_budget).

    Bucket id = floor(int(order_col[:8], 16) * buckets / 2^32): monotone
    in the lexicographic order of a fixed-width lowercase-hex column, so
    global order == (bucket, order_col within bucket)."""
    # shared hex-prefix bucketing (operators/pack.py — also the base of
    # running_total/pack_sequences); NULL order values raise in-plan
    # because the materialize path sorts them like any other value and
    # the two strategies would otherwise diverge
    from tsv_utils_spark.operators.pack import _hex_buckets

    tagged = _hex_buckets(df, order_col, buckets,
                          "sample_to_budget(materialize=False)")
    sums = (tagged.groupBy("__bkt")
                  .agg(F.sum(F.col(weight_col).cast("double")).alias("__w"))
                  .orderBy("__bkt").collect())
    offsets, acc = {}, 0.0
    for r in sums:
        offsets[r["__bkt"]] = acc
        acc += r["__w"] or 0.0
    boff = df.sparkSession.sparkContext.broadcast(offsets)
    live = {b for b, off in offsets.items() if off < budget}

    def per_bucket(pdf):
        off = boff.value.get(int(pdf["__bkt"].iloc[0]), 0.0)
        pdf = pdf.sort_values(order_col, kind="mergesort")
        w = pdf[weight_col].astype("float64").fillna(0.0).to_numpy()
        cum_excl = off + w.cumsum() - w
        return pdf[cum_excl < budget].drop(columns=["__bkt"])

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    # buckets whose offset already exceeds the budget are filtered out
    # BEFORE the shuffle — at 100 TB with a small budget this prunes
    # nearly all of the input from the applyInPandas exchange
    return (tagged.where(F.col("__bkt").isin(list(live)) if live
                         else F.lit(False))
                  .groupBy("__bkt").applyInPandas(per_bucket, schema=schema)
                  .select(*bcols))


def gen_random_inorder(df: DataFrame, weight: str | None = None,
                       seed: int = 2438424139, u_expr=None) -> DataFrame:
    """--gen-random-inorder (:2161): append the per-row score, keep all rows."""
    u = u_expr if u_expr is not None else F.rand(seed)
    if weight:
        w = F.col(weight).try_cast("double")
        score = F.when(w > 0, F.pow(u, 1.0 / w)).otherwise(F.lit(0.0))
    else:
        score = u
    return df.withColumn("random_value", score)


def _maybe_inorder(df: DataFrame, inorder_col: str | None) -> DataFrame:
    # --i|inorder (:1203-1206): restore input order after sampling
    return df.orderBy(inorder_col) if inorder_col else df
