"""Similarity search over embedding columns (array<float>).

Two paths, same answer shape (query_id, neighbor_id, score, rank):

- ``cosine_topk``      — brute-force exact top-k: broadcast the (small)
                         query set, JVM-side dot products via
                         F.aggregate/zip_with (whole-stage codegen, no
                         Python), per-query top-k via window. The baseline
                         and the oracle.
- ``lsh_cosine_topk``  — the scale path: random-hyperplane LSH (SimHash for
                         vectors). Each vector gets ``tables`` bucket keys
                         from ``planes``-bit sign patterns; candidates =
                         bucket collisions in any table; exact cosine only
                         on candidates. Probe cost O(n * tables) instead of
                         O(n * q) for large query sets; recall tunable via
                         (planes, tables).

Also ``ivf_topk`` — inverted-file variant: k-means-lite centroids (sampled,
driver-side, tiny), assign each vector to its nearest centroid, probe only
the ``nprobe`` nearest centroid cells per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y:
                                  x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x:
                                          x.cast("double") * x.cast("double")),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_self: bool = True) -> DataFrame:
    """Exact brute-force cosine top-k. Queries are broadcast (small side);
    the corpus scan streams once through codegen'd dot products."""
    from tsv_utils_spark.functions.parallel import ensure_min_parallelism

    # norms are per-vector: compute them ONCE per row in the projections
    # below the join instead of per (query, corpus) pair — q x fewer norm
    # folds, identical doubles (same expression, same data). The corpus
    # scan is also re-parallelized when starved (single-row-group
    # parquet): the dot-product projection is the whole cost here.
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv")) \
        .withColumn("__qn", _norm(F.col("__qv")))
    c = ensure_min_parallelism(corpus) \
        .select(F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("__cv")) \
        .withColumn("__cn", _norm(F.col("__cv")))
    j = c.crossJoin(F.broadcast(q))
    if exclude_self:
        j = j.where(F.col("neighbor_id") != F.col("query_id"))
    cos = (_dot(F.col("__qv"), F.col("__cv")) /
           (F.col("__qn") * F.col("__cn"))).alias("score")
    scored = j.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))


def _hyperplanes(dim: int, planes: int, tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, planes, dim)).astype(np.float32)


def _bucket_df(df: DataFrame, id_col: str, vec_col: str, hp: np.ndarray,
               role: str) -> DataFrame:
    tables, planes, dim = hp.shape
    bc = df.sparkSession.sparkContext.broadcast(hp)

    def gen(batches):
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            n = vecs.shape[0]
            h = bc.value  # (tables, planes, dim)
            out_ids, out_tab, out_key = [], [], []
            for t in range(tables):
                signs = (vecs @ h[t].T) > 0  # (n, planes)
                keys = np.zeros(n, dtype=np.int64)
                for p in range(signs.shape[1]):
                    keys |= signs[:, p].astype(np.int64) << p
                out_ids.append(pdf[id_col].to_numpy())
                out_tab.append(np.full(n, t, dtype=np.int32))
                out_key.append(keys)
            yield pd.DataFrame({
                id_col: np.concatenate(out_ids),
                "table": np.concatenate(out_tab),
                "bucket": np.concatenate(out_key),
            })

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, table int, bucket long") \
        .withColumnRenamed(id_col, f"{role}_id")


def lsh_cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    planes: int = 12, tables: int = 8, seed: int = 42,
                    exclude_self: bool = True,
                    max_bucket_size: int | None = 10_000) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH bucketing.

    Candidate generation is equi-joins on (table, bucket); exact cosine is
    computed only on candidates. P(bucket match in one table) =
    (1 - theta/pi)^planes for angle theta — tables trade recall for cost.
    ``max_bucket_size`` (default 10k, matching ``embedding_dedup``) drops
    degenerate corpus buckets before the join: a bucket holding a large
    fraction of the corpus (e.g. near-zero vectors hashing alike) would
    make the candidate join quadratic by default. The trade: queries whose
    true neighbors sit only in a dropped bucket lose recall for them —
    pass ``max_bucket_size=None`` to opt out and keep every candidate.
    """
    dim = len(corpus.select(vec_col).first()[0])
    hp = _hyperplanes(dim, planes, tables, seed)
    cb = _bucket_df(corpus, id_col, vec_col, hp, "neighbor")
    if max_bucket_size is not None:
        ok = (cb.groupBy("table", "bucket")
                .agg(F.count(F.lit(1)).alias("__bn"))
                .where(F.col("__bn") <= max_bucket_size)
                .select("table", "bucket"))
        cb = cb.join(ok, ["table", "bucket"], "left_semi")
    qb = _bucket_df(queries, id_col, vec_col, hp, "query")
    cand = (qb.join(cb, ["table", "bucket"])
              .select("query_id", "neighbor_id").dropDuplicates())
    if exclude_self:
        cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("__qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("__cv"))
    j = cand.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
    cos = (_dot(F.col("__qv"), F.col("__cv")) /
           (_norm(F.col("__qv")) * _norm(F.col("__cv")))).alias("score")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (j.select("query_id", "neighbor_id", cos)
             .withColumn("rank", F.row_number().over(w))
             .where(F.col("rank") <= k))


def _train_centroids(corpus: DataFrame, id_col: str, vec_col: str,
                     n_cells: int, seed: int,
                     sample_size: int) -> np.ndarray:
    """K-means-lite coarse quantizer, L2-normalized centroids: a
    deterministic UNIFORM sample + a few Lloyd steps on the driver.
    Sampling orders by a seeded hash of the id and takes the top N —
    limit() alone would take the first partitions' rows, and on a
    corpus clustered by source (the normal 100 TB layout) that trains
    centroids on one region and recall collapses silently. orderBy+
    limit compiles to TakeOrderedAndProject (per-partition top-N, no
    full sort shuffle), so this stays cheap at scale."""
    samp = np.stack(
        [r[0] for r in
         corpus.select(F.col(vec_col),
                       F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h"))
               .orderBy("__h").limit(sample_size)
               .select(vec_col).collect()]
    ).astype(np.float32)
    rng = np.random.default_rng(seed)
    cents = samp[rng.choice(len(samp), size=min(n_cells, len(samp)),
                            replace=False)]
    for _ in range(5):  # few Lloyd steps on the sample
        d = samp @ cents.T
        nn = d.argmax(axis=1)
        for c in range(cents.shape[0]):
            m = samp[nn == c]
            if len(m):
                v = m.mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-9)
    return cents


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_cells: int = 16, nprobe: int = 4, seed: int = 42,
             sample_size: int = 2048, exclude_self: bool = True) -> DataFrame:
    """IVF-flat: centroids from a driver-side sample (tiny, one pass of
    Lloyd), corpus partitioned by nearest cell, queries probe ``nprobe``
    cells. The coarse quantizer is broadcast; assignment is one Arrow pass."""
    cents = _train_centroids(corpus, id_col, vec_col, n_cells, seed,
                             sample_size)
    bc = corpus.sparkSession.sparkContext.broadcast(cents)

    def assign(role, n_cells_probe):
        def gen(batches):
            for pdf in batches:
                vecs = np.stack(pdf["__v"].to_numpy()).astype(np.float32)
                norm = np.linalg.norm(vecs, axis=1, keepdims=True)
                sims = (vecs / np.maximum(norm, 1e-9)) @ bc.value.T
                cells = np.argsort(-sims, axis=1)[:, :n_cells_probe]
                n = len(pdf)
                yield pd.DataFrame({
                    f"{role}_id": np.repeat(pdf["id"].to_numpy(), n_cells_probe),
                    "cell": cells.reshape(-1).astype(np.int32),
                })
        return gen

    c_assign = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v")) \
        .mapInPandas(assign("neighbor", 1), schema="neighbor_id long, cell int")
    q_assign = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v")) \
        .mapInPandas(assign("query", nprobe), schema="query_id long, cell int")
    cand = q_assign.join(c_assign, "cell").select("query_id", "neighbor_id") \
        .dropDuplicates()
    if exclude_self:
        cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    j = cand.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
    cos = (_dot(F.col("__qv"), F.col("__cv")) /
           (_norm(F.col("__qv")) * _norm(F.col("__cv")))).alias("score")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (j.select("query_id", "neighbor_id", cos)
             .withColumn("rank", F.row_number().over(w))
             .where(F.col("rank") <= k))
