"""Deduplication suite for training-data pipelines.

Beyond the reference's exact tsv-uniq (§2.4): the operators a 100 TB
document corpus needs. All are DataFrame-native; Python appears only in
Arrow-vectorized batches.

- ``exact_dedup``       — hash-groupBy on a content fingerprint (md5/sha).
- ``minhash_dedup``     — shingle -> MinHash signature -> LSH band bucket ->
                          candidate pairs inside buckets -> exact-Jaccard
                          verify -> connected representatives. The standard
                          scale path: no all-pairs comparison; shuffle is
                          (doc, band) -> bucket, cost O(n * bands).
- ``simhash_dedup``     — 64-bit SimHash fingerprints; near-dups = small
                          Hamming distance within blocking buckets
                          (Charikar; 4-block exact-match blocking for
                          distance <= 3 by pigeonhole).
- ``ngram_jaccard_pairs`` — exact n-gram Jaccard for a candidate pair set.
- ``embedding_dedup``   — cosine near-dup over an embedding column (see
                          operators.similarity for the k-NN machinery).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsv_utils_spark.sketches.minhash import band_keys
from tsv_utils_spark.sketches.simhash import simhash_batch


def exact_dedup(df: DataFrame, content_col: str, id_col: str,
                keep: str = "first") -> DataFrame:
    """Exact dedup by content hash; keeps the min-id (or max-id) row per
    distinct content. One shuffle on the 32-hex-char hash, not the content
    itself (hash computed JVM-side in the scan stage)."""
    h = F.md5(F.col(content_col).cast("string")).alias("__h")
    pick = F.min(id_col) if keep == "first" else F.max(id_col)
    reps = df.select(h, id_col).groupBy("__h").agg(pick.alias(id_col))
    return df.join(reps, on=id_col, how="left_semi")


def decontaminate(train: DataFrame, heldout: DataFrame, content_col: str,
                  id_col: str, mode: str = "exact",
                  shingle_n: int = 3, threshold: float = 0.8,
                  normalize: bool = True,
                  broadcast_heldout: bool = True,
                  k: int = 128, bands: int = 16,
                  max_bucket_size: int | None = 10_000) -> DataFrame:
    """Remove training documents that overlap a held-out/eval set — the
    standard leakage guard before LLM training.

    - ``mode='exact'``: anti-join on the normalized-content fingerprint
      (lower + whitespace-collapse md5, the ``fingerprint()`` key) —
      one shuffle of 32-hex keys. ``broadcast_heldout=True`` (default)
      hints a broadcast of the fingerprint set; pass False when the
      held-out set is itself huge (the anti-join then plans a shuffle
      join / AQE decides).
    - ``mode='near'``: additionally drops train docs whose shingle
      Jaccard vs ANY heldout doc >= threshold, using the same
      MinHash-LSH candidate machinery as minhash_dedup (train and
      heldout signatures share one banding; candidate pairs are
      verified with exact JVM Jaccard before anything is dropped).
      ``k``/``bands``/``max_bucket_size`` tune the LSH S-curve and the
      degenerate-bucket guard exactly as in ``minhash_dedup``.
      SAFETY NOTE on the cap: a doc population sharing one signature in
      EVERY band (>cap near-identical boilerplate docs whose normalized
      text still differs, so the exact pass misses them) loses all its
      candidate pairs when its buckets are dropped — those leaks stay
      in the training set. For safety-critical decontamination of
      boilerplate-heavy corpora pass ``max_bucket_size=None`` (paying
      the quadratic candidate cost for degenerate buckets) or dedupe
      the corpus first.
      Near mode requires NON-NEGATIVE INTEGER ids on BOTH sides (the
      held-out side is mapped to a disjoint negative id space) — a
      negative id raises at runtime, in-plan (no extra scan); exact
      mode accepts any id type.
    """
    def key(df):
        c = F.col(content_col).cast("string")
        if normalize:
            c = F.trim(F.regexp_replace(F.lower(c), "[ \t\n\f\r]+", " "))
        return df.withColumn("__fp", F.md5(c))

    t = key(train)
    h = key(heldout).select("__fp").dropDuplicates(["__fp"])
    if broadcast_heldout:
        h = F.broadcast(h)
    clean = t.join(h, "__fp", "left_anti").drop("__fp")
    if mode == "exact":
        return clean
    if mode != "near":
        raise ValueError(f"bad mode {mode!r}")
    for side, d in (("train", train), ("heldout", heldout)):
        id_type = dict(d.dtypes)[id_col]
        if id_type not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"decontaminate(mode='near') needs integer id columns to "
                f"build the disjoint held-out id space; {side}.{id_col!r} "
                f"is {id_type} — add a surrogate integer id or use "
                f"mode='exact'")
    # near-dup leakage: band both sides together, but only (train,
    # heldout) pairs matter — tag the side, self-band, keep cross pairs.
    # heldout ids map to the NEGATIVE space (-id - 1): disjoint from
    # non-negative train ids. Non-negativity is enforced IN-PLAN (a
    # negative id on either side raises inside the row pipeline — no
    # extra scan), because a negative train id would silently collide
    # with the mapped heldout space and corrupt the joins.
    def checked(c, side):
        # NULL ids must raise too: NULL < 0 is NULL -> otherwise branch,
        # and a NULL id then silently drops out of the band joins, so a
        # NULL-id train doc could never be flagged as leaked.
        return F.when(
            c.isNull() | (c < 0),
            F.raise_error(F.concat(
                F.lit(f"decontaminate(mode='near'): NULL/negative {side} "
                      f"{id_col} "),
                F.coalesce(c.cast("string"), F.lit("NULL")),
                F.lit(" collides with the disjoint held-out id space")))
        ).otherwise(c)

    tagged = clean.select(
        checked(F.col(id_col), "train").alias(id_col),
        F.col(content_col)).withColumn(
        "__side", F.lit(0)).unionByName(
        heldout.select(
            (-checked(F.col(id_col), "heldout") - 1).alias(id_col),
            F.col(content_col)).withColumn("__side", F.lit(1)))
    sigs = minhash_signatures(tagged, content_col, id_col,
                              k=k, shingle_n=shingle_n)
    sides = tagged.select(id_col, "__side")
    banded = _band_buckets(sigs, tagged, id_col, bands).join(sides, id_col)
    # the same degenerate-bucket cap as minhash_dedup: a bucket of
    # identically-signatured docs on both sides (empty/boilerplate)
    # would otherwise blow up the cross join quadratically
    banded = _cap_buckets(banded, max_bucket_size)
    a = banded.where(F.col("__side") == 0).select(
        F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.where(F.col("__side") == 1).select(
        F.col(id_col).alias("id_b"), "band", "bucket")
    cand = a.join(b, ["band", "bucket"]) \
            .select("id_a", "id_b").dropDuplicates()
    verified = ngram_jaccard_pairs(tagged, content_col, id_col, cand,
                                   shingle_n=shingle_n) \
        .where(F.col("jaccard") >= threshold)
    leaked = verified.select(F.col("id_a").alias(id_col)).dropDuplicates()
    return clean.join(leaked, id_col, "left_anti")


def ngram_contamination(train: DataFrame, heldout: DataFrame,
                        content_col: str, id_col: str,
                        n: int = 13, min_shared: int = 1) -> DataFrame:
    """N-GRAM-level eval-set contamination (the published GPT-3 method:
    Brown et al. 2020, App. C flag training documents sharing any
    13-gram with an eval example — finer than doc-level LSH, which can
    miss a single quoted eval question inside a long document).

    Returns ``(id_col, n_shared_ngrams)`` for train docs sharing at
    least ``min_shared`` distinct grams with ANY held-out doc.

    Per the published method, a held-out doc SHORTER than ``n`` tokens
    is matched at its own length m = min(n, len): the train side is
    shingled at every effective size the held-out set actually needs
    (at most ``n`` distinct sizes, discovered with one tiny job over
    the held-out set — held-out sets are small by definition), and
    grams join on (size, gram) so an m-gram can never collide with an
    n-gram. Without this, a 12-token eval question quoted inside a
    500-token training doc would be unreachable at n=13.

    Scale shape: held-out grams are deduplicated once (AQE broadcasts
    the semi-join side when it fits); the train side is shingled at ALL
    needed sizes in ONE scan and ONE explode (a flattened array of
    (size, gram) structs — never one full corpus pass per size), then
    ONE groupBy(id). No signatures, no Python.
    """
    # split("") yields [""] (size 1, not 0) — the same trap
    # gopher_quality guards; without this an empty/whitespace held-out
    # doc would register m_eff=1, explode the whole train corpus into
    # unigrams, and flag every empty train doc via the "" gram
    toks = _tokenize_expr(content_col)
    tok_len = F.when(F.length(F.trim(F.coalesce(F.col(content_col),
                                                F.lit("")))) == 0,
                     F.lit(0)).otherwise(F.size(toks))
    m_eff = F.least(F.lit(n), tok_len)
    sizes = sorted(r["m"] for r in
                   heldout.select(m_eff.alias("m")).where("m > 0")
                          .distinct().collect())
    if not sizes:
        return train.select(F.col(id_col),
                            F.lit(0).cast("long")
                             .alias("n_shared_ngrams")).limit(0)

    def _tag(m):
        # one-arg lambda bound via factory: a `lambda g, m=m` would be
        # seen by F.transform as the (element, index) form and m would
        # receive the ARRAY INDEX instead of the size
        return lambda g: F.struct(F.lit(m).alias("m"), g.alias("g"))

    def tagged_grams(size_pred):
        """Flattened (size, gram) structs across all needed sizes —
        ONE expression, so the consumer scans its input once.
        ``size_pred(m)`` gates which docs contribute at size m."""
        branches = [
            F.when(size_pred(m) & (tok_len > 0),
                   F.transform(
                       F.array_distinct(_shingle_expr(content_col, m)),
                       _tag(m)))
             .otherwise(F.array().cast("array<struct<m:int,g:string>>"))
            for m in sizes]
        return F.flatten(F.array(*branches))

    # held-out docs contribute grams at THEIR effective size only;
    # train docs are shingled at every size the held-out set needs
    grams_h = heldout.select(
        F.explode(tagged_grams(lambda m: m_eff == m)).alias("s")) \
        .select(F.col("s.m").alias("__m"), F.col("s.g").alias("__g")) \
        .dropDuplicates(["__m", "__g"])
    grams_t = train.select(
        F.col(id_col),
        F.explode(tagged_grams(lambda m: F.lit(True))).alias("s")) \
        .select(id_col, F.col("s.m").alias("__m"),
                F.col("s.g").alias("__g"))
    shared = grams_t.join(grams_h, ["__m", "__g"], "left_semi")
    # (id, __m, __g) is already distinct (array_distinct per branch,
    # semi-join never duplicates) — plain count, no distinct aggregate
    return shared.groupBy(id_col) \
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams")) \
        .where(F.col("n_shared_ngrams") >= min_shared)


def _band_buckets(sigs: DataFrame, df: DataFrame, id_col: str,
                  bands: int) -> DataFrame:
    """Explode MinHash signatures to (id, band, bucket) rows — THE one
    banding implementation, shared by minhash_dedup and
    decontaminate(mode='near') so the LSH S-curve can never drift
    between self-dedup and cross-corpus decontamination."""
    def to_bands(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            sig = np.stack(pdf["sig"].to_numpy()).astype(np.uint64)
            bk = band_keys(sig, bands)  # (n, bands)
            n = len(ids)
            yield pd.DataFrame({
                id_col: np.repeat(ids, bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), n),
                "bucket": bk.reshape(-1).astype(np.int64),
            })

    return sigs.mapInPandas(
        to_bands, schema=f"{_field_ddl(df, id_col)}, band int, bucket long")


def _cap_buckets(banded: DataFrame,
                 max_bucket_size: int | None) -> DataFrame:
    """Drop degenerate LSH buckets (standard guard: a bucket above the
    cap means a quadratic candidate blowup; near-identical docs still
    pair through their other, non-degenerate bands)."""
    if max_bucket_size is None:
        return banded
    sizes = banded.groupBy("band", "bucket") \
        .agg(F.count(F.lit(1)).alias("__bn"))
    return banded.join(
        sizes.where(F.col("__bn") <= max_bucket_size)
             .select("band", "bucket"),
        ["band", "bucket"], "left_semi")


def _tokenize_expr(col: str):
    # coalesce: NULL content tokenizes like empty content; this JVM
    # expression IS the tokenization contract — signature generation and
    # the exact-Jaccard verify both consume it, so they can never drift
    return F.split(F.trim(F.lower(F.coalesce(F.col(col), F.lit("")))), "[ \t\n\f\r]+")


def _shingle_expr(col: str, n: int):
    """Word n-gram shingle strings, built entirely JVM-side (codegen):
    one whole-doc shingle when the doc has fewer than ``n`` tokens."""
    toks = _tokenize_expr(col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "))


def minhash_signatures(df: DataFrame, content_col: str, id_col: str,
                       k: int = 128, shingle_n: int = 3) -> DataFrame:
    """(id, signature array<long>) MinHash signatures.

    Tokenization + shingling run JVM-side (``_shingle_expr``, whole-stage
    codegen); the Arrow batch only hashes the shingle strings and takes
    the k per-permutation minima in NumPy — no per-row Python string
    work remains."""
    from tsv_utils_spark.sketches.hashing import hash64
    from tsv_utils_spark.sketches.minhash import signature

    sh = df.select(id_col, _shingle_expr(content_col, shingle_n).alias("__sh"))

    def gen(batches):
        for pdf in batches:
            sigs = np.empty((len(pdf), k), dtype=np.uint64)
            for i, grams in enumerate(pdf["__sh"]):
                arr = np.asarray(grams, dtype=object)
                sigs[i] = signature(hash64(arr) if arr.size
                                    else np.empty(0, np.uint64), k=k)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "sig": list(sigs.astype(np.int64)),  # view as signed for Spark
            })

    schema = f"{_field_ddl(df, id_col)}, sig array<long>"
    return sh.mapInPandas(gen, schema=schema)


def minhash_dedup(df: DataFrame, content_col: str, id_col: str,
                  k: int = 128, bands: int = 16, shingle_n: int = 3,
                  threshold: float = 0.8,
                  max_bucket_size: int | None = 10_000,
                  checkpoint_dir: str | None = None) -> DataFrame:
    """Near-dup clusters via MinHash-LSH with exact-Jaccard verification.

    Returns (id_col, dup_of) pairs where dup_of is the minimum doc id of the
    verified near-dup group. Plan shape (scale-first):
      1. signatures: one Arrow pass, no shuffle
      2. explode to (band_key, id): shuffle keyed by band bucket — skew-safe
         because identical docs share all bands but bucket fan-out is bands*n
      3. within-bucket candidate pairs — quadratic in bucket size, so
         buckets above ``max_bucket_size`` are dropped (standard LSH
         guard: a bucket that big is a degenerate band — e.g. the
         empty-signature bucket of a corpus full of empty docs — and a
         10k bucket already means 50M candidate pairs). Near-identical
         docs still pair through their other, non-degenerate bands.
      4. exact verify on the pair list (join back to content, Arrow batch)
    """
    sigs = minhash_signatures(df, content_col, id_col, k=k, shingle_n=shingle_n)
    banded = _cap_buckets(_band_buckets(sigs, df, id_col, bands),
                          max_bucket_size)

    # candidate pairs: self-join within (band, bucket); min-id as left side
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (a.join(b, ["band", "bucket"])
              .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
              .select(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
              .dropDuplicates(["id_a", "id_b"]))

    # exact verify: JVM-side n-gram Jaccard (array_intersect/array_union on
    # shingle arrays) — zero Python. Signatures and verify share ONE
    # shingle definition (_shingle_expr), so the S-curve candidates and
    # the exact check can never disagree on tokenization.
    verified = ngram_jaccard_pairs(df, content_col, id_col, pairs,
                                   shingle_n=shingle_n) \
        .where(F.col("jaccard") >= threshold)

    # representative = min id in the verified near-dup component (full
    # transitive closure via iterative min-propagation)
    comps = connected_components(verified.select("id_a", "id_b"),
                                 checkpoint_dir=checkpoint_dir)
    return comps.where(F.col("id") != F.col("component")) \
        .select(F.col("id").alias(id_col), F.col("component").alias("dup_of"))


def simhash_fingerprints(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """(id, simhash long) — 64-bit similarity fingerprints.

    Tokenization runs JVM-side (``_tokenize_expr``); the Arrow batch
    only hashes token arrays and packs sign sums in NumPy."""
    toked = df.select(id_col, _tokenize_expr(content_col).alias("__toks"))

    def gen(batches):
        for pdf in batches:
            fps = simhash_batch(pdf["__toks"]).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": fps})

    return toked.mapInPandas(
        gen, schema=f"{_field_ddl(df, id_col)}, simhash long")


def simhash_dedup(df: DataFrame, content_col: str, id_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Blocking: split the 64-bit fingerprint into 4 16-bit blocks; any pair
    within Hamming distance 3 matches exactly on >= 1 block (pigeonhole),
    so candidate generation is 4 equi-joins, never all-pairs.
    Returns (id_a, id_b, hamming).
    """
    fps = simhash_fingerprints(df, content_col, id_col)
    blocks = fps.select(
        id_col, "simhash",
        *[(F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)))
          .alias(f"b{i}") for i in range(4)])
    out = None
    for i in range(4):
        a = blocks.select(F.col(id_col).alias("id_a"),
                          F.col("simhash").alias("h_a"), F.col(f"b{i}").alias("blk"))
        b = blocks.select(F.col(id_col).alias("id_b"),
                          F.col("simhash").alias("h_b"), F.col(f"b{i}").alias("blk"))
        cand = a.join(b, "blk").where(F.col("id_a") < F.col("id_b")) \
                .select("id_a", "id_b", "h_a", "h_b")
        out = cand if out is None else out.unionByName(cand)
    cand = out.dropDuplicates(["id_a", "id_b"])
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming")
    return (cand.select("id_a", "id_b", ham)
                .where(F.col("hamming") <= max_hamming))


def ngram_jaccard_pairs(df: DataFrame, content_col: str, id_col: str,
                        pairs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for given (id_a, id_b) pairs — JVM-side set
    algebra on shingle arrays (no Python in the hot path)."""
    sh = F.array_distinct(_shingle_expr(content_col, shingle_n))
    docs = df.select(F.col(id_col), sh.alias("__sh"))
    j = (pairs
         .join(docs.withColumnRenamed(id_col, "id_a")
                   .withColumnRenamed("__sh", "__sa"), "id_a")
         .join(docs.withColumnRenamed(id_col, "id_b")
                   .withColumnRenamed("__sh", "__sb"), "id_b"))
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = F.size(F.array_union("__sa", "__sb")).cast("double")
    return j.select("id_a", "id_b",
                    F.when(union > 0, inter / union).otherwise(1.0)
                     .alias("jaccard"))


def embedding_dedup(df: DataFrame, vec_col: str, id_col: str,
                    threshold: float = 0.95, planes: int = 12,
                    tables: int = 8, seed: int = 42,
                    max_bucket_size: int | None = 10_000) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucketed candidates (no
    all-pairs), exact cosine verify, keep pairs >= threshold.

    Returns (id_a, id_b, score). The scale path for semantic dedup of a
    document corpus via its embedding column. Buckets above
    ``max_bucket_size`` are dropped before the quadratic within-bucket
    self-join (degenerate-band guard, same rationale as minhash_dedup —
    near-dups still collide in their other tables).
    """
    from tsv_utils_spark.operators.similarity import (
        _bucket_df,
        _dot,
        _hyperplanes,
        _norm,
    )

    dim = len(df.select(vec_col).first()[0])
    hp = _hyperplanes(dim, planes, tables, seed)
    b1 = _bucket_df(df, id_col, vec_col, hp, "a")
    if max_bucket_size is not None:
        ok = (b1.groupBy("table", "bucket")
                .agg(F.count(F.lit(1)).alias("__bn"))
                .where(F.col("__bn") <= max_bucket_size)
                .select("table", "bucket"))
        b1 = b1.join(ok, ["table", "bucket"], "left_semi")
    b2 = _bucket_df(df, id_col, vec_col, hp, "b")
    cand = (b1.join(b2, ["table", "bucket"])
              .where(F.col("a_id") < F.col("b_id"))
              .select(F.col("a_id").alias("id_a"),
                      F.col("b_id").alias("id_b")).dropDuplicates())
    v = df.select(F.col(id_col), F.col(vec_col).alias("__v"))
    j = (cand.join(v.withColumnRenamed(id_col, "id_a")
                    .withColumnRenamed("__v", "__va"), "id_a")
             .join(v.withColumnRenamed(id_col, "id_b")
                    .withColumnRenamed("__v", "__vb"), "id_b"))
    cos = (_dot(F.col("__va"), F.col("__vb")) /
           (_norm(F.col("__va")) * _norm(F.col("__vb")))).alias("score")
    return j.select("id_a", "id_b", cos).where(F.col("score") >= threshold)


def connected_components(pairs: DataFrame, max_iter: int = 50,
                         checkpoint_dir: str | None = None) -> DataFrame:
    """Transitive closure of near-dup pairs: (id, component) where
    component = min id reachable.

    Scale-hardened iteration: each round does (1) min-propagation across
    edges and (2) a pointer-jump l(u) <- l(l(u)) — the path-compression
    step that makes long chains converge in O(log diameter) rounds instead
    of O(diameter) (the large-star idea of Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14). Labels are
    checkpointed every round, so plan depth and recompute cost stay
    CONSTANT per round rather than accumulating lineage quadratically,
    and the convergence probe is a cheap filter over the already-
    materialized round (labels only ever decrease: no decrease anywhere
    means every edge is label-consistent and every pointer is a root —
    converged).

    By default rounds use ``localCheckpoint`` (executor-local blocks —
    fast, but lost if an executor dies, killing a multi-hour job
    mid-iteration). For cluster runs pass ``checkpoint_dir`` (an
    HDFS/object-store path): rounds then use RELIABLE ``checkpoint()``
    against it, surviving executor loss at the cost of one write+read
    of the label table per round. Storage stays bounded at ~2x the
    label table: once round N materializes, round N-2's checkpoint
    files (which nothing references anymore — each round reads only
    the previous one) are deleted via the Hadoop FileSystem API, so a
    50-round job does not hold 50 full copies (Spark itself only
    cleans checkpoints on RDD GC with non-default
    spark.cleaner.referenceTracking.cleanCheckpoints).

    NOTE: passing ``checkpoint_dir`` calls ``sc.setCheckpointDir`` —
    an APP-GLOBAL setting shared by every user of this SparkContext;
    concurrent reliable-checkpoint users should agree on one dir. The
    final round's files back the returned DataFrame and are kept; call
    :func:`cleanup_checkpoint` on the result once it has been
    materialized to reclaim them."""
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        sc = spark.sparkContext
        sc.setCheckpointDir(checkpoint_dir)
        jvm = sc._jvm
        fs = jvm.org.apache.hadoop.fs.Path(checkpoint_dir) \
            .getFileSystem(sc._jsc.hadoopConfiguration())

        ours: list = []  # our rounds' EXACT rdd dirs, oldest first

        def _persist_round(df):
            out = df.checkpoint(eager=True)
            # the checkpointed plan is a LogicalRDD over a
            # ReliableCheckpointRDD whose file path is queryable — so
            # cleanup deletes exactly OUR rounds' dirs, never a
            # concurrent job's checkpoint in the same app
            opt = out._jdf.queryExecution().analyzed() \
                .rdd().getCheckpointFile()
            if opt.isDefined():
                ours.append(opt.get())
            # keep current + previous (round k+1 reads only round k)
            while len(ours) > 2:
                fs.delete(jvm.org.apache.hadoop.fs.Path(ours.pop(0)),
                          True)
            return out
    else:
        def _persist_round(df):
            return df.localCheckpoint(eager=True)

    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    edges = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # materialize the edge list ONCE: every round's min-propagation joins
    # against it, and `pairs` is usually an EXPENSIVE lazy plan (banded
    # candidates + exact verify) — without this, each round (plus the
    # seed-label build) re-evaluates that whole plan (r6: semdedup at
    # 20k vectors spent ~4x its verify cost in CC rounds). Edge rows are
    # just id pairs, so the materialization is tiny; reliable mode
    # checkpoints them like the label rounds (tracked separately — the
    # round-N-2 GC below must never delete the edges, which every round
    # reads) and deletes them once the final labels are materialized.
    edges_path = None
    if checkpoint_dir is not None:
        edges = edges.checkpoint(eager=True)
        opt = edges._jdf.queryExecution().analyzed().rdd() \
            .getCheckpointFile()
        if opt.isDefined():
            edges_path = opt.get()
    else:
        edges = edges.localCheckpoint(eager=True)
    labels = _persist_round(
        edges.select(F.col("a").alias("id"))
             .unionByName(edges.select(F.col("b").alias("id")))
             .distinct()
             .withColumn("component", F.col("id")))
    for _ in range(max_iter):
        # (1) min over neighbors' current labels, propagated across edges
        prop = (edges.join(labels.withColumnRenamed("id", "b")
                                 .withColumnRenamed("component", "__nbr"),
                           "b")
                     .groupBy(F.col("a").alias("id"))
                     .agg(F.min("__nbr").alias("__nbr_min")))
        stepped = (labels.join(prop, "id", "left")
                   .select("id", F.col("component").alias("__old"),
                           F.least("component",
                                   F.coalesce("__nbr_min", "component"))
                            .alias("component")))
        # (2) pointer jump: follow the label one hop (labels are node ids,
        # so every label value has a row; left join + coalesce for safety)
        jump = stepped.select(F.col("id").alias("__jid"),
                              F.col("component").alias("__jcomp"))
        new_labels = _persist_round(stepped.join(
            jump, stepped["component"] == jump["__jid"], "left")
            .select("id", "__old",
                    F.least(F.coalesce("__jcomp", "component"), "component")
                     .alias("component")))
        changed = (new_labels.where(F.col("component") < F.col("__old"))
                   .limit(1).count())
        labels = new_labels.drop("__old")
        if not changed:
            break
    if checkpoint_dir is not None:
        # round N reads only round N-1's files, and the RETURNED frame
        # reads only the final round's — everything older is garbage now.
        # The final round's dir must outlive the caller's consumption of
        # the result; hand it to cleanup_checkpoint() below.
        while len(ours) > 1:
            fs.delete(jvm.org.apache.hadoop.fs.Path(ours.pop(0)), True)
        if edges_path is not None:
            # the final (eager) label round no longer reads the edges
            fs.delete(jvm.org.apache.hadoop.fs.Path(edges_path), True)
        labels._cc_checkpoint_files = list(ours)  # type: ignore[attr-defined]
        labels._cc_checkpoint_fs = (jvm, fs)  # type: ignore[attr-defined]
    return labels


def cleanup_checkpoint(labels: DataFrame) -> None:
    """Delete the reliable-checkpoint files behind a
    ``connected_components(checkpoint_dir=...)`` result AFTER the caller
    has materialized it (written/collected) — the frame cannot be
    recomputed afterwards. No-op for localCheckpoint results."""
    files = getattr(labels, "_cc_checkpoint_files", None)
    if not files:
        return
    jvm, fs = labels._cc_checkpoint_fs  # type: ignore[attr-defined]
    for path in files:
        fs.delete(jvm.org.apache.hadoop.fs.Path(path), True)
    labels._cc_checkpoint_files = []  # type: ignore[attr-defined]


def _field_ddl(df: DataFrame, col: str) -> str:
    f = df.schema[col]
    return f"{f.name} {f.dataType.simpleString()}"


def remove_duplicate_paragraphs_global(df: DataFrame, col: str = "text",
                                       id_col: str = "doc_id") -> DataFrame:
    """RefinedWeb-style corpus-wide paragraph dedup, keep-FIRST: every
    paragraph (split on blank lines, normalized lower+trim) that occurs
    more than once across the WHOLE corpus keeps only its first
    occurrence in (id, position) order; later occurrences are dropped
    and each document is reassembled from its surviving paragraphs in
    original order (joined with a blank line). Complements
    :func:`tsv_utils_spark.operators.text.remove_boilerplate_lines`,
    which drops ALL occurrences of hot lines — here exactly one copy of
    every paragraph survives, the semantics used for repeated content
    that is legitimate once (quotes, licenses, reused intros).

    Returns (id_col, text). Blank paragraphs always survive (they carry
    layout, not content).

    Scale shape: one narrow explode; ONE shuffle keyed by the
    normalized paragraph, as a min-struct AGGREGATE — partial
    (map-side) combine reduces a hot paragraph (boilerplate repeated
    in millions of docs) to one row per map task before the shuffle,
    where a row_number window would funnel every occurrence into a
    single partition AQE cannot split. Blank paragraphs are routed
    around the shuffle entirely. One groupBy(id) reassembles.
    """
    # NULL ids raise in-plan (family convention — _keep_first_span_dedup,
    # url_dedup, hash_split): a NULL id would win the keep-first
    # min-struct (struct ordering sorts NULL first) while the final
    # non-null-safe rebuild join never matches it — the paragraph would
    # vanish corpus-wide and the NULL-id doc's text silently become ''.
    checked_id = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(
            f"remove_duplicate_paragraphs_global: NULL {id_col} — "
            "keep-first order undefined; filter or fill ids first"))
    ).otherwise(F.col(id_col)).alias(id_col)
    paras = df.select(
        checked_id,
        F.posexplode(F.split(F.coalesce(F.col(col), F.lit("")),
                             "\n{2,}")).alias("__pos", "__para"))
    tagged = paras.withColumn("__norm",
                              F.lower(F.trim(F.col("__para"))))
    blanks = tagged.where(F.col("__norm") == "") \
                   .select(id_col, "__pos", "__para")
    # (id, pos) is unique, so min over struct(id, pos, para) picks the
    # first occurrence deterministically and carries its original text
    firsts = (tagged.where(F.col("__norm") != "")
              .groupBy("__norm")
              .agg(F.min(F.struct(F.col(id_col), F.col("__pos"),
                                  F.col("__para"))).alias("__f"))
              .select(F.col(f"__f.{id_col}").alias(id_col),
                      F.col("__f.__pos").alias("__pos"),
                      F.col("__f.__para").alias("__para")))
    rebuilt = (firsts.unionByName(blanks).groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col("__pos"), F.col("__para")))),
                       lambda s: s["__para"]),
                   "\n\n").alias(col)))
    # keep-first can drop a doc's every paragraph; restore empty text
    return df.select(id_col).join(rebuilt, id_col, "left") \
        .select(id_col, F.coalesce(F.col(col), F.lit("")).alias(col))


def semdedup(df: DataFrame, vec_col: str = "embedding",
             id_col: str = "vec_id", threshold: float = 0.999,
             n_clusters: int = 64, seed: int = 42,
             sample_size: int = 2048,
             max_cluster_size: int | None = 10_000,
             checkpoint_dir: str | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means clustering + within-cluster cosine pruning. Complements
    :func:`embedding_dedup` (LSH candidates): SemDeDup's published shape
    is cluster-then-compare, which bounds candidate generation at
    O(sum cluster_size^2) with NO hash-collision recall loss inside a
    cluster — the trade is that near-dups split across cluster
    boundaries are missed.

    Pipeline: k-means-lite centroids (deterministic hash-ordered
    sample + Lloyd on the driver, broadcast), one Arrow pass assigns
    every vector to its nearest centroid, a within-cluster self-join
    proposes pairs, exact cosine keeps pairs >= ``threshold``, and
    connected components reduce each similarity group to ONE survivor
    (the smallest id). ``max_cluster_size`` guards the quadratic
    self-join against degenerate clusters (all rows of an over-large
    cluster are kept — pass None to opt out); ``checkpoint_dir``
    forwards to :func:`connected_components` for reliable cluster runs.

    Returns (id_col, cluster, keep) for EVERY input row; keep=false
    rows are the semantic duplicates to drop.
    """
    from tsv_utils_spark.operators.similarity import (
        _dot,
        _norm,
        _train_centroids,
    )

    cents = _train_centroids(df, id_col, vec_col, n_clusters, seed,
                             sample_size)
    bc = df.sparkSession.sparkContext.broadcast(cents)
    dim = cents.shape[1]

    # fixed anchor directions for the pair prefilter below: in high
    # dimension a SINGLE anchor prunes weakly (anchor distances
    # concentrate in a ~1/sqrt(dim) band), so each vector also records
    # its distance to 3 deterministic seeded unit anchors — every anchor
    # contributes an independent lossless gap filter
    _rng = np.random.default_rng(seed ^ 0x5EED)
    _anch = _rng.standard_normal((3, dim)).astype(np.float64)
    _anch /= np.maximum(np.linalg.norm(_anch, axis=1, keepdims=True),
                        1e-12)

    def assign(batches):
        for pdf in batches:
            vecs = np.stack(pdf["__v"].to_numpy()).astype(np.float32)
            norm = np.linalg.norm(vecs, axis=1, keepdims=True)
            sims = (vecs / np.maximum(norm, 1e-9)) @ bc.value.T
            cl = sims.argmax(axis=1).astype(np.int32)
            # anchor distances for the pair prefilter: float64
            # ||unit(v) - anchor|| (assignment itself stays on the
            # float32 path — unchanged)
            v64 = vecs.astype(np.float64)
            u = v64 / np.maximum(np.linalg.norm(v64, axis=1,
                                                keepdims=True), 1e-12)
            c64 = bc.value.astype(np.float64)
            ch = c64 / np.maximum(np.linalg.norm(c64, axis=1,
                                                 keepdims=True), 1e-12)
            out = {
                "id": pdf["id"].to_numpy(),
                "cluster": cl,
                "d0": np.linalg.norm(u - ch[cl], axis=1),
            }
            for j in range(3):
                out[f"d{j + 1}"] = np.linalg.norm(u - _anch[j], axis=1)
            yield pd.DataFrame(out)

    # id dtype follows the input (string vec ids are accepted everywhere
    # else in the dedup family — a hard-coded 'id long' schema made them
    # die in Arrow conversion at runtime)
    id_ddl = f"id {df.schema[id_col].dataType.simpleString()}"
    assigned = df.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("__v")) \
        .mapInPandas(assign, schema=f"{id_ddl}, cluster int, d0 double, "
                                    f"d1 double, d2 double, d3 double") \
        .localCheckpoint(eager=True)  # one pass; reused three times below
    pairable = assigned
    if max_cluster_size is not None:
        ok = (assigned.groupBy("cluster")
              .agg(F.count(F.lit(1)).alias("__cn"))
              .where(F.col("__cn") <= max_cluster_size)
              .select("cluster"))
        pairable = assigned.join(ok, "cluster", "left_semi")
    # triangle-inequality pair prefilter (lossless): unit vectors with
    # cos(a, b) >= t satisfy ||u_a - u_b|| <= sqrt(2 - 2t), and for ANY
    # anchor p, | d(u_a, p) - d(u_b, p) | <= ||u_a - u_b||. So a pair
    # whose anchor-distance gap exceeds the bound (+ slack dwarfing
    # float64 rounding) cannot reach the threshold — pruned by a codegen
    # double compare instead of the interpreted per-pair cosine (3 x dim
    # boxed lambda evals). Edges, hence components and survivors, are
    # IDENTICAL: the exact cosine below is unchanged and still decides
    # every surviving pair. At threshold 0.999 the bound is ~0.045 while
    # anchor distances spread over ~[0, 1.4] — most of the quadratic
    # within-cluster pair volume never reaches the cosine.
    eps = math.sqrt(max(0.0, 2.0 - 2.0 * threshold)) + 1e-6
    gap_ok = None
    for j in range(4):
        g = (F.abs(F.col(f"x.d{j}") - F.col(f"y.d{j}")) <= F.lit(eps))
        gap_ok = g if gap_ok is None else (gap_ok & g)
    cand = (pairable.alias("x").join(pairable.alias("y"), "cluster")
            .where((F.col("x.id") < F.col("y.id")) & gap_ok)
            .select(F.col("x.id").alias("id_a"),
                    F.col("y.id").alias("id_b")))
    v = df.select(F.col(id_col), F.col(vec_col).alias("__v"))
    j = (cand.join(v.withColumnRenamed(id_col, "id_a")
                    .withColumnRenamed("__v", "__va"), "id_a")
             .join(v.withColumnRenamed(id_col, "id_b")
                    .withColumnRenamed("__v", "__vb"), "id_b"))
    cos = (_dot(F.col("__va"), F.col("__vb")) /
           (_norm(F.col("__va")) * _norm(F.col("__vb")))).alias("score")
    edges = j.select("id_a", "id_b", cos) \
             .where(F.col("score") >= threshold) \
             .select("id_a", "id_b")
    comp = connected_components(edges, checkpoint_dir=checkpoint_dir)
    return (assigned.join(comp.withColumnRenamed("id", "id_j"),
                          F.col("id") == F.col("id_j"), "left")
            .select(F.col("id").alias(id_col), F.col("cluster"),
                    (F.col("component").isNull()
                     | (F.col("component") == F.col("id")))
                    .alias("keep")))


# sentence tokenizer for span dedup: each token is a maximal run up to
# (and including) its terminal-punctuation run plus trailing whitespace,
# with a final no-punctuation tail token — tokens PARTITION the text
# (concatenating them reproduces the input byte-exactly), which is what
# makes removal + reassembly lossless. RE2-portable (no lookbehind) so
# the DuckDB oracle replays it verbatim.
_SENT_PAT = r"[^.!?]*[.!?]+[ \t\n\f\r]*|[^.!?]+$"


def dedup_sentence_spans_global(df: DataFrame, col: str = "text",
                                id_col: str = "doc_id",
                                span: int = 3) -> DataFrame:
    """C4's actual dedup unit (Raffel et al. 2020 §2.2: "we discarded
    all but one of any three-sentence span occurring more than once"):
    corpus-wide keep-FIRST over runs of ``span`` consecutive sentences.
    The first occurrence (in (id, position) order) of each normalized
    span survives (keys are case-folded and whitespace-collapsed, so
    reflowed copies of the same sentences still match); every later occurrence has ALL its sentences
    removed (a sentence is removed if ANY duplicate span covers it);
    documents are rebuilt from the surviving sentence tokens
    byte-exactly — tokens carry their own punctuation and trailing
    whitespace and partition the original text, so reassembly is plain
    concatenation.

    Returns (id_col, text).

    Scale shape: ONE scan of the text column; spans explode to
    ~n_sentences rows carrying only (id, start, md5 key). The first
    occurrence per key is a min-struct AGGREGATE (partial map-side
    combine — a boilerplate span repeated in millions of docs reduces
    per map task before the shuffle; a row_number window would funnel
    every occurrence into one partition AQE cannot split). Non-first
    occurrences come from re-joining spans to the firsts on the key —
    a shuffle join AQE's skewed-join splitting DOES handle. The
    removal set (id, sentence-index) is tiny (only duplicated spans),
    collapses to one array per affected doc, and is applied as an
    index-filter projection — the text column itself never shuffles.
    """
    if span < 1:
        raise ValueError(f"need span >= 1, got {span}")
    return _keep_first_span_dedup(df, col, id_col, _SENT_PAT, span)


# whitespace-word tokenizer for token-window dedup: a token is a word
# plus its trailing whitespace, with a leading-whitespace token at
# position 0 when the text starts with whitespace — tokens PARTITION
# the text, so removal + reassembly is byte-exact (same trick as
# _SENT_PAT). RE2-portable.
_WORD_PAT = r"^[ \t\n\f\r]+|[^ \t\n\f\r]+[ \t\n\f\r]*"


def dedup_token_windows_global(df: DataFrame, col: str = "text",
                               id_col: str = "doc_id",
                               window: int = 50) -> DataFrame:
    """Exact-substring dedup at token granularity — the method of Lee
    et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499): any run of ``window`` consecutive word
    tokens occurring more than once in the corpus keeps only its first
    occurrence; every other occurrence has the covered tokens removed
    (overlapping duplicate windows remove their union, so a long
    duplicated region disappears wholesale), and documents are rebuilt
    byte-exactly from the surviving tokens.

    Lee et al. build suffix arrays over the tokenized corpus; the
    Spark-native shape here hashes every length-``window`` token slice
    (O(n x window) bytes through md5 — embarrassingly parallel, no
    global structure) into the same keep-first aggregate/skew-join
    machinery as :func:`dedup_sentence_spans_global`. Window keys are
    whitespace-and-case normalized, so reflowed copies still match.

    Returns (id_col, text).
    """
    if window < 1:
        raise ValueError(f"need window >= 1, got {window}")
    return _keep_first_span_dedup(df, col, id_col, _WORD_PAT, window)


def _keep_first_span_dedup(df: DataFrame, col: str, id_col: str,
                           token_pat: str, span: int) -> DataFrame:
    """Shared core of the keep-first span/window dedups. The tokenizer
    pattern must PARTITION the text (concatenating all matches
    reproduces the input) — that is what makes removal + reassembly
    byte-exact plain concatenation.

    Scale shape: the tokenize + per-window md5 (the dominant cost) runs
    ONCE — the narrow span table (id, start, md5 key) is materialized
    via ``localCheckpoint`` and reused as both the aggregate input and
    the join probe (without it Catalyst recomputes the explode subtree
    for each consumer: measured 3 FileScans / 2x the hashing). The
    first occurrence per key is a min-struct AGGREGATE (partial
    map-side combine — a boilerplate span repeated in millions of docs
    reduces per map task before the shuffle; a row_number window would
    funnel every occurrence into one partition AQE cannot split).
    Non-first occurrences come from re-joining spans to the firsts on
    the key — a shuffle join AQE's skewed-join splitting DOES handle.
    The removal set (id, token-index) is tiny (only duplicated spans),
    collapses to one array per affected doc, and is applied as an
    index-filter projection over one final text scan. NOTE: the
    operator is therefore EAGER (the span job runs at call time, the
    same convention as :func:`semdedup`'s assignment pass), and NULL
    ids raise in-plan — a NULL id would make the keep-first ordering
    undefined and silently disable removal for its keys.
    """
    c = F.coalesce(F.col(col), F.lit(""))
    checked_id = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(
            f"keep-first span dedup: NULL {id_col} — keep-first order "
            f"is undefined for NULL ids; assign surrogate ids first"))
    ).otherwise(F.col(id_col))
    arr = F.regexp_extract_all(c, F.lit(token_pat), F.lit(0))
    empty = F.array().cast("array<struct<start:int,key:string>>")
    norm = lambda x: F.trim(F.regexp_replace(  # noqa: E731
        F.lower(x), "[ \t\n\f\r]+", " "))
    spans = df.select(
        checked_id.alias(id_col),
        F.explode(
            F.when(F.size(arr) >= span, F.transform(
                F.sequence(F.lit(0), F.size(arr) - span),
                lambda i: F.struct(
                    i.cast("int").alias("start"),
                    F.md5(norm(F.array_join(
                        F.slice(arr, i + 1, span), "")))
                     .alias("key"))))
             .otherwise(empty)).alias("__sp")) \
        .select(id_col, F.col("__sp.start").alias("__start"),
                F.col("__sp.key").alias("__key")) \
        .localCheckpoint(eager=True)
    firsts = spans.groupBy("__key").agg(
        F.min(F.struct(F.col(id_col), F.col("__start"))).alias("__f"))
    dups = (spans.join(firsts, "__key")
            .where((F.col(id_col) != F.col(f"__f.{id_col}"))
                   | (F.col("__start") != F.col("__f.__start"))))
    removal = dups.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("__start"),
                             F.col("__start") + (span - 1))).alias("__sidx"))
    rm = removal.groupBy(id_col).agg(
        F.collect_set("__sidx").alias("__rm"))
    kept = F.filter(arr, lambda x, i: ~F.array_contains(
        F.coalesce(F.col("__rm"),
                   F.array().cast("array<int>")), i.cast("int")))
    return df.join(rm, id_col, "left").select(
        F.col(id_col), F.array_join(kept, "").alias(col))


def near_dedup_select(df: DataFrame, pairs: DataFrame, id_col: str,
                      checkpoint_dir: str | None = None) -> DataFrame:
    """Turn a near-dup detector's output into the deduplicated corpus —
    the composition every pipeline runs after candidate generation.
    Accepts BOTH output shapes of the dedup family:

    - a PAIR table ``(id_a, id_b, ...)`` (:func:`simhash_dedup`,
      :func:`embedding_dedup`, :func:`ngram_jaccard_pairs`, or
      :func:`semdedup` edges): connected components are computed here
      and the smallest id of each component survives;
    - a DROP table ``(<id_col>, dup_of)`` (:func:`minhash_dedup`,
      which has already closed its components): its ids are dropped
      directly.

    Returns ``df`` filtered to survivors (rows pairing with nothing all
    survive), original columns unchanged.

    Scale shape: components run over the pair table only. The drop set
    is anti-joined against the corpus: while it fits the broadcast
    threshold (the common case — only duplicates' ids) the corpus does
    not shuffle; for heavily duplicated corpora the anti-join becomes
    an AQE-planned shuffle join, which is the unavoidable cost of a
    row-level drop at that dup rate.
    """
    cols = set(pairs.columns)
    if {"id_a", "id_b"} <= cols:
        comp = connected_components(pairs.select("id_a", "id_b"),
                                    checkpoint_dir=checkpoint_dir)
        drop = comp.where(F.col("id") != F.col("component")) \
                   .select(F.col("id").alias(id_col))
    elif "dup_of" in cols and id_col in cols:
        drop = pairs.select(id_col)
    else:
        raise ValueError(
            f"pairs must have columns (id_a, id_b) or ({id_col}, "
            f"dup_of); got {sorted(cols)}")
    return df.join(drop, id_col, "left_anti")
