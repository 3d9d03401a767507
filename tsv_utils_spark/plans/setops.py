"""Distributed pairwise set operations over theta/KMV blob tables.

``theta_pairwise`` answers "how much do every two groups' key sets
overlap?" from a ``sketch_partials`` blob table alone — no rescan of the
base data, no driver-side collect of blobs. This is the question HLL
cannot answer (HLL unions but never intersects); theta/KMV sketches
(sketches/theta.py) intersect and difference through a shared threshold.

Plan shape (the 100 TB-safe one):
  1. the PAIRING join (``keys_a < keys_b``, inherently a nested-loop
     condition) runs on a keys-only projection — G rows of bare group
     keys, never the multi-MB blobs;
  2. blobs attach to each side of the tiny pair table via two hash
     EQUI-joins, so blob bytes move through ordinary shuffles sized by
     the pair count, not through a broadcast of every blob to every
     executor;
  3. per-pair intersect/difference/union estimates are computed in
     EXECUTORS with one Arrow-batched ``mapInPandas`` over the joined
     blob pairs.

At G groups this is O(G^2) pairs — the irreducible output size of the
question itself; everything else is linear in pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def theta_pairwise(blobs: DataFrame, group_by: list[str],
                   blob_col: str = "__blob_0") -> DataFrame:
    """All-pairs set-operation estimates from a theta blob table.

    ``blobs``: one row per group — the output of
    ``sketch_partials(df, group_by, [SketchSpec('theta', ...)])`` (or
    ``sketch_rollup`` of one). ``blob_col`` names the serialized theta
    column (``__blob_i`` for spec *i*).

    Returns one row per unordered pair (keys ordered so that the tuple
    ``(*group_by)_a < (*group_by)_b``), with columns
    ``{key}_a..., {key}_b..., intersect_est, diff_ab_est, diff_ba_est,
    union_est`` (all double). Below sketch capacity k the estimates are
    EXACT counts; at capacity they carry the ~1/sqrt(k-1) RSE of the
    underlying sketch.
    """
    group_by = list(group_by)
    missing = [c for c in (*group_by, blob_col) if c not in blobs.columns]
    if missing:
        raise ValueError(f"columns {missing} not in blob table "
                         f"{blobs.columns}")
    # Pair on dense ordinal GROUP IDS, not on the key values: a struct
    # inequality (keys_a < keys_b) evaluates to NULL for a NULL group
    # key and every pair involving that group silently vanishes — a
    # NULL group is a legitimate group and must pair like any other.
    # The single-partition row_number window runs over the KEYS-ONLY
    # projection (G tiny rows, never the blobs), so it is not a scale
    # concern.
    from pyspark.sql import Window

    order = [F.col(c).asc_nulls_first() for c in group_by]
    keyed = (blobs.select(*group_by)
             .withColumn("__gid", F.row_number().over(
                 Window.orderBy(*order))))
    ka = keyed.select(*[F.col(c).alias(f"{c}_a") for c in group_by],
                      F.col("__gid").alias("__ga"))
    kb = keyed.select(*[F.col(c).alias(f"{c}_b") for c in group_by],
                      F.col("__gid").alias("__gb"))
    pairs = ka.join(kb, F.col("__ga") < F.col("__gb"))  # G^2 tiny rows

    # attach blobs by gid (int equi-join, NULL-free); the gid rides to
    # the blob row via a null-safe key join against the tiny id table
    blob_id = blobs.join(
        F.broadcast(keyed),
        [blobs[c].eqNullSafe(keyed[c]) for c in group_by]) \
        .select(keyed["__gid"], blobs[blob_col].alias("__blob"))
    joined = (pairs
              .join(blob_id.select(F.col("__gid").alias("__ga"),
                                   F.col("__blob").alias("__ba")),
                    "__ga")
              .join(blob_id.select(F.col("__gid").alias("__gb"),
                                   F.col("__blob").alias("__bb")),
                    "__gb"))

    key_fields = ([joined.schema[f"{c}_a"] for c in group_by]
                  + [joined.schema[f"{c}_b"] for c in group_by])
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["intersect_est double", "diff_ab_est double",
           "diff_ba_est double", "union_est double"])
    key_names = [f.name for f in key_fields]

    def gen(batches):
        import pandas as pd

        from tsv_utils_spark.sketches.theta import ThetaKMV

        for pdf in batches:
            if not len(pdf):
                continue
            inter, dab, dba, uni = [], [], [], []
            for ba, bb in zip(pdf["__ba"], pdf["__bb"]):
                a = ThetaKMV.deserialize(bytes(ba))
                b = ThetaKMV.deserialize(bytes(bb))
                inter.append(a.intersect_estimate(b))
                dab.append(a.difference_estimate(b))
                dba.append(b.difference_estimate(a))
                uni.append(a.union_estimate(b))
            out = {n: pdf[n] for n in key_names}
            out.update(intersect_est=inter, diff_ab_est=dab,
                       diff_ba_est=dba, union_est=uni)
            yield pd.DataFrame(out)

    return joined.mapInPandas(gen, schema=out_schema)
