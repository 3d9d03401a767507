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
    # Pair on a NULL-SAFE strict lexicographic comparison of the key
    # values themselves (NULLS FIRST per column — the same total order
    # the former row_number(asc_nulls_first) ordinal encoded, so the
    # kept pair orientation is identical). A plain struct inequality
    # (keys_a < keys_b) would evaluate to NULL for a NULL group key and
    # silently drop every pair involving that group; spelling the
    # comparison out with isNull/eqNullSafe keeps NULL groups pairing
    # like any other. r6: this replaces a single-partition row_number
    # window + gid attach join — no serial point remains at any G, and
    # the pairing join still sees only the KEYS-ONLY projection (G tiny
    # rows, never the blobs).
    keys_only = blobs.select(*group_by)
    ka = keys_only.select(*[F.col(c).alias(f"{c}_a") for c in group_by])
    kb = keys_only.select(*[F.col(c).alias(f"{c}_b") for c in group_by])
    cond = F.lit(False)  # strict lex <, built innermost-column first
    for c in reversed(group_by):
        a, b = F.col(f"{c}_a"), F.col(f"{c}_b")
        lt = (a.isNull() & b.isNotNull()) | (a < b)
        cond = lt | (a.eqNullSafe(b) & cond)
    pairs = ka.join(kb, cond)  # G^2 tiny rows

    # attach blobs per side via null-safe hash EQUI-joins on the keys
    # (EqualNullSafe plans as an ordinary equi-join — blob bytes move
    # through shuffles sized by the pair count, never a blob broadcast)
    ba = blobs.select(*[F.col(c).alias(f"__ka_{c}") for c in group_by],
                      F.col(blob_col).alias("__ba"))
    bb = blobs.select(*[F.col(c).alias(f"__kb_{c}") for c in group_by],
                      F.col(blob_col).alias("__bb"))
    joined = (pairs
              .join(ba, [F.col(f"{c}_a").eqNullSafe(F.col(f"__ka_{c}"))
                         for c in group_by])
              .join(bb, [F.col(f"{c}_b").eqNullSafe(F.col(f"__kb_{c}"))
                         for c in group_by])
              .drop(*[f"__ka_{c}" for c in group_by],
                    *[f"__kb_{c}" for c in group_by]))

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
