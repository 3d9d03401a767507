"""Two-level partial+final mergeable sketch aggregation.

This is the engine the whole library revolves around: PySpark has no
native partial/final protocol for pandas UDAFs, so we build the classic
two-level plan explicitly (SURVEY.md §4 "what needs custom work"):

    level 1 (partial)  — mapInArrow/mapInPandas over the scan: per input
                         partition, update one sketch set per group per
                         spec, fully vectorized (Arrow-native kernel for
                         grouped runs — see plans/arrow_kernel.py — NumPy
                         batch updates, values pre-hashed JVM-side with
                         xxhash64 where possible). Emits
                         (group keys, blob per spec) rows — the map-side
                         combine. Memory-bounded: when the per-partition
                         group map exceeds ``max_groups_per_partition``,
                         partials are flushed early (extra partial rows per
                         group are fine — merge absorbs them).
    level 2 (final)    — groupBy(keys).applyInPandas: deserialize, merge
                         (associative, any order), finalize to estimate
                         columns. Shuffles only the tiny partial rows,
                         never the raw data.

Skew: the partial level eliminates hot-key shuffle skew for aggregation by
construction (each input partition contributes at most a handful of rows
per key, however hot). For the explicit-salting variant demanded by
workloads that want applyInPandas-style partials (and to evidence the
north rule), ``mode='salt'`` adds ``salt = pmod(xxhash64(all cols), S)``
and runs level 1 as groupBy(keys+salt).applyInPandas — two shuffles, both
on bounded fan-out keys.

Both modes produce identical estimates (tests permute modes and merge
orders).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsv_utils_spark.sketches.bloom import BloomFilter
from tsv_utils_spark.sketches.countmin import CountMin
from tsv_utils_spark.sketches.hll import HyperLogLog
from tsv_utils_spark.sketches.kll import KLL
from tsv_utils_spark.sketches.tdigest import TDigest
from tsv_utils_spark.sketches.theta import ThetaKMV


@dataclass(frozen=True)
class SketchSpec:
    """One sketch aggregation over one input column.

    op: 'hll' | 'kll' | 'tdigest' | 'cm' | 'bloom' | 'theta'
    finalize (op-dependent):
      hll     -> '{out}' double estimate (+ '{out}_exactish' long rounded)
      kll     -> one double col per q in params['quantiles']
      tdigest -> same
      cm      -> params['finalize'] in {'mode','mode_count','topk_json'}
      bloom   -> '{out}_blob' binary (a queryable filter, not a scalar)
    """

    op: str
    col: str
    out: str
    params: dict = field(default_factory=dict)

    # ---- sketch construction ------------------------------------------
    def make(self):
        if self.op == "hll":
            # p=12 default for PER-GROUP sketches: 4KB dense registers,
            # 1.6% std error — the blob volume of (groups x partitions)
            # partials is the binding constraint, not single-sketch error.
            # Standalone HyperLogLog keeps p=14.
            return HyperLogLog(p=self.params.get("p", 12),
                               sparse_limit=self.params.get("sparse_limit"))
        if self.op == "kll":
            return KLL(k=self.params.get("k", 200))
        if self.op == "tdigest":
            return TDigest(delta=self.params.get("delta", 200))
        if self.op == "cm":
            # width 2^13 for PER-GROUP sketches: serialize() scans the
            # table (depth x width x 8B); at 2^16 that scan dominated the
            # partial stage (profiled ~1s/task). eps = e/8192 of the
            # group's N is ample for group-local heavy hitters.
            return CountMin(depth=self.params.get("depth", 5),
                            width=self.params.get("width", 1 << 13),
                            max_candidates=self.params.get("max_candidates", 256))
        if self.op == "bloom":
            return BloomFilter(m=self.params.get("m", 1 << 20),
                               k=self.params.get("k", 7))
        if self.op == "theta":
            # KMV theta: distinct count + set operations; exact below
            # capacity k (the oracle-exactness regime, like HLL sparse)
            return ThetaKMV(k=self.params.get("k", 4096))
        raise ValueError(f"bad sketch op {self.op!r}")

    def deserialize(self, blob: bytes):
        out = {"hll": HyperLogLog, "kll": KLL, "tdigest": TDigest,
               "cm": CountMin, "bloom": BloomFilter,
               "theta": ThetaKMV}[self.op].deserialize(blob)
        if self.op == "hll" and self.params.get("sparse_limit") is not None:
            # the blob doesn't carry the limit; restore the spec's so
            # sparse-exact unions during merge keep the requested range
            out.sparse_limit = self.params["sparse_limit"]
        return out

    # ---- input column expression (JVM-side prep) ----------------------
    def input_expr(self, idx: int):
        name = f"__in_{idx}"
        c = F.col(self.col)
        if self.op in ("hll", "theta"):
            # hash JVM-side; NULL -> sentinel 0 (dropped in update) so
            # distinct-count semantics match countDistinct. The sentinel —
            # not SQL NULL — keeps the Arrow column non-null int64: a
            # nullable long becomes float64 in pandas, which cannot hold
            # all 64-bit hash values (2^53 mantissa) and would silently
            # corrupt them. P(real hash == 0) = 2^-64: negligible.
            return F.when(c.isNotNull(), F.xxhash64(c)) \
                    .otherwise(F.lit(0)).alias(name)
        if self.op in ("kll", "tdigest"):
            return c.try_cast("double").alias(name)
        if self.op in ("cm", "bloom"):
            # typed=True keeps the NATIVE column type (date/timestamp/int)
            # through the kernel — CountMin's candidate serde carries
            # typed tags and hash64 canonicalizes datetimes to epoch-ns,
            # so e.g. mode-over-a-day-column finalizes as a real DATE
            # without a string pre-cast. Default stays the string cast.
            if self.params.get("typed"):
                return c.alias(name)
            return c.cast("string").alias(name)
        raise AssertionError(self.op)

    def update(self, sketch, series: pd.Series) -> None:
        self.update_array(sketch, series.to_numpy())

    def update_array(self, sketch, arr: np.ndarray) -> None:
        """Vectorized update from a raw numpy slice of the input column."""
        if arr.size == 0:
            return
        if self.op in ("hll", "theta"):
            if arr.dtype != np.int64:
                # guard: a float64-converted hash column would be corrupt
                arr = pd.Series(arr).dropna().to_numpy()
                if arr.dtype != np.int64:
                    raise TypeError(
                        f"hll input must be int64 hashes, got {arr.dtype}")
            h = arr.view(np.uint64)
            h = h[h != 0]  # drop the NULL sentinel (it would also
            # pollute theta's k-MINIMUM set as a fake smallest hash)
            sketch.update_hashes(h)
        elif self.op in ("kll", "tdigest"):
            vals = arr.astype(np.float64, copy=False)
            sketch.update(vals)  # update() drops NaN
        else:
            vals = pd.Series(arr).dropna().to_numpy(dtype=object)
            sketch.update(vals)

    # ---- output schema / finalize --------------------------------------
    def output_fields(self) -> list[tuple[str, str]]:
        if self.op in ("hll", "theta"):
            return [(self.out, "double")]
        if self.op in ("kll", "tdigest"):
            qs = self.params.get("quantiles", [0.5])
            if len(qs) == 1:
                return [(self.out, "double")]
            return [(f"{self.out}_q{_qname(q)}", "double") for q in qs]
        if self.op == "cm":
            fin = self.params.get("finalize", "mode")
            if fin == "mode":
                # typed mode: caller declares the finalized key type
                # (must match the input column, e.g. 'date' for a
                # to_date-derived day column)
                if self.params.get("typed"):
                    out_type = self.params.get("out_type")
                    if out_type not in _TYPE_MAP:
                        raise ValueError(
                            f"SketchSpec(cm, typed=True, finalize='mode') "
                            f"needs params['out_type'] in "
                            f"{sorted(_TYPE_MAP)}; got {out_type!r}")
                    return [(self.out, out_type)]
                return [(self.out, "string")]
            if fin == "mode_count":
                return [(self.out, "long")]
            return [(self.out, "string")]  # topk_json
        if self.op == "bloom":
            return [(f"{self.out}_blob", "binary")]
        raise AssertionError(self.op)

    def finalize(self, sketch) -> list:
        if self.op in ("hll", "theta"):
            return [float(sketch.estimate())]
        if self.op in ("kll", "tdigest"):
            qs = self.params.get("quantiles", [0.5])
            return [float(sketch.quantile(q)) for q in qs]
        if self.op == "cm":
            fin = self.params.get("finalize", "mode")
            m = sketch.mode()
            if fin == "mode":
                if self.params.get("typed"):
                    return [None if m is None else m[0]]
                return [None if m is None else str(m[0])]
            if fin == "mode_count":
                return [None if m is None else int(m[1])]
            import json
            return [json.dumps([[str(v), int(c)] for v, c in
                                sketch.heavy_hitters(self.params.get("k_top", 10))])]
        if self.op == "bloom":
            return [sketch.serialize()]
        raise AssertionError(self.op)


def _qname(q: float) -> str:
    return f"{q:g}".replace(".", "_")


# params that only affect finalize(), not the accumulated sketch STATE —
# two specs differing only in these share one sketch (updates, blob,
# shuffle bytes, merges all paid once; finalize runs per spec).
_FINALIZE_ONLY_PARAMS = frozenset({"finalize", "out_type", "k_top",
                                   "quantiles"})


def _canon_specs(specs: list[SketchSpec]) -> tuple[list[SketchSpec], list[int]]:
    """(canonical specs, map original-index -> canonical-index): specs
    with identical (op, col, state params) collapse to one accumulator —
    e.g. cm mode + mode_count over the same column (the common twin
    pattern) updates and ships ONE CountMin instead of two."""
    keymap: dict = {}
    canon: list[SketchSpec] = []
    cmap: list[int] = []
    for s in specs:
        key = (s.op, s.col, tuple(sorted(
            (k, repr(v)) for k, v in s.params.items()
            if k not in _FINALIZE_ONLY_PARAMS)))
        j = keymap.get(key)
        if j is None:
            j = len(canon)
            keymap[key] = j
            canon.append(s)
        cmap.append(j)
    return canon, cmap


# ---------------------------------------------------------------- helpers
def _key_schema_fields(df: DataFrame, group_by: list[str]) -> list[T.StructField]:
    by_name = {f.name: f for f in df.schema.fields}
    return [by_name[k] for k in group_by]


def _partial_schema(df: DataFrame, group_by: list[str], n_specs: int) -> T.StructType:
    fields = list(_key_schema_fields(df, group_by))
    fields.append(T.StructField("__rows", T.LongType()))
    for i in range(n_specs):
        fields.append(T.StructField(f"__blob_{i}", T.BinaryType()))
    return T.StructType(fields)


def _final_schema(df: DataFrame, group_by: list[str],
                  specs: list[SketchSpec], with_rows: bool) -> T.StructType:
    fields = list(_key_schema_fields(df, group_by))
    if with_rows:
        fields.append(T.StructField("rows", T.LongType()))
    for spec in specs:
        for name, typ in spec.output_fields():
            fields.append(T.StructField(name, _TYPE_MAP[typ]()))
    return T.StructType(fields)


_TYPE_MAP = {"double": T.DoubleType, "long": T.LongType,
             "string": T.StringType, "binary": T.BinaryType,
             "date": T.DateType, "timestamp": T.TimestampType,
             "int": T.IntegerType}


def _check_typed_tz(df: DataFrame, specs: list) -> None:
    """Typed cm/bloom over a session-local TIMESTAMP column requires a
    UTC session: the Arrow kernel materializes such values as
    tz-AWARE datetimes (canonicalized to naive UTC) while the
    pandas/salt kernels see naive SESSION-LOCAL datetime64 — under a
    non-UTC session the same instant would land in two candidate
    cells. TIMESTAMP_NTZ and DATE are timezone-free and always fine."""
    risky = [s.col for s in specs
             if s.op in ("cm", "bloom") and s.params.get("typed")
             and dict(df.dtypes).get(s.col) == "timestamp"]
    if not risky:
        return
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"typed sketch keys over session-local TIMESTAMP column(s) "
            f"{risky} need spark.sql.session.timeZone=UTC (got {tz!r}) "
            f"— cast to timestamp_ntz, use to_utc_timestamp, or derive "
            f"a DATE key instead")


# ------------------------------------------------------------- the engine
def sketch_agg(df: DataFrame,
               group_by: list[str],
               specs: list[SketchSpec],
               mode: str = "map",
               salt_partitions: int | str = 32,
               max_groups_per_partition: int = 100_000,
               include_rows: bool = False,
               hash_group_keys: bool | None = None) -> DataFrame:
    """All sketches for all specs computed in ONE pass over the data
    (shared scan — the distributed form of tsv-summarize's shared value
    lists, tsv-summarize.d:2038-2105), then one merge shuffle on the keys.

    ``hash_group_keys`` (default off): ship only ``xxhash64(keys)`` (one
    int64) per row instead of the key columns, recovering key VALUES from
    a JVM-side distinct broadcast-joined onto the merged result. Measured
    on this box it does NOT pay for short single-string keys (the extra
    distinct scan outweighs the saved object conversion) — reserve it for
    WIDE multi-column string keys. Collision risk ~n_groups^2 / 2^65.
    """
    group_by = list(group_by)
    _check_typed_tz(df, specs)
    if hash_group_keys is None:
        hash_group_keys = False

    canon, cmap = _canon_specs(specs)
    in_cols = [spec.input_expr(i) for i, spec in enumerate(canon)]
    in_names = [f"__in_{i}" for i in range(len(canon))]
    final_schema = _final_schema(df, group_by, specs, include_rows)

    if mode == "map" and hash_group_keys and group_by:
        gkey = F.xxhash64(*[F.col(c) for c in group_by]).alias("__gkey")
        proj = df.select(gkey, *in_cols)
        partial_schema = T.StructType(
            [T.StructField("__gkey", T.LongType()),
             T.StructField("__rows", T.LongType())]
            + [T.StructField(f"__blob_{i}", T.BinaryType())
               for i in range(len(canon))])
        hashed_final = T.StructType(
            [T.StructField("__gkey", T.LongType())]
            + [f for f in final_schema.fields if f.name not in group_by])
        partials = proj.mapInPandas(
            _make_partial_fn(["__gkey"], in_names, canon, partial_schema,
                             max_groups_per_partition),
            schema=partial_schema)
        merged = partials.groupBy("__gkey").applyInPandas(
            _make_merge_fn(["__gkey"], specs, hashed_final, include_rows,
                           canon_map=cmap),
            schema=hashed_final)
        # recover key values: distinct keys is a pure-JVM aggregate (tiny)
        names = df.select(*group_by) \
            .groupBy(*group_by).agg(F.lit(1)) \
            .select(*group_by,
                    F.xxhash64(*[F.col(c) for c in group_by]).alias("__gkey"))
        out_cols = [f.name for f in final_schema.fields]
        return merged.join(F.broadcast(names), "__gkey").select(*out_cols)

    # ---- pure distinct-sketch fast path (r6) --------------------------
    # hll/theta state is a function of the DISTINCT hash set only
    # (sparse = set union; dense registers = max rho per bucket — both
    # multiplicity- and order-invariant), so a JVM-side distinct first
    # shrinks what crosses the Arrow boundary from |rows| to |distinct|
    # (guide §2.3 "aggregate before you shuffle" — the boundary transpose
    # measured ~0.45 s per million rows per task). Size-gated: small
    # inputs keep the single-exchange plan. Multi-spec inputs dedup per
    # spec via one sub-aggregation each, joined on the group keys.
    if (mode == "map" and not include_rows
            and all(s.op in ("hll", "theta", "cm") for s in canon)):
        from tsv_utils_spark.plans.quantiles import (
            MIN_INPUT_BYTES,
            input_size_bytes,
        )

        sz = input_size_bytes(df)
        if sz is not None and sz >= MIN_INPUT_BYTES:
            if len(canon) == 1 and canon[0].op == "cm":
                # ---- weighted count-min fast path (r6) ----------------
                # CM is LINEAR in value multiplicities (table[d][h(v)] +=
                # count, n += count) and mode/heavy_hitters RE-SCORE the
                # candidate set against the merged table, so a JVM-side
                # (keys, value) -> count pre-aggregation feeding the
                # existing weighted CountMin.update produces the same
                # finalized results: identical table cells, identical
                # candidate set whenever distinct values fit
                # max_candidates (the exact-mode regime the oracled
                # queries run in). The Arrow boundary then pays
                # |distinct (key, value) pairs| rows instead of |rows|,
                # and the pre-aggregation itself is a map-side-combined
                # codegen hash agg (skew-immune). Values cross as the
                # same object-dtype arrays the unweighted kernels feed,
                # so every hash cell matches bit-for-bit.
                return _cm_weighted_fast_agg(df, group_by, specs, canon,
                                             cmap, in_cols, final_schema)
            if len(canon) == 1:
                proj = df.select(*group_by, in_cols[0]).dropDuplicates()
                partial_schema = _partial_schema(df, group_by, 1)
                from tsv_utils_spark.plans.arrow_kernel import (
                    make_arrow_partial_fn as _mk,
                )

                if 1 <= len(group_by) <= 3:
                    partials = proj.mapInArrow(
                        _mk(group_by, in_names, canon, partial_schema,
                            max_groups_per_partition),
                        schema=partial_schema)
                else:
                    partials = proj.mapInPandas(
                        _make_partial_fn(group_by, in_names, canon,
                                         partial_schema,
                                         max_groups_per_partition),
                        schema=partial_schema)
                return partials.groupBy(*group_by).applyInPandas(
                    _make_merge_fn(group_by, specs, final_schema,
                                   include_rows, canon_map=cmap),
                    schema=final_schema)
            if group_by:
                from tsv_utils_spark.functions.joins import join_null_safe

                # one sub-aggregation per CANONICAL accumulator, carrying
                # every original spec that shares it (so finalize-only
                # twins — e.g. cm mode + mode_count — finalize inside the
                # sub-call under their own output names)
                by_canon: dict[int, list[SketchSpec]] = {}
                for i, s in enumerate(specs):
                    by_canon.setdefault(cmap[i], []).append(s)
                subs = [sketch_agg(
                    df, group_by, gspecs, mode="map",
                    max_groups_per_partition=max_groups_per_partition)
                    for _, gspecs in sorted(by_canon.items())]
                out = subs[0]
                for sub in subs[1:]:
                    out = join_null_safe(out, sub, group_by)
                out_names = [name for s in specs
                             for name, _t2 in s.output_fields()]
                return out.select(*group_by, *out_names)

    # NOTE (r6): splitting cm specs out of kll/tdigest/bloom-BLOCKED
    # mixed calls (per-cm weighted pre-agg legs joined back on the
    # keys) was built and measured BOTH ways: −12% on low-cardinality
    # group keys (3-6 groups), but 2.2x SLOWER at 4 executors on a
    # high-cardinality key (Zipf repos at 24M rows: second boundary +
    # second per-group merge + a join all scale with |groups|), tanking
    # N→4N efficiency 0.84 → 0.41. Group cardinality is unknowable at
    # plan time, so blocked mixed calls keep the single shared
    # boundary; only the all-prefilterable paths above split.

    proj = df.select(*group_by, *in_cols)
    partial_schema = _partial_schema(df, group_by, len(canon))
    if mode == "map":
        from tsv_utils_spark.plans.arrow_kernel import (
            MAX_ARROW_KEYS,
            make_arrow_partial_fn,
        )

        if 1 <= len(group_by) <= MAX_ARROW_KEYS:
            # Arrow-native kernel: no per-row Python objects for keys
            # or cm/bloom value columns (plans/arrow_kernel.py)
            partials = proj.mapInArrow(
                make_arrow_partial_fn(group_by, in_names, canon,
                                      partial_schema,
                                      max_groups_per_partition),
                schema=partial_schema)
        else:
            partials = proj.mapInPandas(
                _make_partial_fn(group_by, in_names, canon, partial_schema,
                                 max_groups_per_partition),
                schema=partial_schema)
    elif mode == "salt":
        if salt_partitions == "auto":
            salt_partitions = choose_salt(df, group_by)
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in proj.columns]),
                      F.lit(salt_partitions)).alias("__salt")
        salted = proj.select("*", salt)
        partials = salted.groupBy(*group_by, "__salt").applyInPandas(
            _make_salt_partial_fn(group_by, in_names, canon, partial_schema),
            schema=partial_schema)
    else:
        raise ValueError("mode must be 'map' or 'salt'")

    merged = partials.groupBy(*group_by).applyInPandas(
        _make_merge_fn(group_by, specs, final_schema, include_rows,
                       canon_map=cmap),
        schema=final_schema)
    return merged


def _cm_weighted_fast_agg(df: DataFrame, group_by: list[str],
                          specs: list[SketchSpec], canon: list[SketchSpec],
                          cmap: list[int], in_cols: list,
                          final_schema: T.StructType) -> DataFrame:
    """Large-input count-min path: JVM (keys, value) -> count pre-agg,
    then weighted CountMin updates over the distinct pairs (see the
    dispatch comment in sketch_agg). Level-2 merge/finalize is the
    standard one, so twins sharing the accumulator finalize per spec."""
    in_name = "__in_0"
    pre = (df.select(*group_by, in_cols[0])
             .groupBy(*group_by, in_name)
             .agg(F.count(F.lit(1)).alias("__w")))
    partial_schema = _partial_schema(df, group_by, 1)
    partials = pre.mapInPandas(
        _make_weighted_cm_partial_fn(group_by, in_name, canon[0],
                                     partial_schema),
        schema=partial_schema)
    return partials.groupBy(*group_by).applyInPandas(
        _make_merge_fn(group_by, specs, final_schema, False,
                       canon_map=cmap),
        schema=final_schema)


def _make_weighted_cm_partial_fn(group_by, in_name, spec, partial_schema,
                                 max_buffered_rows: int = 4_000_000):
    """Level-1 kernel for the weighted cm fast path: input rows are
    pre-aggregated (keys..., value, __w) pairs — one weighted
    CountMin.update per group per partition. Values are converted to the
    SAME object-dtype arrays the unweighted kernels feed (hash64 is
    dtype-sensitive; the merged table's cells must line up with the
    object-dtype re-score in heavy_hitters). NULL-value pairs count into
    __rows but are dropped from the update, matching row semantics."""
    out_cols = [f.name for f in partial_schema.fields]

    def partial_fn(batches):
        vals: dict[tuple, list] = {}
        cnts: dict[tuple, list] = {}
        rows: dict[tuple, int] = {}
        buffered = 0

        def flush():
            nonlocal buffered
            items = list(vals.items())
            vals.clear()
            buffered = 0
            CHUNK = 1024
            for lo in range(0, len(items), CHUNK):
                data = {c: [] for c in out_cols}
                for key, chunks in items[lo:lo + CHUNK]:
                    vv = chunks[0] if len(chunks) == 1 \
                        else np.concatenate(chunks)
                    wc = cnts[key]
                    ww = wc[0] if len(wc) == 1 else np.concatenate(wc)
                    s = spec.make()
                    sv = pd.Series(vv)
                    keep = sv.notna().to_numpy()
                    if keep.any():
                        s.update(sv[keep].to_numpy(dtype=object),
                                 counts=ww[keep].astype(np.int64))
                    for j, k in enumerate(group_by):
                        data[k].append(key[j])
                    data["__rows"].append(rows[key])
                    data["__blob_0"].append(s.serialize())
                yield pd.DataFrame(data)
            cnts.clear()
            rows.clear()

        for pdf in batches:
            v = pdf[in_name].to_numpy()
            w = pdf["__w"].to_numpy()
            if group_by:
                idx = pdf.groupby(group_by, sort=False, dropna=False).indices
            else:
                idx = {(): np.arange(len(pdf))}
            for key, rix in idx.items():
                if not isinstance(key, tuple):
                    key = (key,)
                slot = vals.get(key)
                if slot is None:
                    vals[key] = slot = []
                    cnts[key] = []
                    rows[key] = 0
                slot.append(v[rix])
                cnts[key].append(w[rix])
                rows[key] += int(w[rix].sum())
            buffered += len(pdf)
            if buffered > max_buffered_rows:
                yield from flush()
        yield from flush()

    return partial_fn


def sketch_partials(df: DataFrame,
                    group_by: list[str],
                    specs: list[SketchSpec],
                    max_groups_per_partition: int = 100_000) -> DataFrame:
    """Like ``sketch_agg`` but STOPS at merged-per-group BLOBS:
    (keys..., __rows, __blob_0..N) with one row per group — a sketch
    TABLE. Because every sketch merge is associative, these blobs can be
    re-aggregated to any coarser key subset later with
    ``sketch_rollup`` — no rescan of the base data. This is the
    materialized-rollup pattern: compute per-(day, repo) once, answer
    per-day / per-repo / global forever after from blobs.
    """
    group_by = list(group_by)
    _check_typed_tz(df, specs)
    if not group_by:
        raise ValueError("sketch_partials needs at least one group key "
                         "(use sketch_agg for global aggregation)")
    in_cols = [spec.input_expr(i) for i, spec in enumerate(specs)]
    in_names = [f"__in_{i}" for i in range(len(specs))]
    proj = df.select(*group_by, *in_cols)
    partial_schema = _partial_schema(df, group_by, len(specs))
    from tsv_utils_spark.plans.arrow_kernel import (
        MAX_ARROW_KEYS,
        make_arrow_partial_fn,
    )

    if len(group_by) <= MAX_ARROW_KEYS:
        partials = proj.mapInArrow(
            make_arrow_partial_fn(group_by, in_names, specs,
                                  partial_schema, max_groups_per_partition),
            schema=partial_schema)
    else:
        partials = proj.mapInPandas(
            _make_partial_fn(group_by, in_names, specs, partial_schema,
                             max_groups_per_partition),
            schema=partial_schema)
    return partials.groupBy(*group_by).applyInPandas(
        _make_blob_merge_fn(group_by, specs, partial_schema),
        schema=partial_schema)


def sketch_rollup(blobs: DataFrame,
                  group_by: list[str],
                  specs: list[SketchSpec],
                  include_rows: bool = False,
                  finalize: bool = True) -> DataFrame:
    """Re-aggregate a ``sketch_partials`` blob table to a COARSER key
    subset and finalize (or keep blobs with ``finalize=False`` for a
    further rollup level). Only blob rows shuffle — the base data is
    never touched. Associativity (pytest-permuted) makes the answer
    identical to a direct ``sketch_agg`` at the coarser keys, up to the
    sketch's own error bound (exact in the HLL-sparse / CM-low-collision
    regimes the oracled queries run in).
    """
    group_by = list(group_by)
    missing = [k for k in group_by if k not in blobs.columns]
    if missing:
        raise ValueError(f"rollup keys {missing} not in blob table "
                         f"columns {blobs.columns}")
    if not finalize:
        schema = T.StructType(
            [blobs.schema[k] for k in group_by]
            + [T.StructField("__rows", T.LongType())]
            + [T.StructField(f"__blob_{i}", T.BinaryType())
               for i in range(len(specs))])
        return blobs.groupBy(*group_by).applyInPandas(
            _make_blob_merge_fn(group_by, specs, schema), schema=schema)
    final_schema = T.StructType(
        [blobs.schema[k] for k in group_by]
        + ([T.StructField("rows", T.LongType())] if include_rows else [])
        + [T.StructField(name, _TYPE_MAP[typ]())
           for spec in specs for name, typ in spec.output_fields()])
    return blobs.groupBy(*group_by).applyInPandas(
        _make_merge_fn(group_by, specs, final_schema, include_rows),
        schema=final_schema)


def _make_blob_merge_fn(group_by, specs, out_schema):
    """Merge a group's partial blobs into ONE blob row per spec (the
    blob-table form of _make_merge_fn)."""
    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        row = {k: [pdf[k].iloc[0]] for k in group_by}
        row["__rows"] = [int(pdf["__rows"].sum())]
        for i, spec in enumerate(specs):
            blobs_i = pdf[f"__blob_{i}"]
            s = spec.deserialize(bytes(blobs_i.iloc[0]))
            for b in blobs_i.iloc[1:]:
                s.merge(spec.deserialize(bytes(b)))
            row[f"__blob_{i}"] = [s.serialize()]
        return pd.DataFrame(row)

    return merge_fn


def _make_partial_fn(group_by, in_names, specs, partial_schema, max_groups,
                     lineage_epoch: int | None = None,
                     max_buffered_rows: int = 4_000_000):
    """Level-1 kernel. High-cardinality-friendly: per batch we only
    ACCUMULATE raw value slices per group (cheap dict appends over
    groupby().indices); sketches are built ONCE per group at flush with a
    single vectorized update — O(groups) sketch constructions per
    partition instead of O(groups x batches).

    With ``lineage_epoch`` set, partial rows carry (epoch, partition_id)
    lineage columns (the checkpointed plan's schema).
    """
    out_cols = [f.name for f in partial_schema.fields]

    def partial_fn(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        buf: dict[tuple, list] = {}     # key -> [list of np arrays per spec]
        rows: dict[tuple, int] = {}
        buffered = 0

        FLUSH_CHUNK = 1024  # groups per emitted frame: keeps any single
        #                     Arrow binary column far below the 2GB limit

        def flush():
            nonlocal buffered
            items = list(buf.items())
            buf.clear()
            buffered = 0
            for lo in range(0, len(items), FLUSH_CHUNK):
                data = {c: [] for c in out_cols}
                for key, per_spec in items[lo:lo + FLUSH_CHUNK]:
                    if lineage_epoch is not None:
                        data["epoch"].append(lineage_epoch)
                        data["partition_id"].append(pid)
                    for j, k in enumerate(group_by):
                        data[k].append(key[j])
                    data["__rows"].append(rows[key])
                    for i, spec in enumerate(specs):
                        s = spec.make()
                        chunks = per_spec[i]
                        if chunks:
                            spec.update_array(
                                s, chunks[0] if len(chunks) == 1
                                else np.concatenate(chunks))
                        data[f"__blob_{i}"].append(s.serialize())
                yield pd.DataFrame(data)
            rows.clear()

        for pdf in batches:
            cols = [pdf[n].to_numpy() for n in in_names]
            if len(group_by):
                idx = pdf.groupby(group_by, sort=False,
                                  dropna=False).indices
            else:
                idx = {(): np.arange(len(pdf))}
            for key, rix in idx.items():
                if not isinstance(key, tuple):
                    key = (key,)
                slot = buf.get(key)
                if slot is None:
                    slot = [[] for _ in specs]
                    buf[key] = slot
                    rows[key] = 0
                rows[key] += len(rix)
                for i in range(len(specs)):
                    slot[i].append(cols[i][rix])
            buffered += len(pdf)
            if len(buf) > max_groups or buffered > max_buffered_rows:
                yield from flush()
        yield from flush()

    return partial_fn


def choose_salt(df: DataFrame, group_by: list[str],
                sample_fraction: float = 0.002, seed: int = 7,
                headroom: float = 2.0) -> int:
    """Pick the salt fan-out S from a frequency pre-pass (SURVEY §7: "S
    chosen from a count sketch of key frequencies").

    A row-level Bernoulli sample of the KEY COLUMNS only (pure-JVM scan,
    map-side-combined count — itself skew-immune) estimates the hottest
    key's share p of all rows. That key occupies ~p of the shuffle, so it
    needs ~p * shuffle_partitions reducers to be no worse than fair;
    ``headroom`` doubles that. Uniform data yields S=1 (salting off — no
    point paying the extra shuffle)."""
    spark = df.sparkSession
    sp = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    samp = (df.select(*group_by)
              .where(F.rand(seed) < sample_fraction)
              .groupBy(*group_by).count()
              .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
              .first())
    if not samp or not samp["tot"]:
        return 1
    share = samp["mx"] / samp["tot"]
    import math

    return max(1, min(sp, math.ceil(share * sp * headroom)))


def _make_salt_partial_fn(group_by, in_names, specs, partial_schema):
    def salt_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        sketches = [spec.make() for spec in specs]
        for i, spec in enumerate(specs):
            spec.update(sketches[i], pdf[in_names[i]])
        row = {k: [pdf[k].iloc[0]] for k in group_by}
        row["__rows"] = [len(pdf)]
        for i, s in enumerate(sketches):
            row[f"__blob_{i}"] = [s.serialize()]
        return pd.DataFrame(row)

    return salt_fn


def _make_merge_fn(group_by, specs, final_schema, include_rows,
                   canon_map=None):
    """Level-2 merge+finalize. With ``canon_map`` (from _canon_specs),
    partial rows carry one blob per CANONICAL spec; each is deserialized
    and merged once, and state-sharing specs finalize from the shared
    merged sketch (finalizers are read-only)."""
    cmap = canon_map if canon_map is not None else list(range(len(specs)))
    n_blobs = (max(cmap) + 1) if cmap else 0
    rep = {}
    for i, j in enumerate(cmap):
        rep.setdefault(j, specs[i])

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = []
        for j in range(n_blobs):
            spec = rep[j]
            blobs = pdf[f"__blob_{j}"]
            s = spec.deserialize(bytes(blobs.iloc[0]))
            for b in blobs.iloc[1:]:
                s.merge(spec.deserialize(bytes(b)))
            merged.append(s)
        row = {k: [pdf[k].iloc[0]] for k in group_by}
        if include_rows:
            row["rows"] = [int(pdf["__rows"].sum())]
        for i, spec in enumerate(specs):
            names = [n for n, _ in spec.output_fields()]
            vals = spec.finalize(merged[cmap[i]])
            for n, v in zip(names, vals):
                row[n] = [v]
        return pd.DataFrame(row)

    return merge_fn
