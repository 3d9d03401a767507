"""Structured Streaming over mergeable sketches.

The reference's tools are single-pass streaming programs over unbounded
stdin (tsv-sample.d:141-147 advertises memory-free streaming); its closest
Spark analogue is a Structured Streaming query whose state is the sketch
partials themselves — tiny, mergeable, and order-insensitive, which makes
them ideal streaming aggregation state (no watermark needed for the
all-time aggregate: the sketch IS the compacted history).

``streaming_sketch_agg`` runs the two-level plan incrementally via
``foreachBatch``:

  per micro-batch:  level-1 partials over the batch (mapInPandas)
  state update:     merge batch partials into the persistent per-key blob
                    table (parquet, atomic swap) — associativity makes the
                    result identical to a batch job over all data so far
  output:           finalized estimates per key written to ``out_dir``

Exactly-once: foreachBatch can replay a batch after failure; merging the
same partial twice would double-count, so the state swap carries its own
epoch marker: state for epoch N is committed by atomically renaming the
tmp dir to ``state-epoch=N`` — the marker IS the state directory name, so
there is no crash window between "state updated" and "epoch recorded"
(the standard idempotent-foreachBatch pattern, hardened).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsv_utils_spark.plans.agg import (
    SketchSpec,
    _final_schema,
    _make_blob_merge_fn,
    _make_merge_fn,
    _make_partial_fn,
    _partial_schema,
)

# streaming state compaction (merge partial rows per key back into ONE
# blob row) is the same operation as a blob-table merge — one shared
# implementation, so the committed state dirs are themselves valid
# sketch TABLES: read them as parquet and sketch_rollup() to any coarser
# key subset without replaying the stream.
_restate_fn = _make_blob_merge_fn


def make_processor(template_df: DataFrame,
                   group_by: list[str],
                   specs: list[SketchSpec],
                   state_dir: str,
                   out_dir: str,
                   max_groups_per_partition: int = 100_000,
                   state_filter=None):
    """Build the idempotent foreachBatch processor (exposed for direct
    testing of the exactly-once replay guard; ``template_df`` only
    supplies the schema). ``state_filter`` (optional Column predicate over
    the state's group columns) prunes state rows at every restate — the
    retention hook for windowed aggregation (drop windows old enough that
    no more late data is expected)."""
    spark = template_df.sparkSession
    group_by = list(group_by)
    in_cols = [spec.input_expr(i) for i, spec in enumerate(specs)]
    in_names = [f"__in_{i}" for i in range(len(specs))]
    partial_schema = _partial_schema(template_df, group_by, len(specs))
    final_schema = _final_schema(template_df, group_by, specs, True)
    os.makedirs(state_dir, exist_ok=True)

    def live_state() -> tuple[str | None, int]:
        """Newest committed state dir (``state-epoch=N`` with _SUCCESS) and
        its epoch. The directory name is the applied-epoch marker — renamed
        into place atomically WITH the state, so a crash can never leave
        'state updated but epoch unrecorded' (which would re-merge the
        replayed batch and double-count)."""
        best_path, best_epoch = None, -1
        for name in os.listdir(state_dir):
            if not name.startswith("state-epoch="):
                continue
            try:
                e = int(name.split("=", 1)[1])
            except ValueError:
                continue
            p = os.path.join(state_dir, name)
            if e > best_epoch and os.path.exists(os.path.join(p, "_SUCCESS")):
                best_path, best_epoch = p, e
        return best_path, best_epoch

    def write_estimates(state_path: str) -> None:
        est = spark.read.parquet(state_path).groupBy(*group_by).applyInPandas(
            _make_merge_fn(group_by, specs, final_schema, True),
            schema=final_schema)
        est.write.mode("overwrite").parquet(out_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        live_path, live_epoch = live_state()
        if epoch_id <= live_epoch:
            # replayed batch — state already committed; refresh the (possibly
            # stale) estimate output, which is idempotent, and skip the merge
            write_estimates(live_path)
            return
        proj = batch_df.select(*group_by, *in_cols)
        partials = proj.mapInPandas(
            _make_partial_fn(group_by, in_names, specs, partial_schema,
                             max_groups_per_partition),
            schema=partial_schema)
        if live_path is not None:
            old = spark.read.parquet(live_path)
            partials = old.unionByName(partials)
        new_state = partials.groupBy(*group_by).applyInPandas(
            _restate_fn(group_by, specs, partial_schema),
            schema=partial_schema)
        if state_filter is not None:
            new_state = new_state.where(state_filter)
        tmp = os.path.join(state_dir, f".tmp-{epoch_id}")
        new_state.write.mode("overwrite").parquet(tmp)
        committed = os.path.join(state_dir, f"state-epoch={epoch_id}")
        if os.path.exists(committed):
            shutil.rmtree(committed)
        os.rename(tmp, committed)  # atomic commit: state + epoch marker
        write_estimates(committed)
        if live_path is not None:  # prune superseded state (crash-safe)
            shutil.rmtree(live_path, ignore_errors=True)

    return process


def streaming_sketch_agg(stream_df: DataFrame,
                         group_by: list[str],
                         specs: list[SketchSpec],
                         state_dir: str,
                         out_dir: str,
                         max_groups_per_partition: int = 100_000,
                         **write_stream_kwargs):
    """Start the incremental sketch aggregation; returns the StreamingQuery.

    The caller owns the trigger/termination (e.g. ``.processAllAvailable()``
    in tests, a real trigger in production).
    """
    process = make_processor(stream_df, group_by, specs, state_dir, out_dir,
                             max_groups_per_partition)
    writer = (stream_df.writeStream
              .foreachBatch(process)
              .outputMode("update")
              .option("checkpointLocation", os.path.join(state_dir, "ckpt")))
    for k, v in write_stream_kwargs.items():
        writer = writer.option(k, v)
    return writer.start()


def streaming_windowed_sketch_agg(stream_df: DataFrame,
                                  time_col: str,
                                  group_by: list[str],
                                  specs: list[SketchSpec],
                                  state_dir: str,
                                  out_dir: str,
                                  window_duration: str = "1 hour",
                                  retention_predicate=None,
                                  **write_stream_kwargs):
    """Event-time tumbling-window sketch aggregation.

    The window start becomes an extra group key, so per-(window, keys)
    sketch blobs are the state. LATE DATA needs no watermark-drop: a late
    row merges into its window's sketch whenever it arrives, and
    associativity makes the window's estimate identical to an on-time
    run — strictly better than discarding. What a watermark normally
    bounds (state growth) is handled by ``retention_predicate``: an
    optional Column over ``window_start`` evaluated at every restate
    (e.g. ``F.col("window_start") >= F.lit(cutoff)``) that drops windows
    old enough that no more late data is expected.
    """
    derived = stream_df.withColumn(
        "window_start",
        F.window(F.col(time_col), window_duration)["start"])
    process = make_processor(derived, ["window_start", *group_by], specs,
                             state_dir, out_dir,
                             state_filter=retention_predicate)
    writer = (derived.writeStream
              .foreachBatch(process)
              .outputMode("update")
              .option("checkpointLocation", os.path.join(state_dir, "ckpt")))
    for k, v in write_stream_kwargs.items():
        writer = writer.option(k, v)
    return writer.start()


def streaming_sketch_agg_stateful(stream_df: DataFrame,
                                  group_by: list[str],
                                  specs: list[SketchSpec],
                                  checkpoint_dir: str,
                                  query_name: str = "sketch_state",
                                  output_mode: str = "update"):
    """The applyInPandasWithState variant: sketch blobs ARE the per-key
    group state, updated per micro-batch, estimates emitted in update
    mode. Uses Spark's own state store (RocksDB/HDFS-backed on a real
    cluster) instead of the parquet swap — the idiomatic Structured
    Streaming form of the two-level plan. Returns the started query
    writing to the in-memory sink ``query_name``.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    group_by = list(group_by)
    in_cols = [spec.input_expr(i) for i, spec in enumerate(specs)]
    in_names = [f"__in_{i}" for i in range(len(specs))]
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream_df.schema.fields if f.name in group_by)
    est_fields = ", ".join(
        f"{n} {t}" for spec in specs for n, t in spec.output_fields())
    output_schema = f"{key_fields}, rows long, {est_fields}"
    state_schema = "rows long, " + ", ".join(
        f"blob_{i} binary" for i in range(len(specs)))

    def update_fn(key, pdfs, state):
        if state.exists:
            stored = state.get
            rows = stored[0]
            sketches = [spec.deserialize(bytes(stored[1 + i]))
                        for i, spec in enumerate(specs)]
        else:
            rows = 0
            sketches = [spec.make() for spec in specs]
        for pdf in pdfs:
            rows += len(pdf)
            for i, spec in enumerate(specs):
                spec.update(sketches[i], pdf[in_names[i]])
        state.update((rows, *[s.serialize() for s in sketches]))
        row = {k: [v] for k, v in zip(group_by, key)}
        row["rows"] = [rows]
        for spec, s in zip(specs, sketches):
            for n, v in zip([n for n, _ in spec.output_fields()],
                            spec.finalize(s)):
                row[n] = [v]
        yield pd.DataFrame(row)

    proj = stream_df.select(*group_by, *in_cols)
    out = proj.groupBy(*group_by).applyInPandasWithState(
        update_fn, output_schema, state_schema, output_mode,
        GroupStateTimeout.NoTimeout)
    return (out.writeStream.outputMode(output_mode)
            .format("memory").queryName(query_name)
            .option("checkpointLocation", os.path.join(checkpoint_dir, "ckpt"))
            .start())
