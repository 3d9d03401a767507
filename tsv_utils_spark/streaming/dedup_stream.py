"""Streaming exact deduplication — tsv-uniq's keep-first semantics
(tsv-uniq.d:84-95) over an unbounded stream.

``streaming_dedup`` emits one row per key and drops every later
duplicate, across micro-batches, using Spark's own state store via
``applyInPandasWithState`` (RocksDB/HDFS-backed on a real cluster,
exactly-once with checkpointing). Per-key state is a single marker row
— the minimum possible — so state size is O(distinct keys), not
O(rows).

Which row survives: the first MICRO-BATCH containing a key always wins
(earlier trigger beats later trigger — the stream-order analogue of
the reference's input-order rule). WITHIN that batch, pass
``order_col`` to keep the minimum-order row deterministically (the
same contract as the batch twin, operators/uniq.py); without it the
survivor inside the first batch is a single arbitrary row, because a
``groupBy`` shuffle does not preserve arrival order.

Scale note: an infinite stream has unbounded distinct keys; pass
``ttl_minutes`` to age out idle keys via processing-time timeouts (the
standard bounded-state trade: a duplicate arriving after the TTL is
re-emitted; a duplicate inside the window refreshes it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def streaming_dedup(stream_df: DataFrame, key_cols: list[str],
                    checkpoint_dir: str,
                    query_name: str = "dedup_stream",
                    ttl_minutes: float | None = None,
                    order_col: str | None = None,
                    output_path: str | None = None):
    """Start a streaming query emitting only first-seen rows per key
    (append mode). With ``output_path`` the deduped rows append to a
    parquet sink (checkpoint-recoverable — the production form);
    otherwise they land in the in-memory sink ``query_name`` (memory
    sinks cannot recover from a checkpoint — tests/demos only).
    Returns the started StreamingQuery."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_cols = list(key_cols)
    ttl_ms = None
    if ttl_minutes is not None:
        ttl_ms = int(ttl_minutes * 60_000)
        if ttl_ms < 1:
            raise ValueError(
                f"ttl_minutes={ttl_minutes} is below 1ms — "
                f"setTimeoutDuration would reject it mid-stream")
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_ms is not None else GroupStateTimeout.NoTimeout)

    def update_fn(key, pdfs, state):
        if state.hasTimedOut:
            # TTL expiry: forget the key; the next duplicate re-emits
            state.remove()
            return
        if state.exists:
            # duplicate in a later batch: suppress; refresh the idle
            # window. No state.update() — rewriting an unchanged value
            # would cost a state-store put per duplicate batch, and
            # partial iterator consumption is explicitly allowed.
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        best = None
        best_v = None
        fallback = None  # first row seen: emitted when every order value
        #                  is NULL, mirroring the order_col=None path —
        #                  otherwise the key would be marked seen with
        #                  nothing emitted and its first row silently lost
        for pdf in pdfs:
            if not len(pdf):
                continue
            if order_col is None:
                best = pdf.iloc[:1]
                break  # any single row; no point scanning further
            if fallback is None:
                fallback = pdf.iloc[:1]
            sub = pdf[pdf[order_col].notna()]
            if not len(sub):
                continue
            i = sub[order_col].idxmin()
            v = sub[order_col].loc[i]
            if best is None or v < best_v:
                best, best_v = sub.loc[[i]], v
        if best is None:
            best = fallback
        if best is None:
            # no rows at all for this key: don't mark it seen
            return
        yield best
        state.update((1,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    out = stream_df.groupBy(*key_cols).applyInPandasWithState(
        update_fn, stream_df.schema, "seen int", "append", timeout)
    writer = (out.writeStream.outputMode("append")
              .option("checkpointLocation",
                      os.path.join(checkpoint_dir, "ckpt")))
    if output_path is not None:
        return (writer.format("parquet")
                .option("path", output_path)
                .queryName(query_name).start())
    return writer.format("memory").queryName(query_name).start()
