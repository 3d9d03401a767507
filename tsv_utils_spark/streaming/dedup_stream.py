"""Streaming exact deduplication — tsv-uniq's keep-first semantics
(tsv-uniq.d:84-95) over an unbounded stream.

``streaming_dedup`` emits each key's FIRST arriving row and drops every
later duplicate, across micro-batches, using Spark's own state store
via ``applyInPandasWithState`` (RocksDB/HDFS-backed on a real cluster,
exactly-once with checkpointing). Per-key state is a single marker row
— the minimum possible — so state size is O(distinct keys), not
O(rows).

Scale note: an infinite stream has unbounded distinct keys; pass
``ttl_minutes`` to age out keys via processing-time timeouts (the
standard bounded-state trade: a duplicate arriving after the TTL is
re-emitted). This is the streaming twin of ``operators/uniq.py``'s
batch keep-first and ``operators/dedup.exact_dedup``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def streaming_dedup(stream_df: DataFrame, key_cols: list[str],
                    checkpoint_dir: str,
                    query_name: str = "dedup_stream",
                    ttl_minutes: float | None = None,
                    output_path: str | None = None):
    """Start a streaming query emitting only first-seen rows per key
    (append mode). With ``output_path`` the deduped rows append to a
    parquet sink (checkpoint-recoverable — the production form);
    otherwise they land in the in-memory sink ``query_name`` (memory
    sinks cannot recover from a checkpoint — tests/demos only).
    Returns the started StreamingQuery.

    Within one micro-batch the FIRST row in batch order wins (the
    reference's input-order rule, which a stream's arrival order
    stands in for)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    key_cols = list(key_cols)
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in stream_df.schema.fields)
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_minutes is not None
               else GroupStateTimeout.NoTimeout)

    def update_fn(key, pdfs, state):
        if state.hasTimedOut:
            # TTL expiry: forget the key; the next duplicate re-emits
            state.remove()
            return
        seen = state.exists
        if not seen:
            for pdf in pdfs:
                if len(pdf):
                    yield pdf.iloc[:1]
                    break
            state.update((1,))
        else:
            # drain the iterator (contract of applyInPandasWithState)
            for _ in pdfs:
                pass
            state.update((1,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(int(ttl_minutes * 60_000))

    out = stream_df.groupBy(*key_cols).applyInPandasWithState(
        update_fn, out_schema, "seen int", "append", timeout)
    writer = (out.writeStream.outputMode("append")
              .option("checkpointLocation",
                      os.path.join(checkpoint_dir, "ckpt")))
    if output_path is not None:
        return (writer.format("parquet")
                .option("path", output_path)
                .queryName(query_name).start())
    return writer.format("memory").queryName(query_name).start()
