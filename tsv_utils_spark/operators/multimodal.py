"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode kernels are STUBBED (the container ships no PIL/ffmpeg —
clearly marked below); everything Spark-side is real and tested: schemas,
Arrow batch shapes, partition-size control for fat binary rows, and the
mapInPandas operator signatures a production pipeline would keep while
swapping the kernel body.

Pattern: binary payloads ride in their own column; metadata stays in flat
typed columns so Catalyst can prune/push down without touching bytes.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),    # opaque bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes are seeded
    zlib-compressed noise, metadata consistent with kind."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = zlib.compress(rng.integers(0, 256, 512, dtype=np.uint8)
                                .tobytes())
        rows.append((i, kind, f"x-fake/{kind}", payload,
                     int(rng.integers(16, 256)) if kind != "audio" else None,
                     int(rng.integers(16, 256)) if kind != "audio" else None,
                     int(rng.integers(1000, 60000)) if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — deterministic fake decode (no PIL in this container).

    Production body:  ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``.
    The fake expands payload bytes deterministically to (h, w) uint8 —
    same payload => same pixels, so downstream tests are stable.
    """
    raw = zlib.decompress(payload)
    h = np.frombuffer(
        hashlib.sha256(raw).digest() * ((width * height) // 32 + 1),
        dtype=np.uint8)[: width * height]
    return h.reshape(height, width)


def image_features(df: DataFrame, batch_hint: int = 64) -> DataFrame:
    """Per-image feature extraction over mapInPandas.

    Output: (media_id, mean_px double, std_px double, px_sha string).
    The decode call is the stub above; the batch shape, schema, and
    partition handling are exactly what a real decoder uses.
    """
    def gen(batches):
        for pdf in batches:
            # decode is inherently per-item, but the batch iteration is
            # zip-over-ndarrays (iterrows would box every row into a
            # Series — the slowest iteration pandas offers)
            sub = pdf[(pdf["kind"] == "image") & pdf["payload"].notna()]
            ids, means, stds, shas = [], [], [], []
            for mid, payload, w, h in zip(sub["media_id"].to_numpy(),
                                          sub["payload"].to_numpy(),
                                          sub["width"].to_numpy(),
                                          sub["height"].to_numpy()):
                px = _decode_image_stub(bytes(payload), int(w), int(h))
                ids.append(mid)
                means.append(float(px.mean()))
                stds.append(float(px.std()))
                shas.append(hashlib.sha256(px.tobytes()).hexdigest())
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "mean_px": means, "std_px": stds,
                                "px_sha": shas})

    # fat binary rows: keep Arrow batches small so a batch of payloads
    # stays << executor memory (spark.sql.execution.arrow.maxRecordsPerBatch
    # governs this globally; we also repartition by size at call sites)
    return df.select("media_id", "kind", "payload", "width", "height") \
             .mapInPandas(gen, schema="media_id long, mean_px double, "
                                      "std_px double, px_sha string")


def resize_images(df: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Resize via nearest-neighbor on the stub-decoded pixels; emits new
    payload bytes. Shows the binary-in/binary-out operator shape."""
    def gen(batches):
        for pdf in batches:
            sub = pdf[(pdf["kind"] == "image") & pdf["payload"].notna()]
            out = {"media_id": [], "payload": []}
            for mid, payload, w, h in zip(sub["media_id"].to_numpy(),
                                          sub["payload"].to_numpy(),
                                          sub["width"].to_numpy(),
                                          sub["height"].to_numpy()):
                px = _decode_image_stub(bytes(payload), int(w), int(h))
                yi = (np.linspace(0, px.shape[0] - 1, out_h)).astype(int)
                xi = (np.linspace(0, px.shape[1] - 1, out_w)).astype(int)
                small = px[np.ix_(yi, xi)]
                out["media_id"].append(mid)
                out["payload"].append(zlib.compress(small.tobytes()))
            yield pd.DataFrame({"media_id": pd.Series(out["media_id"],
                                                      dtype="int64"),
                                "payload": out["payload"]})

    return df.select("media_id", "kind", "payload", "width", "height") \
             .mapInPandas(gen, schema="media_id long, payload binary")


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one output row per sampled timestamp.

    Decode is stubbed (NotImplemented marker in payload position would be a
    real frame); timestamps/fan-out logic is real: explode on a JVM-side
    sequence — no Python until the decode kernel itself.
    """
    vids = df.where(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return vids.select("media_id", F.explode(ts).alias("frame_ms"))
