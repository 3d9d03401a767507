"""Embedding-column preparation operators — the vector-side prep that
feeds the similarity/ANN family (operators/similarity.py).

All pure Catalyst array expressions (JVM-side, codegen'd). Arithmetic is
spelled out so any engine replays it bit-for-bit: float32 inputs widen
to IEEE double exactly, and rounding is explicit round-half-away
(sign(x) * floor(|x| + 0.5)) rather than an engine-default `round`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l2_normalize(col: str | Column) -> Column:
    """Unit-L2 copy of a vector column; the all-zero vector maps to
    itself (no NaNs). Normalizing up front lets every downstream
    cosine become a plain dot product (one fused multiply-add chain
    instead of two norm passes per pair)."""
    v = F.col(col) if isinstance(col, str) else col
    nrm = F.sqrt(F.aggregate(
        F.transform(v, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    return F.when(nrm == 0.0, F.transform(v, lambda x: x.cast("double"))) \
        .otherwise(F.transform(v, lambda x: x.cast("double") / nrm))


def quantize_int8(col: str | Column) -> Column:
    """Symmetric per-vector int8 quantization: struct(scale, q) where
    ``scale = max|x| / 127`` and ``q[i] = round_half_away(x[i]/scale)``
    — 4x smaller than float32 at ~0.4% max component error, the
    standard memory trade for billion-vector ANN serving. The all-zero
    vector quantizes to scale 0 and all-zero codes."""
    v = F.col(col) if isinstance(col, str) else col
    mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = mx / F.lit(127.0)
    half_away = lambda x: (  # noqa: E731
        F.signum(x) * F.floor(F.abs(x) + F.lit(0.5))).cast("int")
    q = F.when(scale == 0.0,
               F.transform(v, lambda x: F.lit(0))) \
        .otherwise(F.transform(v, lambda x: half_away(
            x.cast("double") / scale)))
    return F.struct(scale.alias("scale"),
                    q.cast("array<tinyint>").alias("q"))


def dequantize_int8(col: str | Column) -> Column:
    """Inverse of :func:`quantize_int8`: ``x'[i] = q[i] * scale``
    (array<double>). ``dequantize(quantize(v))`` differs from ``v`` by
    at most ``scale/2`` per component."""
    s = F.col(col) if isinstance(col, str) else col
    return F.transform(s["q"],
                       lambda x: x.cast("double") * s["scale"])


def quantization_error(vec_col: str | Column,
                       quant_col: str | Column) -> Column:
    """Max absolute per-component reconstruction error between a vector
    and its int8 quantization — the audit column for quantized-index
    rollouts (must be <= scale/2 by construction)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    d = dequantize_int8(quant_col)
    return F.array_max(F.zip_with(
        v, d, lambda a, b: F.abs(a.cast("double") - b)))
