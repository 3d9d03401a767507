"""Vectorized 64-bit hashing for sketch updates.

The reference (eBay/tsv-utils) uses MurmurHash3-32 for its deterministic
distinct sampling and key splitting (tsv-sample/src/tsv_utils/tsv-sample.d:915-944,
tsv-split/src/tsv_utils/tsv-split.d:1008). Here we need a *vectorized*
64-bit hash usable from NumPy/pandas batches. Two paths:

- Spark-side: ``F.xxhash64(col)`` (JVM, codegen'd) — preferred: hash once in
  the scan stage, ship int64 to the Python UDAF.
- Python-side fallback: ``pandas.util.hash_array`` (SipHash-1-3 based,
  deterministic with a fixed key, vectorized in C) for object/str arrays,
  plus a splitmix64 finalizer for integer re-mixing / multi-seed hashing.

All functions return ``np.uint64`` arrays.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def canon_datetime(v):
    """Canonical naive-UTC form of a datetime-like value. The Arrow
    kernel materializes Spark timestamps as TZ-AWARE datetimes
    (as_py on timestamp[..., tz=UTC]) while the pandas/salt kernels see
    NAIVE datetime64 — the same instant must be ONE candidate key and
    ONE hash cell, whichever kernel produced it."""
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return v


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _GOLDEN
        x ^= x >> np.uint64(30)
        x *= _SPLITMIX_C1
        x ^= x >> np.uint64(27)
        x *= _SPLITMIX_C2
        x ^= x >> np.uint64(31)
    return x


def hash64(values) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of an array-like of any dtype.

    Strings/objects go through ``pd.util.hash_array`` (stable across
    processes — fixed internal key); integers get splitmix64 re-mixing so
    that sequential ids spread uniformly (required by HLL/CM/Bloom).
    """
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        return splitmix64(arr.astype(np.uint64, copy=False))
    if arr.dtype.kind == "f":
        # canonicalize -0.0 == 0.0, then hash the bit pattern
        arr = arr + 0.0
        return splitmix64(arr.view(np.uint64))
    if arr.dtype.kind == "M":  # datetime64 (timestamp columns): epoch-ns
        ns = arr.astype("datetime64[ns]").view(np.int64)
        return splitmix64(ns.astype(np.uint64, copy=False))
    if arr.dtype.kind in ("O", "U", "S"):
        if arr.dtype.kind == "O":
            # CANONICAL datetime hashing, PER ELEMENT: the update path
            # sees timestamps as datetime64 batches (kind 'M' above)
            # while candidate re-scoring sees Python date/datetime
            # objects — both must hash to the SAME epoch-ns cell or
            # heavy_hitters' re-score reads the wrong counters. Checked
            # per element (not by probing arr[0]) so a value's hash
            # never depends on what else shares the array.
            is_dt = np.fromiter(
                (isinstance(v, (datetime.date, datetime.datetime))
                 for v in arr.flat), dtype=bool, count=arr.size)
            if is_dt.any():
                out = np.empty(arr.size, dtype=np.uint64)
                # per-element ns conversion (NOT pd.to_datetime, which
                # raises on arrays mixing tz-aware and naive values —
                # the Arrow kernel yields aware datetimes for Spark
                # timestamps while the pandas kernel yields naive ones)
                ns = np.array([np.datetime64(canon_datetime(v), "ns")
                               for v in arr[is_dt]],
                              dtype="datetime64[ns]").view(np.int64)
                out[is_dt] = splitmix64(ns.astype(np.uint64, copy=False))
                rest = arr[~is_dt]
                if rest.size:
                    out[~is_dt] = pd.util.hash_array(
                        rest.astype(object), categorize=False) \
                        .astype(np.uint64, copy=False)
                return out
        h = pd.util.hash_array(arr.astype(object), categorize=False)
        return h.astype(np.uint64, copy=False)
    raise TypeError(f"unhashable dtype for sketch update: {arr.dtype}")


def hash64_with_seed(values, seed: int) -> np.ndarray:
    """Seeded variant: mix a seed into hash64 output (for CM rows, Bloom
    double-hashing, MinHash permutations)."""
    h = hash64(values)
    with np.errstate(over="ignore"):
        return splitmix64(h ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
