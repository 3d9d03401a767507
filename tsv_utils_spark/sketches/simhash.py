"""SimHash (Charikar 2002) — 64-bit similarity fingerprints.

Near-duplicate documents have small Hamming distance between their
SimHashes. Used by ``operators.dedup.simhash_dedup``.

Vectorized: token hashes are unpacked to a (n_tokens, 64) sign matrix and
summed; the fingerprint is the sign vector re-packed to one uint64.
"""

from __future__ import annotations

import numpy as np

from tsv_utils_spark.sketches.hashing import hash64

_BITS = np.uint64(np.arange(64, dtype=np.uint64))  # bit index per column


def simhash64(tokens: list[str], weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of a token list (optionally weighted). Accepts any
    sequence of strings (list or ndarray — Arrow hands back ndarrays)."""
    if len(tokens) == 0:
        return 0
    h = hash64(np.asarray(tokens, dtype=object))
    # (n, 64) bit matrix -> +1/-1
    bits = ((h[:, None] >> _BITS[None, :]) & np.uint64(1)).astype(np.int64)
    signs = 2 * bits - 1
    if weights is not None:
        signs = signs * np.asarray(weights, dtype=np.int64)[:, None]
    v = signs.sum(axis=0)
    out = np.uint64(0)
    fp = ((v > 0).astype(np.uint64) << _BITS).sum(dtype=np.uint64)
    return int(fp | out)


def simhash_batch(token_lists: list[list[str]]) -> np.ndarray:
    """SimHashes for a batch of documents -> (n,) uint64."""
    return np.asarray([simhash64(t) for t in token_lists], dtype=np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
