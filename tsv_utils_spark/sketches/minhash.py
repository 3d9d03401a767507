"""MinHash signatures + LSH banding for near-duplicate detection.

Used by ``tsv_utils_spark.operators.dedup.minhash_dedup`` — the scale path
for near-dup detection over document/content corpora (a training-data
pipeline op beyond the reference's exact ``tsv-uniq``).

- Signature: k permutations approximated by seeded re-mix of one 64-bit
  shingle hash (h_i(x) = splitmix64(h(x) ^ seed_i)), taking min per
  permutation. E[matching fraction] = Jaccard(setA, setB).
- LSH: split the k signature slots into b bands of r rows; two docs
  collide if any band hashes equal. P(collide) = 1 - (1 - s^r)^b for
  Jaccard s — the standard S-curve.

All batch operations are vectorized; ``signature_matrix`` computes
signatures for a whole pandas batch of token lists at once.
"""

from __future__ import annotations

import numpy as np

from tsv_utils_spark.sketches.hashing import hash64, splitmix64

_SEED_BASE = np.uint64(0x8E8B_6B4B_1FA1_77D3)


def _perm_seeds(k: int) -> np.ndarray:
    return splitmix64(np.arange(1, k + 1, dtype=np.uint64) * _SEED_BASE)


def shingles(tokens: list[str], n: int = 3) -> np.ndarray:
    """Word n-gram shingle hashes for one document (uint64)."""
    if len(tokens) < n:
        joined = [" ".join(tokens)] if tokens else []
        return hash64(np.asarray(joined, dtype=object)) if joined else np.empty(0, np.uint64)
    grams = [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]
    return hash64(np.asarray(grams, dtype=object))


def signature(shingle_hashes: np.ndarray, k: int = 128) -> np.ndarray:
    """MinHash signature (k,) uint64 for one shingle-hash set."""
    if shingle_hashes.size == 0:
        return np.full(k, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    seeds = _perm_seeds(k)
    with np.errstate(over="ignore"):
        # (k, n) re-mixed hashes -> min over n
        mixed = splitmix64(shingle_hashes[None, :] ^ seeds[:, None])
    return mixed.min(axis=1)


def signature_matrix(token_lists: list[list[str]], k: int = 128, n: int = 3) -> np.ndarray:
    """Signatures for a batch of documents: (num_docs, k) uint64."""
    out = np.empty((len(token_lists), k), dtype=np.uint64)
    for i, toks in enumerate(token_lists):
        out[i] = signature(shingles(toks, n=n), k=k)
    return out


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """LSH band bucket keys for one signature: (bands,) uint64.

    Two documents are LSH candidates iff they share >=1 band key.
    """
    k = sig.shape[-1]
    r = k // bands
    trimmed = sig[..., : bands * r].reshape(*sig.shape[:-1], bands, r)
    # hash each band by mixing its rows together
    acc = np.zeros(trimmed.shape[:-1], dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(r):
            acc = splitmix64(acc ^ trimmed[..., j])
    return acc


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def jaccard_exact(tokens_a: list[str], tokens_b: list[str], n: int = 3) -> float:
    """Exact n-gram Jaccard (the verification pass after LSH candidates)."""
    a = set(shingles(tokens_a, n=n).tolist())
    b = set(shingles(tokens_b, n=n).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


class MinHash:
    """Object wrapper matching the common sketch lifecycle (update/merge/
    serialize) — a *set* MinHash: update() absorbs more elements of one set.
    """

    __slots__ = ("k", "sig")

    def __init__(self, k: int = 128):
        self.k = k
        self.sig = np.full(k, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)

    def update(self, values) -> None:
        arr = np.asarray(values)
        if arr.size == 0:
            return
        h = hash64(arr)
        np.minimum(self.sig, signature(h, k=self.k), out=self.sig)

    def merge(self, other: "MinHash") -> "MinHash":
        np.minimum(self.sig, other.sig, out=self.sig)
        return self

    def jaccard(self, other: "MinHash") -> float:
        return estimate_jaccard(self.sig, other.sig)

    def serialize(self) -> bytes:
        return self.sig.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "MinHash":
        sig = np.frombuffer(blob, dtype=np.uint64).copy()
        out = cls(k=sig.size)
        out.sig = sig
        return out
