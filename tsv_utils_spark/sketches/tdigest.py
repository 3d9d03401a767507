"""Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests") — mergeable quantile sketch with relative
accuracy concentrated at the tails.

Fully vectorized batch merge: incoming sorted points + existing centroids
are assigned to clusters by bucketing their cumulative quantile through the
k1 scale function

    k(q) = delta / (2*pi) * asin(2q - 1)

(cluster boundary wherever floor(k) changes), then reduced with
``np.add.reduceat`` — no per-point Python loop.

Error model: rank error for quantile q is bounded by the cluster width,
~ ``q(1-q) * 4 / delta`` per the t-digest paper's k1 analysis; tests use
``rank_error(q)`` with a safety factor.

Exactness contract for small data: while total weight <= ``delta`` each
point is its own centroid (k1 buckets can't force a merge below ~delta/2
points, and we additionally skip compression when n <= delta), so
``quantile`` interpolates the raw data with the R-7 rule — matching the
reference (numerics.d:632) on small groups exactly.
"""

from __future__ import annotations

import struct

import numpy as np


class TDigest:
    __slots__ = ("delta", "means", "weights", "n", "_min", "_max")

    def __init__(self, delta: int = 200):
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self._min = np.inf
        self._max = -np.inf

    # -- update / merge -------------------------------------------------
    def update(self, values) -> None:
        arr = np.asarray(values, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        if arr.size == 0:
            return
        self._absorb(arr, np.ones(arr.size, dtype=np.float64))

    def merge(self, other: "TDigest") -> "TDigest":
        if other.n > 0:
            self._absorb(other.means, other.weights)
            self._min = min(self._min, other._min)
            self._max = max(self._max, other._max)
        return self

    def _absorb(self, means: np.ndarray, weights: np.ndarray) -> None:
        m = np.concatenate([self.means, means])
        w = np.concatenate([self.weights, weights])
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        self.n = float(total)
        self._min = min(self._min, float(m[0]))
        self._max = max(self._max, float(m[-1]))
        if m.size <= self.delta:
            # keep points exact while small — see module docstring
            self.means, self.weights = m, w
            return
        # cumulative quantile of each point's midpoint
        cw = np.cumsum(w)
        q_mid = (cw - w / 2.0) / total
        # k1 scale function; cluster id = floor(k)
        k = (self.delta / (2.0 * np.pi)) * np.arcsin(np.clip(2.0 * q_mid - 1.0, -1, 1))
        cluster = np.floor(k).astype(np.int64)
        # reduce each cluster to (weighted mean, weight)
        boundaries = np.flatnonzero(np.diff(cluster)) + 1
        starts = np.concatenate([[0], boundaries])
        wsum = np.add.reduceat(w, starts)
        msum = np.add.reduceat(m * w, starts)
        self.means = msum / wsum
        self.weights = wsum

    # -- query ----------------------------------------------------------
    @property
    def is_exact(self) -> bool:
        return bool(self.n > 0 and np.all(self.weights == 1.0))

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        if self.is_exact:
            return float(np.quantile(self.means, q, method="linear"))
        m, w = self.means, self.weights
        if m.size == 1:
            return float(m[0])
        cw = np.cumsum(w) - w / 2.0
        target = q * self.n
        if target <= cw[0]:
            # interpolate between min and first centroid
            t = target / cw[0] if cw[0] > 0 else 0.0
            return float(self._min + t * (m[0] - self._min))
        if target >= cw[-1]:
            span = self.n - cw[-1]
            t = (target - cw[-1]) / span if span > 0 else 0.0
            return float(m[-1] + t * (self._max - m[-1]))
        idx = int(np.searchsorted(cw, target, side="right"))
        t = (target - cw[idx - 1]) / (cw[idx] - cw[idx - 1])
        return float(m[idx - 1] + t * (m[idx] - m[idx - 1]))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank_error(self, q: float = 0.5) -> float:
        """Typical normalized rank-error width at quantile q.

        Half the k1 cluster rank width: the k1 scale has
        k'(q) = delta / (2*pi*sqrt(q(1-q))), so one cluster spans
        2*pi*sqrt(q(1-q))/delta of rank space and midpoint interpolation
        errs by at most about half of that. (The earlier q(1-q)/delta
        form understates the width at extreme tails, where sqrt(q(1-q))
        >> q(1-q).) Floored at 2/n resolution."""
        if self.is_exact:
            return 0.0
        w = np.pi * np.sqrt(q * (1.0 - q)) / self.delta
        return max(float(w), 2.0 / self.n if self.n else 0.0)

    # -- serialization --------------------------------------------------
    def serialize(self) -> bytes:
        head = struct.pack("<IdddI", self.delta, self.n, self._min, self._max,
                           self.means.size)
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "TDigest":
        delta, n, mn, mx, size = struct.unpack_from("<IdddI", blob)
        off = struct.calcsize("<IdddI")
        out = cls(delta=delta)
        out.n = n
        out._min = mn
        out._max = mx
        out.means = np.frombuffer(blob, dtype=np.float64, count=size, offset=off).copy()
        off += 8 * size
        out.weights = np.frombuffer(blob, dtype=np.float64, count=size, offset=off).copy()
        return out
