"""Hypothesis property tests: sketch invariants under arbitrary data and
arbitrary partition splits (the generalized merge-associativity contract)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from tsv_utils_spark.sketches import KLL, BloomFilter, CountMin, HyperLogLog

floats = st.lists(
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e12, max_value=1e12),
    min_size=1, max_size=400)
int_lists = st.lists(st.integers(min_value=-2**40, max_value=2**40),
                     min_size=1, max_size=400)


def _split(data, cuts):
    idx = sorted(set(c % (len(data) + 1) for c in cuts))
    parts, prev = [], 0
    for i in idx:
        parts.append(data[prev:i])
        prev = i
    parts.append(data[prev:])
    return [p for p in parts if len(p)]


@settings(max_examples=50, deadline=None)
@given(int_lists, st.lists(st.integers(0, 10_000), max_size=4))
def test_hll_split_invariance(values, cuts):
    """Any way of splitting the stream into merged parts gives the same
    estimate as one-shot (sparse mode: exactly; both are exact here)."""
    arr = np.asarray(values)
    whole = HyperLogLog(p=12)
    whole.update(arr)
    merged = HyperLogLog(p=12)
    for part in _split(values, cuts):
        h = HyperLogLog(p=12)
        h.update(np.asarray(part))
        merged.merge(h)
    assert merged.estimate() == whole.estimate() == float(len(set(values)))


@settings(max_examples=50, deadline=None)
@given(floats, st.lists(st.integers(0, 10_000), max_size=4),
       st.floats(min_value=0.01, max_value=0.99))
def test_kll_split_rank_bound(values, cuts, q):
    merged = KLL(k=200)
    for part in _split(values, cuts):
        k = KLL(k=200)
        k.update(np.asarray(part))
        merged.merge(k)
    est = merged.quantile(q)
    s = np.sort(np.asarray(values, dtype=np.float64))
    lo = np.searchsorted(s, est, side="left") / len(s)
    hi = np.searchsorted(s, est, side="right") / len(s)
    eps = max(3 * merged.rank_error(), 1.5 / len(s))
    assert lo - eps <= q <= hi + eps


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=8), min_size=1, max_size=300),
       st.lists(st.integers(0, 10_000), max_size=4))
def test_cm_split_exact_sum(values, cuts):
    """CM merged over any split never under-counts and matches the
    one-shot table exactly (both add the same increments)."""
    whole = CountMin(depth=4, width=1 << 12)
    whole.update(np.asarray(values, dtype=object))
    merged = CountMin(depth=4, width=1 << 12)
    for part in _split(values, cuts):
        c = CountMin(depth=4, width=1 << 12)
        c.update(np.asarray(part, dtype=object))
        merged.merge(c)
    assert (merged.table == whole.table).all()
    uniq = list(set(values))
    true = {v: values.count(v) for v in uniq}
    est = merged.counts(np.asarray(uniq, dtype=object))
    assert all(e >= true[v] for v, e in zip(uniq, est))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=200),
       st.lists(st.integers(0, 10_000), max_size=4))
def test_bloom_split_no_false_negatives(values, cuts):
    merged = BloomFilter(m=1 << 14, k=5)
    for part in _split(values, cuts):
        b = BloomFilter(m=1 << 14, k=5)
        b.update(np.asarray(part, dtype=object))
        merged.merge(b)
    assert merged.contains(np.asarray(values, dtype=object)).all()
