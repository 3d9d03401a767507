"""Pure-NumPy mergeable sketches.

Each sketch implements the same lifecycle:

    s = Sketch(**params)
    s.update(np_array)          # vectorized batch update (no per-row Python)
    s.merge(other)              # associative merge (estimates invariant
                                #   within the sketch's error bound under
                                #   any merge order)
    blob = s.serialize()        # bytes — the Spark partial-aggregate state
    s2 = Sketch.deserialize(blob)
    s.estimate(...)             # finalize

These are the UDAF kernels used by tsv_utils_spark.plans.agg; they are
Spark-independent and unit-tested standalone (tests/test_sketches.py).
"""

from tsv_utils_spark.sketches.hashing import hash64, hash64_with_seed
from tsv_utils_spark.sketches.hll import HyperLogLog
from tsv_utils_spark.sketches.kll import KLL
from tsv_utils_spark.sketches.tdigest import TDigest
from tsv_utils_spark.sketches.countmin import CountMin
from tsv_utils_spark.sketches.bloom import BloomFilter
from tsv_utils_spark.sketches.minhash import MinHash
from tsv_utils_spark.sketches.simhash import simhash64
from tsv_utils_spark.sketches.theta import ThetaKMV

__all__ = [
    "hash64",
    "hash64_with_seed",
    "HyperLogLog",
    "KLL",
    "TDigest",
    "CountMin",
    "BloomFilter",
    "MinHash",
    "simhash64",
    "ThetaKMV",
]
