"""Single-core stats3 throughput profile (VERDICT r1 item 8).

Answers: where does the per-core time go on the exact summarize path —
parquet scan or aggregation? Runs on local[1]:

  1. scan-only floor: count(*) over the same columns
  2. full stats3: count + sum/min/max/mean/stdev over 3 numeric columns

at sf0.1 (600k rows) and on a 24M-row synthetic extension (lineitem's 3
numeric columns tiled 40x), which amortizes fixed session/JIT overhead.

Usage: python tools/bench_stats3_core.py [--rows 24000000]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tsv_utils_spark.operators import Op, summarize  # noqa: E402
from tsv_utils_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG_PATH = "/tmp/stats3_big.parquet"


def stats3(df):
    ops = [Op.count(header="n")]
    for c in ("l_quantity", "l_extendedprice", "l_discount"):
        ops += [Op.sum(c), Op.min(c), Op.max(c), Op.mean(c), Op.stdev(c)]
    return summarize(df, None, ops)


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=24_000_000)
    args = ap.parse_args()

    spark = get_spark("stats3-core", cores=1, shuffle_partitions=1)
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(cols)
    n_small = li.count()

    if not os.path.exists(os.path.join(BIG_PATH, "_SUCCESS")):
        reps = max(1, args.rows // n_small)
        (li.withColumn("__r", F.explode(F.array(*[F.lit(i) for i in
                                                  range(reps)])))
           .drop("__r").write.mode("overwrite").parquet(BIG_PATH))
    big = spark.read.parquet(BIG_PATH)
    n_big = big.count()

    # warm the JIT/session once before timing
    stats3(li).collect()

    out = {"cores": 1, "sf_dir": SF_DIR}
    for name, df, n in (("sf0.1", li, n_small), ("24M", big, n_big)):
        scan = timed(lambda d=df: d.agg(F.count(F.lit(1)),
                                        F.sum(cols[0])).collect())
        full = timed(lambda d=df: stats3(d).collect())
        out[name] = {
            "rows": n,
            "scan_floor_sec": round(scan, 3),
            "stats3_sec": round(full, 3),
            "stats3_rows_per_sec": round(n / full),
            "scan_share_pct": round(100 * scan / full, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
