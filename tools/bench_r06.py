"""Round-6 optimization harness: per-query noop-sink timing + plan capture.

Separate from the FROZEN bench.py (guide §1.4): times any subset of
declared queries (plus the two bench-only sketch pipelines) at a given sf
dir, min-of-N with interleaved rounds, labels jobs for the UI, and can
dump .explain("formatted") to plans/r06/<query>_<tag>.txt.

Usage:
  python tools/bench_r06.py [--sf DIR] [--n N] [--plans TAG] [q1 q2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import __spark_entry__ as entrymod  # noqa: E402
from tsv_utils_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "summarize_basic", "summarize_stats3", "summarize_quantiles",
    "summarize_mode", "filter_numeric", "filter_or_invert", "join_append",
    "join_bloom_anti", "uniq_number", "sample_topk_det", "hll_unique_count",
    "kll_quantiles", "cm_mode", "dedup_exact_docs", "text_profile",
    "ann_bruteforce", "sketch_pipeline", "code_sketch_pipeline",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3, help="interleaved rounds")
    ap.add_argument("--plans", default=None,
                    help="dump explain('formatted') to plans/r06/<q>_<TAG>.txt")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    sf_dir = args.sf
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_r06", cores=cpus, shuffle_partitions=cpus,
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": str(4 << 20),
                      })

    # warm footers + page cache (same methodology as bench.py)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li_rows = li.count()
    for t in ("orders", "customer", "part", "events", "documents",
              "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    from pyspark.sql import functions as F

    from tsv_utils_spark.plans import SketchSpec, sketch_agg

    def sketch_pipeline(spark, sf_dir):
        return sketch_agg(li, ["l_returnflag"], [
            SketchSpec("hll", "l_partkey", "uc"),
            SketchSpec("kll", "l_extendedprice", "q",
                       {"quantiles": [0.5, 0.99]}),
            SketchSpec("cm", "l_linestatus", "m", {"finalize": "mode"}),
        ])

    from tsv_utils_spark.sources.codegen import synthesize_source_code_table

    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    code_rows_target = max(100_000, int(6_000_000 * sf))
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    code_path = f"/tmp/spark_graft_code_bench_{tag}"
    if not os.path.exists(os.path.join(code_path, "_SUCCESS")):
        synthesize_source_code_table(spark, code_rows_target) \
            .write.mode("overwrite").parquet(code_path)
    code = spark.read.parquet(code_path) \
        .withColumn("size_chars", F.length("content").cast("double"))
    code.count()

    def code_sketch_pipeline(spark, sf_dir):
        return sketch_agg(code, ["lang"], [
            SketchSpec("hll", "path", "paths"),
            SketchSpec("hll", "repo", "repos"),
            SketchSpec("cm", "repo", "top_repo", {"finalize": "mode"}),
            SketchSpec("kll", "size_chars", "sz",
                       {"quantiles": [0.5, 0.99]}),
        ])

    qs = dict(entrymod.queries())
    qs["sketch_pipeline"] = sketch_pipeline
    qs["code_sketch_pipeline"] = code_sketch_pipeline

    names = args.queries or DEFAULT_QUERIES
    if args.plans:
        os.makedirs(os.path.join(_REPO, "plans", "r06"), exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            path = os.path.join(_REPO, "plans", "r06",
                                f"{name}_{args.plans}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _round in range(args.n):
        for name in names:
            spark.sparkContext.setJobDescription(f"r06:{name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            samples[name].append(dt)
            timings[name] = min(timings.get(name, float("inf")), dt)
    out = {"sf_dir": sf_dir, "cpus": cpus, "rounds": args.n,
           "lineitem_rows": li_rows,
           "total_min": round(sum(timings.values()), 3),
           "queries_min": timings, "samples": samples}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
