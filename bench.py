"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Methodology:
- one SparkSession, tables' footers warmed by a count() pass so per-query
  timings measure compute, not first-touch JVM/IO setup;
- full plan execution via the noop sink (no driver collect bottleneck for
  row-heavy outputs);
- each query runs TWICE and reports the min: the sandbox is shared-
  tenancy and single runs swing ~2x — min-of-2 measures the engine, not
  the neighbors (rounds interleaved: all queries once, then again);
- the primary scale metric (BASELINE.md) is sketch-update throughput:
  rows/sec through the two-level HLL+KLL+CM pipeline over lineitem.

Scaling-efficiency evidence (N vs 4N cores) lives in
tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from tsv_utils_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "summarize_basic",
    "summarize_stats3",
    "summarize_quantiles",
    "summarize_mode",
    "filter_numeric",
    "filter_or_invert",
    "join_append",
    "join_bloom_anti",
    "uniq_number",
    "sample_topk_det",
    "hll_unique_count",
    "kll_quantiles",
    "cm_mode",
    "dedup_exact_docs",
    "text_profile",
    "ann_bruteforce",
]


def run_query(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus,
                      extra_conf={
                          # sf0.1 tables are single ~12MB parquet files; the
                          # 128MB default would scan each as ONE split
                          "spark.sql.files.maxPartitionBytes": str(4 << 20),
                      })

    # warm table footers + page cache
    li_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for t in ("orders", "customer", "part", "events", "documents",
              "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    from tsv_utils_spark.plans import SketchSpec, sketch_agg

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def sketch_pipeline(spark, sf_dir):
        # primary metric: sketch-update throughput, two-level plan
        return sketch_agg(li, ["l_returnflag"], [
            SketchSpec("hll", "l_partkey", "uc"),
            SketchSpec("kll", "l_extendedprice", "q",
                       {"quantiles": [0.5, 0.99]}),
            SketchSpec("cm", "l_linestatus", "m", {"finalize": "mode"}),
        ])

    # --- north-rule benchmark: sketch updates over the SOURCE-CODE
    # table (repo, path, commit, lang, content, sha) from
    # sources/codegen.py — Zipf repo skew, written once to parquet (the
    # sandbox stand-in for the Iceberg table), then one two-level
    # HLL+CM+KLL pass per run.
    from tsv_utils_spark.sources.codegen import synthesize_source_code_table

    code_rows_target = max(100_000, int(6_000_000 * sf))
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    code_path = f"/tmp/spark_graft_code_bench_{tag}"
    if not os.path.exists(os.path.join(code_path, "_SUCCESS")):
        synthesize_source_code_table(spark, code_rows_target) \
            .write.mode("overwrite").parquet(code_path)
    from pyspark.sql import functions as F

    code = spark.read.parquet(code_path) \
        .withColumn("size_chars", F.length("content").cast("double"))
    code_rows = code.count()  # warm footers + page cache

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
    names = HEADLINE + ["sketch_pipeline", "code_sketch_pipeline"]
    timings: dict[str, float] = {}
    for _round in range(2):  # interleaved min-of-2 (shared tenancy)
        for name in names:
            # construction INSIDE the window: operators with eager
            # build phases (join_bloom_anti's Bloom construction jobs)
            # are real work — excluding them understated those queries
            # through round 3 (methodology corrected round 4; the
            # affected queries' r4 numbers include ~their build time)
            t0 = time.perf_counter()
            run_query(qs[name](spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, float("inf")), dt)
    sketch_sec = timings["sketch_pipeline"]
    code_sec = timings.pop("code_sketch_pipeline")  # reported separately
    # so headline_suite_sec stays round-over-round comparable

    # merge latency: deserialize+merge 256 partials of all three sketch
    # types — the per-group cost of the final (level-2) merge stage
    merge_ms = _merge_latency_256()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "sketch_update_rows_per_sec": round(li_rows / sketch_sec),
        "stats3_rows_per_sec": round(li_rows / timings["summarize_stats3"]),
        "lineitem_rows": li_rows,
        "code_sketch_rows_per_sec": round(code_rows / code_sec),
        "code_sketch_sec": code_sec,
        "code_rows": code_rows,
        "sketch_merge_256_partials_ms": merge_ms,
        "timing_includes_construction": True,  # since round 4 — eager
        # build phases (Bloom construction) are now inside the window
    }
    print(json.dumps(out))


def _merge_latency_256() -> float:
    """Time to deserialize and merge 256 (HLL, KLL, CM) partial blobs —
    the north rule's 'merge latency' companion to update throughput."""
    import numpy as np

    from tsv_utils_spark.sketches.countmin import CountMin
    from tsv_utils_spark.sketches.hll import HyperLogLog
    from tsv_utils_spark.sketches.kll import KLL

    rng = np.random.default_rng(7)
    partials = []
    for _ in range(256):
        h = HyperLogLog(p=12)
        h.update_hashes(rng.integers(1, 2 ** 63, 4000).astype(np.uint64))
        k = KLL()
        k.update(rng.normal(size=4000))
        c = CountMin(width=1 << 13)
        c.update(rng.integers(0, 50, 4000))
        partials.append((h.serialize(), k.serialize(), c.serialize()))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        hm = HyperLogLog.deserialize(partials[0][0])
        km = KLL.deserialize(partials[0][1])
        cm = CountMin.deserialize(partials[0][2])
        for hb, kb, cb in partials[1:]:
            hm.merge(HyperLogLog.deserialize(hb))
            km.merge(KLL.deserialize(kb))
            cm.merge(CountMin.deserialize(cb))
        best = min(best, (time.perf_counter() - t0) * 1000)
    return round(best, 2)


if __name__ == "__main__":
    main()
