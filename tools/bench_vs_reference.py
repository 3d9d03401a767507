"""Per-tool throughput vs the reference's published single-thread numbers
(BASELINE.md: tsv-filter 1.28M rows/s, regex filter 1.59M, narrow select
10.4M, join+append 262k, summary stats 444k, csv2tsv 690k).

Mirrors each benchmark's SHAPE at comparable scale (7-24M rows) on this
engine. Inputs are parquet (the production format at 100 TB) except the
`numeric_filter_tsv` row, which reads TAB-separated text exactly like the
reference does — the apples-to-apples ingest comparison.

Usage: python tools/bench_vs_reference.py [--cores 1] [--repeats 2]
Prints one JSON line {bench: {rows, sec, rows_per_sec}}. Run at --cores 1
(per-core vs the single-threaded reference) and --cores 16 (whole
machine); paste results into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from tsv_utils_spark.operators import Op, join_filter, summarize, tsv_filter  # noqa: E402
from tsv_utils_spark.operators import Predicates as P  # noqa: E402
from tsv_utils_spark.session import get_spark  # noqa: E402
from tsv_utils_spark.sources import synthesize_source_code_table  # noqa: E402
from tsv_utils_spark.sources.tsv import csv_to_tsv_df, read_tsv  # noqa: E402

NUM_PATH = "/tmp/stats3_big.parquet"         # 24M x 3 numeric cols
SRC_PATH = "/tmp/scaling_src.parquet"        # 24M source-code rows
TSV_PATH = "/tmp/bench_ref_num.tsv"          # 7M-line TSV (reference shape)
CSV_PATH = "/tmp/bench_ref_csv.csv"          # 7M-line CSV for csv2tsv
CSV_ONE = "/tmp/bench_ref_csv_onefile.csv"   # same rows, ONE file: the
# case where multiLine mode cannot split and auto's pre-scan pays


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def timed(fn, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def ensure_inputs(spark) -> None:
    if not os.path.exists(os.path.join(NUM_PATH, "_SUCCESS")):
        li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet") \
            .select("l_quantity", "l_extendedprice", "l_discount")
        reps = 40
        (li.withColumn("__r", F.explode(F.array(*[F.lit(i)
                                                  for i in range(reps)])))
           .drop("__r").write.mode("overwrite").parquet(NUM_PATH))
    if not os.path.exists(os.path.join(SRC_PATH, "_SUCCESS")):
        synthesize_source_code_table(spark, 24_000_000) \
            .select("repo", "path", "lang",
                    F.length("content").alias("content_len")) \
            .write.mode("overwrite").parquet(SRC_PATH)
    if not os.path.exists(os.path.join(TSV_PATH, "_SUCCESS")):
        (spark.read.parquet(NUM_PATH).limit(7_000_000)
         .write.mode("overwrite").option("sep", "\t")
         .option("header", True).option("quote", "").csv(TSV_PATH))
    if not os.path.exists(os.path.join(CSV_PATH, "_SUCCESS")):
        # 16 files: production CSV arrives in many files, so multiLine
        # mode (unsplittable per file) still parallelizes per-file
        (spark.read.parquet(SRC_PATH).limit(7_000_000)
         .select("repo", "path", "lang", "content_len").repartition(16)
         .write.mode("overwrite").option("header", True)
         .option("quote", '"').option("escape", '"').csv(CSV_PATH))
    if not os.path.exists(os.path.join(CSV_ONE, "_SUCCESS")):
        (spark.read.option("header", True).csv(CSV_PATH).coalesce(1)
         .write.mode("overwrite").option("header", True)
         .option("quote", '"').option("escape", '"').csv(CSV_ONE))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    spark = get_spark("bench-vs-ref", cores=args.cores,
                      shuffle_partitions=max(args.cores, 1),
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes":
                              str(16 << 20),
                      })
    ensure_inputs(spark)

    num = spark.read.parquet(NUM_PATH)
    src = spark.read.parquet(SRC_PATH)
    n_num, n_src = num.count(), src.count()

    tsv_schema = T.StructType([
        T.StructField("l_quantity", T.StringType()),
        T.StructField("l_extendedprice", T.StringType()),
        T.StructField("l_discount", T.StringType()),
    ])
    tsv = read_tsv(spark, TSV_PATH, schema=tsv_schema)
    n_tsv = tsv.count()
    n_csv = spark.read.option("header", True).csv(CSV_PATH).count()

    # reference join shape: fact side joined to a filter file, appending
    # columns (tsv-join -k 1 --append-fields)
    dim = (src.groupBy("repo")
           .agg(F.count(F.lit(1)).alias("repo_files"),
                F.sum("content_len").alias("repo_bytes"),
                F.max("lang").alias("repo_top_lang")))

    benches = {
        "numeric_filter_parquet": (n_num, lambda: noop(tsv_filter(
            num, [P.num("l_quantity", "gt", 30),
                  P.num("l_extendedprice", "gt", 50_000)]))),
        "numeric_filter_tsv": (n_tsv, lambda: noop(tsv_filter(
            tsv, [P.num("l_quantity", "gt", 30),
                  P.num("l_extendedprice", "gt", 50_000)]))),
        "regex_filter": (n_src, lambda: noop(tsv_filter(
            src, [P.regex("path", r"a[0-9].*\.(py|cc)$")]))),
        "select_narrow": (n_src, lambda: noop(
            src.select("repo", "content_len"))),
        "join_append": (n_src, lambda: noop(join_filter(
            src, dim, on=["repo"], mode="append",
            append=["repo_files", "repo_bytes", "repo_top_lang"]))),
        "summary_stats": (n_num, lambda: noop(summarize(num, None, [
            Op.count(header="n")] + [
            agg for c in ("l_quantity", "l_extendedprice", "l_discount")
            for agg in (Op.sum(c), Op.min(c), Op.max(c), Op.mean(c),
                        Op.stdev(c))]))),
        "csv2tsv": (n_csv, lambda: noop(csv_to_tsv_df(spark, CSV_PATH))),
        "csv2tsv_singleline": (n_csv, lambda: noop(
            csv_to_tsv_df(spark, CSV_PATH, multiline=False))),
        "csv2tsv_auto": (n_csv, lambda: noop(
            csv_to_tsv_df(spark, CSV_PATH, multiline="auto"))),
        "csv2tsv_onefile": (n_csv, lambda: noop(
            csv_to_tsv_df(spark, CSV_ONE))),
        "csv2tsv_onefile_auto": (n_csv, lambda: noop(
            csv_to_tsv_df(spark, CSV_ONE, multiline="auto"))),
    }

    out = {"cores": args.cores}
    for name, (n, fn) in benches.items():
        fn()  # warm (JIT, footers)
        sec = timed(fn, args.repeats)
        out[name] = {"rows": n, "sec": round(sec, 3),
                     "rows_per_sec": round(n / sec)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
