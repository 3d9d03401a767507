"""spark-submit entry point for the flagship north-rule pipeline.

    spark-submit --py-files /tmp/tsv_utils_spark-<ver>-<contenthash>.zip \
        tools/run_pipeline.py \
        [--rows 8000000] [--checkpoint /tmp/ckpt] [--epochs 8]

(Local runs can just `python tools/run_pipeline.py` — the session factory
ships the package zip itself.)

Pipeline: deterministic source-code table (Pareto-skewed repos) ->
checkpointed two-level sketch aggregation per repo (HLL distinct paths,
KLL content-size quantiles, count-min top language) -> estimates parquet +
per-epoch metrics. Kill it mid-run and rerun: completed epochs are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsv_utils_spark.plans import SketchSpec  # noqa: E402
from tsv_utils_spark.plans.checkpoint import (  # noqa: E402
    read_metrics,
    sketch_agg_checkpointed,
)
from tsv_utils_spark.session import get_spark  # noqa: E402
from tsv_utils_spark.sources import synthesize_source_code_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--checkpoint", default="/tmp/tsv_spark_pipeline_ckpt")
    ap.add_argument("--out", default="/tmp/tsv_spark_pipeline_out")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--src", default="",
                    help="parquet dir for the source table; when set, the "
                         "table is materialized there once and epochs are "
                         "FILE slices (single total scan — the 100 TB "
                         "shape). Default: in-memory synthesis, hash-slice "
                         "fallback (re-generates per epoch).")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    spark = get_spark("pipeline", cores=args.cores,
                      shuffle_partitions=args.cores)

    specs = [
        SketchSpec("hll", "path", "distinct_paths"),
        SketchSpec("kll", "content_len", "len",
                   {"quantiles": [0.5, 0.95, 0.99]}),
        SketchSpec("cm", "lang", "top_lang", {"finalize": "mode"}),
    ]
    from pyspark.sql import functions as F

    def project(d):
        return d.select("repo", "path", "lang",
                        F.length("content").alias("content_len"))

    t0 = time.perf_counter()
    if args.src:
        if not os.path.exists(os.path.join(args.src, "_SUCCESS")):
            synthesize_source_code_table(spark, args.rows) \
                .write.mode("overwrite").parquet(args.src)
        df = spark.read.parquet(args.src)
        result = sketch_agg_checkpointed(df, ["repo"], specs,
                                         checkpoint_dir=args.checkpoint,
                                         epochs=args.epochs,
                                         include_rows=True,
                                         transform=project)
    else:
        work = project(synthesize_source_code_table(spark, args.rows))
        result = sketch_agg_checkpointed(work, ["repo"], specs,
                                         checkpoint_dir=args.checkpoint,
                                         epochs=args.epochs,
                                         include_rows=True)
    result.write.mode("overwrite").parquet(args.out)
    wall = time.perf_counter() - t0

    metrics = read_metrics(args.checkpoint)
    total_rows = sum(m["rows"] for m in metrics)
    print(json.dumps({
        "rows": total_rows,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(total_rows / wall) if wall else None,
        "epochs": sorted({m["epoch"] for m in metrics}),
        "out": args.out,
        "repos": spark.read.parquet(args.out).count(),
    }))


if __name__ == "__main__":
    main()
