"""N vs 4N executor scaling for the web-dedup family (span dedup) on the
localhost standalone cluster — same harness shape as bench_scaling.py.

The 2M-doc source is synthesized by /tmp-resident bench tooling during a
round (see NOTES.md: documents tiled 400x with planted hot spans); this
script measures dedup_sentence_spans_global at 1x2 vs 4x2 executor cores,
interleaved rounds, min-of-2 per level. Results recorded in
BENCH/BASELINE.md ("Round 5 (late)" section).

Usage:  python tools/bench_scaling_web.py            # orchestrate both levels
        python tools/bench_scaling_web.py --level K  # one level, K executors
"""
import sys, time, subprocess
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")  # noqa: E402
from bench_scaling import ensure_cluster, MASTER, EXEC_CORES

SRC = "/tmp/web_bench_src"

def run_level(executors):
    out = subprocess.run(
        [sys.executable, __file__, "--level", str(executors)],
        capture_output=True, text=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    if not line:
        print(out.stdout[-2000:], out.stderr[-2000:]); raise SystemExit(1)
    import json
    return json.loads(line[0][7:])

def level(executors):
    from pyspark.sql import SparkSession
    from tsv_utils_spark.session import ship_package
    from tsv_utils_spark.operators.dedup import dedup_sentence_spans_global
    total = executors * EXEC_CORES
    spark = (SparkSession.builder.master(MASTER)
             .appName(f"web-scaling-{executors}x{EXEC_CORES}")
             .config("spark.executor.cores", str(EXEC_CORES))
             .config("spark.executor.memory", "5g")
             .config("spark.cores.max", str(total))
             .config("spark.sql.shuffle.partitions", str(total))
             .config("spark.sql.files.maxPartitionBytes", str(8 << 20))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    df = spark.read.parquet(SRC).select("doc_id", "text")
    n = df.count()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        dedup_sentence_spans_global(df).write.mode("overwrite") \
            .format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    import json
    print("RESULT " + json.dumps(
        {"executors": executors, "cores": total, "rows": n,
         "sec": round(best, 3), "rows_per_sec": round(n / best)}), flush=True)

if __name__ == "__main__":
    if "--level" in sys.argv:
        level(int(sys.argv[sys.argv.index("--level") + 1]))
    else:
        ensure_cluster()
        rounds = []
        for r in range(2):  # interleaved rounds
            a = run_level(1)
            b = run_level(4)
            eff = a["sec"] / (4 * b["sec"])
            rounds.append((a, b, eff))
            print(f"round {r}: N={a['sec']}s 4N={b['sec']}s "
                  f"eff={eff:.3f}", flush=True)
        print("per-round:", rounds, flush=True)
