"""Scaling-efficiency evidence for the north rule: the same sketch job at
two parallelism levels (local[N] and local[4N]) on the same input — the
sandbox stand-in for N vs 4N executors (no real cluster here).

Writes BENCH/BASELINE.md with throughput at both levels and the
efficiency ratio eff = thr(4N) / (4 * thr(N)); target >= 0.8.

Usage:
  python tools/bench_scaling.py              # orchestrates both levels
  python tools/bench_scaling.py --run 8      # one level (subprocess mode)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_GRAFT_SCALING_SRC", "/tmp/scaling_src.parquet")
ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", "24000000"))
N_SMALL = int(os.environ.get("SPARK_GRAFT_SCALING_N", "2"))
REPEATS = 2


def _burn(_):
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < 1.0:
        x += 1
    return x


def cpu_ceiling() -> dict:
    """Measure the machine's effective parallel CPU throughput so the
    scaling number is read against hardware reality: this box reports 32
    logical CPUs but sustains only ~20 cores of throughput at 32 procs
    (SMT/shared tenancy), so the linear-scaling demo uses the region where
    the hardware itself is linear (<=8 cores)."""
    import multiprocessing as mp
    _t = time

    out = {}
    for n in (1, N_SMALL, N_SMALL * 4, 32):
        with mp.Pool(n) as pool:
            t0 = _t.perf_counter()
            tot = sum(pool.map(_burn, range(n)))
            out[n] = round(tot / (_t.perf_counter() - t0) / 1e6, 1)
    return out


def generate() -> None:
    from tsv_utils_spark.session import get_spark
    from tsv_utils_spark.sources import synthesize_source_code_table
    from pyspark.sql import functions as F

    spark = get_spark("scaling-gen", cores=32, shuffle_partitions=32)
    df = synthesize_source_code_table(spark, ROWS, partitions=32)
    # project to the sketch inputs (what column pruning would ship anyway)
    (df.select("repo", "path", "lang",
               F.length("content").alias("content_len"))
       .write.mode("overwrite").parquet(SRC))
    spark.stop()


def run_level(cores: int) -> dict:
    from tsv_utils_spark.session import get_spark
    from tsv_utils_spark.plans import SketchSpec, sketch_agg

    spark = get_spark(f"scaling-{cores}", cores=cores,
                      shuffle_partitions=cores)
    df = spark.read.parquet(SRC)
    n = df.count()  # warm footers/page cache
    specs = [
        SketchSpec("hll", "path", "paths_uc"),
        SketchSpec("kll", "content_len", "len_q", {"quantiles": [0.5, 0.99]}),
        SketchSpec("cm", "lang", "top_lang", {"finalize": "mode"}),
    ]
    best = None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        sketch_agg(df, ["repo"], specs).write.mode("overwrite") \
            .format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return {"cores": cores, "rows": n, "sec": round(best, 3),
            "rows_per_sec": round(n / best)}


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        print(json.dumps(run_level(int(sys.argv[2]))))
        return

    if not os.path.exists(SRC):
        generate()

    # Interleave N / 4N rounds so shared-tenancy drift hits both levels
    # equally; report the MEDIAN of per-round paired efficiencies.
    def one(cores):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cores)],
            capture_output=True, text=True, check=True, cwd="/root/repo")
        return json.loads(out.stdout.strip().splitlines()[-1])

    rounds = []
    for _ in range(3):
        rounds.append((one(N_SMALL), one(N_SMALL * 4)))
    effs = sorted(b["rows_per_sec"] / (4 * a["rows_per_sec"])
                  for a, b in rounds)
    eff = effs[len(effs) // 2]
    small = max((a for a, _ in rounds), key=lambda r: r["rows_per_sec"])
    big = max((b for _, b in rounds), key=lambda r: r["rows_per_sec"])
    ceil = cpu_ceiling()
    hw_ratio = ceil[N_SMALL * 4] / ceil[N_SMALL]
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH — scaling efficiency (N vs 4N parallelism)

Sandbox stand-in for N vs 4N executors (BASELINE.md target): the SAME
two-level sketch job (HLL distinct paths + KLL content-length quantiles +
count-min top language, grouped by Pareto-skewed `repo`) over the SAME
deterministic source-code table, run at local[{N_SMALL}] and
local[{N_SMALL * 4}]. 3 interleaved rounds (noise-paired), best-per-level shown,
efficiency = median of per-round pairs.

Input: {small['rows']:,} rows synthesized by
`tsv_utils_spark.sources.synthesize_source_code_table` (seed 42,
Pareto-skewed repos incl. a mega-repo head — the hot-key case the
mapInPandas partial level absorbs).

| parallelism | wall sec | rows/sec |
|---|---|---|
| local[{small['cores']}] (N) | {small['sec']} | {small['rows_per_sec']:,} |
| local[{big['cores']}] (4N) | {big['sec']} | {big['rows_per_sec']:,} |

**Scaling efficiency** = thr(4N) / (4 x thr(N)) = **{eff:.3f}**
(target >= 0.8).

### Hardware context

Pure-CPU throughput on this box (multiprocessing spin, M iters/sec):
{json.dumps(ceil)} — i.e. the machine itself scales {hw_ratio:.2f}x from
{N_SMALL} to {N_SMALL * 4} procs, and saturates near ~20 effective cores at
32 logical CPUs. N={N_SMALL} -> 4N={N_SMALL * 4} sits in the
hardware-linear region, which is what makes engine scaling measurable in
this sandbox; on a real cluster N vs 4N executors would not share cores.
""")
    print(json.dumps({"n": small, "n4": big,
                      "scaling_efficiency": round(eff, 3), "all_pair_effs": [round(e,3) for e in effs],
                      "cpu_ceiling_m_iters_per_sec": ceil}))


if __name__ == "__main__":
    main()
