"""Deterministic synthetic source-code table generator.

The engine's target input (BASELINE.json:input_hint) is an Iceberg-style
table of source-code files ``(repo, path, commit, lang, content)`` at
10^12-file scale. This generator produces that shape at any size, fully
distributed and deterministic:

- built on ``spark.range(n)`` + pure Catalyst expressions — no Python, no
  driver data, no RNG state: row i is a pure function of i, so the table
  is identical at any parallelism/partitioning (the property the
  two-cluster-size benchmark and checkpoint resume rely on);
- repo sizes are Pareto/Zipf-skewed (``P(rank >= r) ~ r^-alpha``) to
  exercise hot-key salting — repo_0 alone holds ~|alpha-dependent|% of all
  files, the classic mega-repo pathology;
- every row carries ``sha = sha2(content, 256)`` — the per-row invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "java", "go", "cpp", "js", "rs", "rb", "scala"]


def synthesize_source_code_table(spark: SparkSession, n_rows: int,
                                 n_repos: int | None = None,
                                 alpha: float = 1.1,
                                 seed: int = 42,
                                 partitions: int | None = None) -> DataFrame:
    """(repo, path, commit, lang, content, sha) — deterministic, skewed."""
    n_repos = n_repos or max(10, n_rows // 1000)
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    # deterministic uniform in (0,1] from the row id
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    u = (h % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0 + 1e-9
    # Pareto rank: heavy head at rank 0 (the mega-repo)
    rank = F.least(F.floor(F.pow(u, -1.0 / alpha)) - 1,
                   F.lit(n_repos - 1)).cast("long")
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1)))
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                        (h2 % len(LANGS) + 1).cast("int"))
    # content: pseudo-source whose bytes are a pure function of id
    tok = F.concat(F.lit("tok"), (h2 % 1000).cast("string"))
    n_lines = (h % 40 + 3).cast("int")
    line = F.concat(F.lit("def f"), (h2 % 97).cast("string"),
                    F.lit("(x): return x + "), (h % 89).cast("string"),
                    F.lit("  # "), tok, F.lit("\n"))
    content = F.repeat(line, n_lines)
    repo = F.concat(F.lit("repo_"), rank.cast("string"))
    path = F.concat(F.lit("src/m"), (h2 % 50).cast("string"), F.lit("/f_"),
                    F.col("id").cast("string"), F.lit("."), lang)
    commit = F.substring(F.md5(F.concat(repo, F.lit("@"),
                                        (h % 1000).cast("string"))), 1, 12)
    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    ).withColumn("sha", F.sha2(F.col("content"), 256))
