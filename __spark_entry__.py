"""Driver contract for the spark-graft builder (PySpark target).

Maps SURVEY.md §2's operator inventory to runnable (Spark query, DuckDB
oracle) pairs over the driver's parquet tables. Queries are built on
``tsv_utils_spark`` — the PySpark-native engine in this repo.

Conventions for oracle parity:
- every computed column is aliased identically on both sides;
- floating aggregates are rounded (4-6 dp) on both sides, because Spark's
  partial aggregation reassociates float sums while DuckDB's is
  single-threaded — unrounded last-ulp diffs are not semantic;
- deterministic "randomness" uses md5 hex (identical in Spark and DuckDB)
  so sampling queries are exactly reproducible cross-engine;
- timestamps are cast to DATE strings where selected (TZ-free compare).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tsv_utils_spark.functions.missing import MissingPolicy
from tsv_utils_spark.operators import (  # noqa: E402
    Op,
    Predicates as P,
    append_tables,
    join_filter,
    select_fields,
    summarize,
    tsv_filter,
    uniq,
)
from tsv_utils_spark.operators.dedup import minhash_dedup, simhash_dedup
from tsv_utils_spark.operators.join import (
    bloom_anti_join,
    bloom_semi_join,
    salted_join,
)
from tsv_utils_spark.operators.similarity import cosine_topk, lsh_cosine_topk
from tsv_utils_spark.operators.text import analyze, fingerprint, lang_id, token_count
from tsv_utils_spark.plans import SketchSpec, sketch_agg
from tsv_utils_spark.session import ship_package

# deterministic md5-hex thresholds: P(md5(x) < _MD5_P10) ~= 0.10
_MD5_P10 = "19999999999999999999999999999999"

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Idempotently ship the package zip to this session's executors
    (needed by queries that run library pandas UDFs under a driver-owned
    SparkSession we didn't create)."""
    key = id(spark)
    if key not in _SHIPPED:
        try:
            ship_package(spark)
        except Exception:
            pass  # already added or local import path suffices
        _SHIPPED.add(key)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =====================================================================
# entry — flagship query (smoke check at sf0.001)
# =====================================================================
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one shared scan computing exact + sketch aggregates per
    group — the engine's two-level mergeable UDAF plan over lineitem."""
    sf_dir = "/root/testdata/sf0.001"
    _ensure_shipped(spark)
    li = _t(spark, sf_dir, "lineitem")
    sk = sketch_agg(
        li, ["l_returnflag"],
        [SketchSpec("hll", "l_partkey", "parts_approx"),
         SketchSpec("kll", "l_extendedprice", "price",
                    {"quantiles": [0.5, 0.95]}),
         SketchSpec("cm", "l_linestatus", "top_status", {"finalize": "mode"})],
        include_rows=True)
    exact = summarize(li, ["l_returnflag"],
                      [Op.sum("l_quantity", header="sum_qty"),
                       Op.mean("l_extendedprice", header="avg_price")])
    return sk.join(exact, "l_returnflag").orderBy("l_returnflag")


# =====================================================================
# queries + oracles
# =====================================================================
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return reg


# --------------------------------------------------------- tsv-summarize
@q("summarize_basic", """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(min(l_discount), 4) AS min_disc,
       round(max(l_discount), 4) AS max_disc,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(stddev_samp(l_quantity), 6) AS sd_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
""")
def q_summarize_basic(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = summarize(li, ["l_returnflag", "l_linestatus"], [
        Op.count(header="n_rows"),
        Op.sum("l_quantity", header="sum_qty"),
        Op.mean("l_extendedprice", header="avg_price"),
        Op.min("l_discount", header="min_disc"),
        Op.max("l_discount", header="max_disc"),
        Op.var("l_quantity", header="var_qty"),
        Op.stdev("l_quantity", header="sd_qty"),
    ])
    return out.select(
        "l_returnflag", "l_linestatus", "n_rows",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("avg_price", 4).alias("avg_price"),
        F.round("min_disc", 4).alias("min_disc"),
        F.round("max_disc", 4).alias("max_disc"),
        F.round("var_qty", 6).alias("var_qty"),
        F.round("sd_qty", 6).alias("sd_qty"))


@q("summarize_stats3", """
SELECT count(*) AS n_rows,
       round(sum(l_quantity), 2) AS qty_sum, round(min(l_quantity), 4) AS qty_min,
       round(max(l_quantity), 4) AS qty_max, round(avg(l_quantity), 6) AS qty_mean,
       round(stddev_samp(l_quantity), 6) AS qty_sd,
       round(sum(l_extendedprice), 2) AS price_sum, round(min(l_extendedprice), 4) AS price_min,
       round(max(l_extendedprice), 4) AS price_max, round(avg(l_extendedprice), 6) AS price_mean,
       round(stddev_samp(l_extendedprice), 6) AS price_sd,
       round(sum(l_discount), 4) AS disc_sum, round(min(l_discount), 4) AS disc_min,
       round(max(l_discount), 4) AS disc_max, round(avg(l_discount), 6) AS disc_mean,
       round(stddev_samp(l_discount), 6) AS disc_sd
FROM lineitem
""")
def q_summarize_stats3(spark, sf_dir):
    # the reference's headline "summary statistics" benchmark shape:
    # count + sum/min/max/mean/stdev over 3 fields in one pass
    # (docs/comparative-benchmarks-2018.md:104-105, BASELINE.md)
    li = _t(spark, sf_dir, "lineitem")
    ops = [Op.count(header="n_rows")]
    rounds = {}
    for col, pre in (("l_quantity", "qty"), ("l_extendedprice", "price"),
                     ("l_discount", "disc")):
        ops += [Op.sum(col, header=f"{pre}_sum"),
                Op.min(col, header=f"{pre}_min"),
                Op.max(col, header=f"{pre}_max"),
                Op.mean(col, header=f"{pre}_mean"),
                Op.stdev(col, header=f"{pre}_sd")]
        rounds.update({f"{pre}_sum": 2 if pre != "disc" else 4,
                       f"{pre}_min": 4, f"{pre}_max": 4,
                       f"{pre}_mean": 6, f"{pre}_sd": 6})
    out = summarize(li, None, ops)
    return out.select("n_rows", *[F.round(c, d).alias(c)
                                  for c, d in rounds.items()])


@q("summarize_quantiles", """
SELECT l_linestatus,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS median,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_linestatus
""")
def q_summarize_quantiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = summarize(li, ["l_linestatus"], [
        Op.quantile("l_extendedprice", [0.25], header="p25"),
        Op.median("l_extendedprice", header="median"),
        Op.quantile("l_extendedprice", [0.75], header="p75"),
        Op.quantile("l_extendedprice", [0.99], header="p99"),
    ])
    return out.select("l_linestatus",
                      *[F.round(c, 4).alias(c)
                        for c in ("p25", "median", "p75", "p99")])


@q("summarize_unique_count", """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part
FROM lineitem GROUP BY l_returnflag
""")
def q_summarize_unique_count(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return summarize(li, ["l_returnflag"], [
        Op.unique_count("l_suppkey", header="n_supp"),
        Op.unique_count("l_partkey", header="n_part")])


@q("summarize_first_last", """
SELECT o_orderstatus,
       round(arg_min(o_totalprice, o_orderkey), 2) AS first_price,
       round(arg_max(o_totalprice, o_orderkey), 2) AS last_price,
       min(o_orderkey) AS first_key
FROM orders GROUP BY o_orderstatus
""")
def q_summarize_first_last(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    out = summarize(o, ["o_orderstatus"],
                    [Op.first("o_totalprice", header="first_price"),
                     Op.last("o_totalprice", header="last_price"),
                     Op.min("o_orderkey", header="first_key")],
                    order_col="o_orderkey")
    return out.select("o_orderstatus",
                      F.round("first_price", 2).alias("first_price"),
                      F.round("last_price", 2).alias("last_price"),
                      F.col("first_key").cast("long").alias("first_key"))


@q("summarize_mode", """
SELECT l_returnflag, mode_qty, mode_n FROM (
  SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, l_quantity ASC) AS rn
  FROM (SELECT l_returnflag, l_quantity, count(*) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_quantity)
) WHERE rn = 1
""")
def q_summarize_mode(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = summarize(li, ["l_returnflag"],
                    [Op.mode("l_quantity", header="mode_qty"),
                     Op.mode_count("l_quantity", header="mode_n")])
    return out.select("l_returnflag", "mode_qty", "mode_n")


@q("summarize_mad_range", """
SELECT l_returnflag,
       round(mad(l_quantity), 4) AS mad_qty,
       round(max(l_quantity) - min(l_quantity), 4) AS range_qty
FROM lineitem GROUP BY l_returnflag
""")
def q_summarize_mad_range(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = summarize(li, ["l_returnflag"],
                    [Op.mad("l_quantity", header="mad_qty"),
                     Op.range("l_quantity", header="range_qty")])
    return out.select("l_returnflag",
                      F.round("mad_qty", 4).alias("mad_qty"),
                      F.round("range_qty", 4).alias("range_qty"))


@q("summarize_unique_values", """
SELECT l_returnflag, string_agg(DISTINCT l_linestatus, '|' ORDER BY l_linestatus) AS statuses
FROM lineitem GROUP BY l_returnflag
""")
def q_summarize_unique_values(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return summarize(li, ["l_returnflag"],
                     [Op.unique_values("l_linestatus", header="statuses")])


@q("summarize_global", """
SELECT count(*) AS n_rows,
       round(sum(l_extendedprice), 2) AS total_price,
       round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
""")
def q_summarize_global(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = summarize(li, None, [
        Op.count(header="n_rows"),
        Op.sum("l_extendedprice", header="total_price"),
        Op.median("l_quantity", header="med_qty"),
        Op.unique_count("l_orderkey", header="n_orders")])
    return out.select("n_rows", F.round("total_price", 2).alias("total_price"),
                      F.round("med_qty", 4).alias("med_qty"), "n_orders")


@q("summarize_missing_policy", """
SELECT lang, n_missing, n_present,
       CASE WHEN n_present = 0 THEN NULL
            ELSE CAST((sum_len * 10000 + n_present // 2) // n_present
                      AS DOUBLE) / 10000.0 END AS avg_len_excl
FROM (
  SELECT lang,
         CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_missing,
         CAST(sum(CASE WHEN text IS NOT NULL AND text <> '' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_present,
         sum(CASE WHEN text IS NOT NULL AND text <> ''
                  THEN length(text) ELSE 0 END) AS sum_len
  FROM documents GROUP BY lang
)
""")
def q_summarize_missing_policy(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").withColumn("text_len",
                                                  F.length("text"))
    # avg over non-missing only = the --x|exclude-missing policy.
    # Rounding contract: the 4-dp average is computed with EXACT integer
    # arithmetic (sum*10^4 half-up div count) then one IEEE double divide —
    # bit-identical in Spark and DuckDB, unlike round(double, 4) whose
    # input double can differ by an ulp between engines.
    out = summarize(
        d.withColumn("text_len",
                     F.when(MissingPolicy.is_missing(F.col("text")),
                            F.lit(None)).otherwise(F.col("text_len"))),
        ["lang"],
        [Op.missing_count("text", header="n_missing"),
         Op.not_missing_count("text", header="n_present"),
         Op.sum("text_len", header="sum_len")],
        missing=MissingPolicy("exclude"))
    avg4 = F.expr(
        "CASE WHEN n_present = 0 THEN NULL "
        "ELSE CAST((CAST(coalesce(sum_len, 0) AS BIGINT) * 10000 "
        "+ n_present DIV 2) "
        "DIV n_present AS DOUBLE) / 10000.0 END")
    return out.select("lang", "n_missing", "n_present",
                      avg4.alias("avg_len_excl"))


# ------------------------------------------------------------ tsv-filter
@q("filter_numeric", """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem WHERE l_quantity > 30 AND l_extendedprice > 50000
""")
def q_filter_numeric(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = tsv_filter(li, [P.num("l_quantity", "gt", 30),
                          P.num("l_extendedprice", "gt", 50_000)])
    return out.select("l_orderkey", "l_linenumber",
                      F.round("l_extendedprice", 2).alias("price"))


@q("filter_regex", """
SELECT p_partkey, p_name FROM part
WHERE regexp_matches(p_name, '^(small|large)') AND p_size >= 10
""")
def q_filter_regex(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return tsv_filter(p, [P.regex("p_name", "^(small|large)"),
                          P.num("p_size", "ge", 10)]) \
        .select("p_partkey", "p_name")


@q("filter_or_invert", """
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE NOT (l_discount >= 0.09 OR l_tax <= 0.01)
""")
def q_filter_or_invert(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return tsv_filter(li, [P.num("l_discount", "ge", 0.09),
                           P.num("l_tax", "le", 0.01)],
                      disjunct=True, invert=True) \
        .select("l_orderkey", "l_linenumber")


@q("filter_label", """
SELECT event_id, CASE WHEN value > 150 THEN '1' ELSE '0' END AS high
FROM events
""")
def q_filter_label(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return tsv_filter(e, [P.num("value", "gt", 150)],
                      mode="label", label="high") \
        .select("event_id", "high")


@q("filter_count", """
SELECT count(*) AS count FROM lineitem
WHERE l_quantity >= 10 AND l_quantity <= 20
""")
def q_filter_count(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return tsv_filter(li, [P.num("l_quantity", "ge", 10),
                           P.num("l_quantity", "le", 20)], mode="count")


@q("filter_field_vs_field", """
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE l_tax > l_discount AND abs(l_tax - l_discount) <= 0.05
""")
def q_filter_field_vs_field(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return tsv_filter(li, [P.ff_num("l_tax", "gt", "l_discount"),
                           P.ff_absdiff_le("l_tax", "l_discount", 0.05)]) \
        .select("l_orderkey", "l_linenumber")


@q("filter_string_ops", """
SELECT event_id, event_type FROM events
WHERE event_type LIKE '%sign%' OR length(event_type) <= 4
""")
def q_filter_string_ops(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return tsv_filter(e, [P.str_in_fld("event_type", "sign"),
                          P.char_len("event_type", "le", 4)],
                      disjunct=True) \
        .select("event_id", "event_type")


# -------------------------------------------------------------- tsv-join
@q("join_semi", """
SELECT o_orderkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""")
def q_join_semi(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return join_filter(o, c, data_keys=["o_custkey"],
                       filter_keys=["c_custkey"], mode="semi") \
        .select("o_orderkey")


@q("join_anti", """
SELECT o_orderkey FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""")
def q_join_anti(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return join_filter(o, c, data_keys=["o_custkey"],
                       filter_keys=["c_custkey"], mode="anti") \
        .select("o_orderkey")


@q("join_append", """
SELECT o.o_orderkey, c.c_mktsegment, round(c.c_acctbal, 2) AS acctbal
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""")
def q_join_append(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    out = join_filter(o, c, data_keys=["o_custkey"], filter_keys=["c_custkey"],
                      mode="append", append=["c_mktsegment", "c_acctbal"])
    return out.select("o_orderkey", "c_mktsegment",
                      F.round("c_acctbal", 2).alias("acctbal"))


@q("join_write_all", """
SELECT o.o_orderkey, coalesce(c.c_mktsegment, 'NONE') AS segment
FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_custkey < 50) c
  ON o.o_custkey = c.c_custkey
""")
def q_join_write_all(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    out = join_filter(o, c, data_keys=["o_custkey"], filter_keys=["c_custkey"],
                      mode="left", append=["c_mktsegment"], write_all="NONE")
    return out.select("o_orderkey", F.col("c_mktsegment").alias("segment"))


@q("join_bloom_semi", """
SELECT o_orderkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
""")
def q_join_bloom_semi(spark, sf_dir):
    _ensure_shipped(spark)
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    return bloom_semi_join(o, c, ["c_custkey"]).select("o_orderkey")


@q("join_bloom_anti", """
SELECT o_orderkey FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
""")
def q_join_bloom_anti(spark, sf_dir):
    _ensure_shipped(spark)
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    return bloom_anti_join(o, c, ["c_custkey"]).select("o_orderkey")


@q("join_salted", """
SELECT d.doc_id, d.lang, s.n_docs
FROM documents d
JOIN (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang) s
  ON d.lang = s.lang
""")
def q_join_salted(spark, sf_dir):
    # explicit skew-salted join over a GENUINELY hot key: documents.lang
    # has a handful of distinct values, so every key would funnel into
    # one reducer in a plain shuffle join. The oracle is the PLAIN join —
    # its equality is the salted==plain gate (join.py:96-120)
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    stats = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return salted_join(d, stats, ["lang"], salt=8) \
        .select("doc_id", "lang", "n_docs")


# -------------------------------------------------------------- tsv-uniq
@q("uniq_first", """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
""")
def q_uniq_first(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return uniq(d, ["lang"], order_col="doc_id").select("doc_id", "lang")


@q("uniq_equiv", """
SELECT d.doc_id, d.lang, r.equiv_id FROM documents d
JOIN (SELECT lang, dense_rank() OVER (ORDER BY min(doc_id)) AS equiv_id
      FROM documents GROUP BY lang) r USING (lang)
""")
def q_uniq_equiv(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return uniq(d, ["lang"], order_col="doc_id", mode="equiv") \
        .select("doc_id", "lang", F.col("equiv_id").cast("long").alias("equiv_id"))


@q("uniq_number", """
SELECT event_id, user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS equiv_count
FROM events
""")
def q_uniq_number(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return uniq(e, ["user_id"], order_col="event_id", mode="number") \
        .select("event_id", "user_id",
                F.col("equiv_count").cast("long").alias("equiv_count"))


@q("uniq_repeated", """
SELECT event_id FROM (
  SELECT event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY event_id) AS rn
  FROM events) WHERE rn >= 3
""")
def q_uniq_repeated(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return uniq(e, ["user_id", "event_type"], order_col="event_id",
                mode="repeated", at_least=3).select("event_id")


# ------------------------------------------------------------ tsv-sample
@q("sample_bernoulli_det", f"""
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE md5(l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR) < '{_MD5_P10}'
""")
def q_sample_bernoulli_det(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    h = F.md5(F.concat_ws("-", F.col("l_orderkey").cast("string"),
                          F.col("l_linenumber").cast("string")))
    return li.filter(h < _MD5_P10).select("l_orderkey", "l_linenumber")


@q("sample_distinct_det", f"""
SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem
WHERE md5(l_suppkey::VARCHAR) < '{_MD5_P10}'
""")
def q_sample_distinct_det(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    h = F.md5(F.col("l_suppkey").cast("string"))
    return li.filter(h < _MD5_P10) \
        .select("l_orderkey", "l_linenumber", "l_suppkey")


@q("sample_topk_det", """
SELECT l_orderkey, l_linenumber FROM lineitem
ORDER BY md5(l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR) DESC
LIMIT 100
""")
def q_sample_topk_det(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    h = F.md5(F.concat_ws("-", F.col("l_orderkey").cast("string"),
                          F.col("l_linenumber").cast("string")))
    # distributed reservoir: per-partition top-k + merge (TakeOrdered plan)
    return li.withColumn("__score", h).orderBy(F.col("__score").desc()) \
        .limit(100).select("l_orderkey", "l_linenumber")


@q("sample_weighted_det", """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         pow(('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::UBIGINT
             / 4503599627370496.0, 1.0 / n_chars) AS s
  FROM documents WHERE n_chars > 0
) ORDER BY s DESC, doc_id LIMIT 200
""")
def q_sample_weighted_det(spark, sf_dir):
    # weighted A-Res reservoir (--n --w, tsv-sample.d:1169-1174) through
    # the sample() operator with a deterministic md5-derived uniform:
    # u = first 52 md5 bits / 2^52 (exact in double, identical across
    # engines); score = u^(1/w). pow() last-ulp differences between
    # libm and java.lang.Math only matter for scores within ~1e-16 of
    # the selection boundary — adjacent order statistics here are ~1e-4
    # apart, 12 orders of margin.
    from tsv_utils_spark.operators.sample import sample as tsv_sample

    d = _t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16, 10).cast("double") / F.lit(2.0 ** 52))
    out = tsv_sample(d, mode="reservoir", n=200, weight="n_chars", u_expr=u)
    return out.select("doc_id", "lang")


@q("gen_random_inorder_det", """
SELECT doc_id,
       ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::UBIGINT
       / 4503599627370496.0 AS random_value
FROM documents
""")
def q_gen_random_inorder_det(spark, sf_dir):
    # --gen-random-inorder (:2161): append the per-row uniform, keep all
    # rows. u = md5 bits / 2^52 is a power-of-two division of an exactly
    # representable integer — bit-identical in Spark and DuckDB, so the
    # FLOAT COLUMN ITSELF is hash-gated (no rounding needed).
    from tsv_utils_spark.operators.sample import gen_random_inorder

    d = _t(spark, sf_dir, "documents")
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16, 10).cast("double") / F.lit(2.0 ** 52))
    return gen_random_inorder(d, u_expr=u).select("doc_id", "random_value")


@q("sample_stratified_det", """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::UBIGINT
         / 4503599627370496.0 AS u
  FROM documents
) WHERE u < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.25
                      WHEN 'de' THEN 0.1 ELSE 0.0 END
""")
def q_sample_stratified_det(spark, sf_dir):
    # per-stratum Bernoulli (language-balanced selection) with the
    # md5-derived exact uniform — replayable cross-engine
    from tsv_utils_spark.operators.sample import stratified_sample

    d = _t(spark, sf_dir, "documents")
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16, 10).cast("double") / F.lit(2.0 ** 52))
    return stratified_sample(d, "lang",
                             {"en": 0.5, "fr": 0.25, "de": 0.1},
                             u_expr=u).select("doc_id", "lang")


@q("sample_token_budget", """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY md5(doc_id::VARCHAR)
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS cum_excl
  FROM documents
) WHERE coalesce(cum_excl, 0) < 50000
""")
def q_sample_token_budget(spark, sf_dir):
    # token-budget corpus selection: greedy prefix in deterministic
    # md5 order until the cumulative weight reaches the budget —
    # distributed range-partition cumsum, no single-task window
    from tsv_utils_spark.operators.sample import sample_to_budget

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars") \
        .withColumn("__ord", F.md5(F.col("doc_id").cast("string")))
    out = sample_to_budget(d, "n_chars", 50_000, "__ord")
    return out.select("doc_id", "n_chars")


@q("filter_empty_blank", """
SELECT event_id, maybe_blank FROM (
  SELECT event_id,
         CASE WHEN value < 2 THEN ''
              WHEN value < 4 THEN '   '
              WHEN value < 6 THEN NULL
              ELSE event_type END AS maybe_blank
  FROM events
) WHERE maybe_blank IS NOT NULL AND NOT regexp_matches(maybe_blank, '^\\s*$')
""")
def q_filter_empty_blank(spark, sf_dir):
    # --empty/--blank predicate family (tsv-filter.d:300-310) over a
    # derived column mixing empty, whitespace-only, NULL and real values
    e = _t(spark, sf_dir, "events")
    derived = e.select(
        "event_id",
        F.when(F.col("value") < 2, F.lit(""))
         .when(F.col("value") < 4, F.lit("   "))
         .when(F.col("value") < 6, F.lit(None))
         .otherwise(F.col("event_type")).alias("maybe_blank"))
    return tsv_filter(derived, [P.not_blank("maybe_blank")]) \
        .select("event_id", "maybe_blank")


@q("filter_numeric_classes", """
SELECT event_id, s,
       TRY_CAST(s AS DOUBLE) IS NOT NULL AS is_num,
       (TRY_CAST(s AS DOUBLE) IS NOT NULL
        AND NOT isnan(TRY_CAST(s AS DOUBLE))
        AND NOT isinf(TRY_CAST(s AS DOUBLE))) AS is_fin,
       coalesce(isnan(TRY_CAST(s AS DOUBLE)), FALSE) AS is_nan,
       coalesce(isinf(TRY_CAST(s AS DOUBLE)), FALSE) AS is_inf
FROM (
  SELECT event_id,
         CASE WHEN value < 1.5 THEN 'NaN'
              WHEN value < 3 THEN 'Infinity'
              WHEN value < 4.5 THEN '-Infinity'
              WHEN value < 6 THEN 'abc'
              WHEN value < 7.5 THEN ''
              ELSE round(value, 3)::VARCHAR END AS s
  FROM events
)
""")
def q_filter_numeric_classes(spark, sf_dir):
    # is-numeric / is-finite / is-nan / is-infinity classification
    # predicates (tsv-filter.d:297-300) over a string column mixing NaN,
    # +/-Infinity, garbage, empty and real numerics (the literal set both
    # engines parse identically)
    e = _t(spark, sf_dir, "events")
    derived = e.select(
        "event_id",
        F.when(F.col("value") < 1.5, F.lit("NaN"))
         .when(F.col("value") < 3, F.lit("Infinity"))
         .when(F.col("value") < 4.5, F.lit("-Infinity"))
         .when(F.col("value") < 6, F.lit("abc"))
         .when(F.col("value") < 7.5, F.lit(""))
         .otherwise(F.round(F.col("value"), 3).cast("string")).alias("s"))
    return derived.select(
        "event_id", "s",
        P.is_numeric("s").alias("is_num"),
        P.is_finite("s").alias("is_fin"),
        F.coalesce(P.is_nan("s"), F.lit(False)).alias("is_nan"),
        F.coalesce(P.is_infinity("s"), F.lit(False)).alias("is_inf"))


@q("format_number", """
SELECT l_orderkey, l_linenumber,
       CASE WHEN d IS NULL THEN NULL
            WHEN isnan(d) THEN 'nan'
            WHEN d = 'infinity'::DOUBLE THEN 'inf'
            WHEN d = '-infinity'::DOUBLE THEN '-inf'
            WHEN d = floor(d) AND abs(d) < 1e15
              THEN CAST(CAST(floor(d) AS BIGINT) AS VARCHAR)
            ELSE printf('%.12g', d) END AS fp,
       CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS fq
FROM (SELECT l_orderkey, l_linenumber, l_quantity,
             l_extendedprice / 7 AS d FROM lineitem)
""")
def q_format_number(spark, sf_dir):
    # formatNumber output rules (common/numerics.d:44-143): 12 significant
    # digits, integral values render with no decimal point, nan/inf pass
    # through. DuckDB's C printf('%.12g') equals the Java %g + trailing-
    # zero trim — verified on integral/fractional/exponent/nan/inf/
    # 15-16-digit boundary cases.
    from tsv_utils_spark.functions.numformat import format_number_expr

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        format_number_expr(F.col("l_extendedprice") / 7).alias("fp"),
        format_number_expr(F.col("l_quantity")).alias("fq"))


@q("summarize_retain", """
SELECT lang, min_by(source, doc_id) AS source, count(*) AS n_rows
FROM documents GROUP BY lang
""")
def q_summarize_retain(spark, sf_dir):
    # --retain (tsv-summarize.d:3919): carry the FIRST input-order value
    # of a field through the aggregation, header keeps the field name
    d = _t(spark, sf_dir, "documents")
    out = summarize(d, ["lang"],
                    [Op.retain("source"), Op.count(header="n_rows")],
                    order_col="doc_id")
    return out.select("lang", "source", "n_rows")


@q("ngram_jaccard_pairs", r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                ELSE [array_to_string(t[i:i+2], ' ')
                      for i in range(1, len(t) - 1)] END) AS s
  FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
""")
def q_ngram_jaccard_pairs(spark, sf_dir):
    # exact 3-gram Jaccard — minhash_dedup's verification pass — on
    # adjacent-doc pairs, replayed in DuckDB with list comprehension
    # shingling (same tokenize/short-doc rules as _shingle_expr); the
    # jaccard double is an exact small-int division on both engines
    from tsv_utils_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = d.select(F.col("doc_id").alias("id_a"),
                     (F.col("doc_id") + 1).alias("id_b")) \
             .join(d.select(F.col("doc_id").alias("id_b")), "id_b",
                   "left_semi")
    return ngram_jaccard_pairs(d, "text", "doc_id", pairs, shingle_n=3)


@q("uniq_ignore_case", """
SELECT DISTINCT lower(
  CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END) AS k
FROM documents
""")
def q_uniq_ignore_case(spark, sf_dir):
    # --ignore-case key folding (tsv-uniq.d:260): 'EN' and 'en' are ONE
    # key — uniq emits one row per folded key, so a broken fold would
    # produce duplicate k values and fail the row-count/hash gate
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
         .otherwise(F.col("lang")).alias("mixed"))
    one_per_key = uniq(d, ["mixed"], ignore_case=True,
                       order_col="doc_id")
    return one_per_key.select(F.lower("mixed").alias("k"))


@q("events_hourly", """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
       event_type, count(*) AS n, round(sum(value), 2) AS total
FROM events GROUP BY 1, 2
""")
def q_events_hourly(spark, sf_dir):
    # tumbling 1-hour window aggregation via F.window — the batch form of
    # the Structured Streaming windowed agg (same operator at 100 TB)
    from tsv_utils_spark.operators.timeseries import windowed_agg

    e = _t(spark, sf_dir, "events")
    out = windowed_agg(e, "ts", "1 hour", ["event_type"],
                       [F.count(F.lit(1)).alias("n"),
                        F.round(F.sum("value"), 2).alias("total")])
    return out.select(F.col("w.start").cast("string").alias("hour"),
                      "event_type", "n", "total")


@q("events_sessions", """
WITH gaps AS (
  SELECT user_id,
         CASE WHEN lag(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
)
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions
FROM gaps GROUP BY user_id
""")
def q_events_sessions(spark, sf_dir):
    # sessionization: 30-minute inactivity gap starts a new session;
    # integer-microsecond comparisons (operators/timeseries.py) so both
    # engines cut identically
    from tsv_utils_spark.operators.timeseries import session_stats

    # tie order within equal timestamps can't change the session COUNT
    # (a zero gap never opens a session), so ts ordering alone is exact
    e = _t(spark, sf_dir, "events")
    return session_stats(e, "user_id", "ts", gap_minutes=30.0) \
        .select("user_id", "n_sessions")


@q("events_asof_attrib", """
SELECT c.event_id, c.user_id,
       epoch_us(v.ts) AS view_us, v.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
""")
def q_events_asof_attrib(spark, sf_dir):
    # as-of join (click -> most recent prior view per user): the
    # merge-join formulation in operators/timeseries.py — ONE shuffle on
    # the user key, running last() window, no candidate explosion.
    # Timestamps compared as integer microseconds on both engines; the
    # matched value is passed through unrounded (bit-identical doubles).
    # (user_id, ts) is collision-free in the events table, so the ASOF
    # tie rule never fires; right_order pins determinism anyway.
    from tsv_utils_spark.operators.timeseries import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    views = e.where(F.col("event_type") == "view") \
        .select("user_id", F.col("ts").alias("vts"),
                F.col("value").alias("view_value"),
                F.col("event_id").alias("vid"))
    out = asof_join(clicks, views, on=["user_id"], left_time="ts",
                    right_time="vts", right_order=["vid"])
    return out.select("event_id", "user_id",
                      F.unix_micros(F.col("vts").cast("timestamp"))
                       .alias("view_us"),
                      "view_value")


@q("events_error_window", """
SELECT c.event_id AS click_id, e.event_id AS error_id, c.user_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON c.user_id = e.user_id
 AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 240 MINUTE
""")
def q_events_error_window(spark, sf_dir):
    # range join (clicks inside 4h post-error windows, per user): the
    # bucketed-blocking plan in operators/timeseries.py — intervals
    # explode into ~2 cells each, candidates come from a plain equi-join
    # on (user, cell), exact containment filters after. No inequality
    # join, no cross product.
    from tsv_utils_spark.operators.timeseries import range_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("click_id"), "user_id", "ts")
    errs = e.where(F.col("event_type") == "error") \
        .select("user_id", F.col("ts").alias("w_start"),
                (F.col("ts") + F.expr("INTERVAL 240 MINUTES"))
                .alias("w_end"),
                F.col("event_id").alias("error_id"))
    out = range_join(clicks, errs, on=["user_id"], point_col="ts",
                     start_col="w_start", end_col="w_end",
                     bucket=14_400.0)
    return out.select("click_id", "error_id", "user_id")


@q("join_append_dup", """
SELECT c.c_custkey, c.c_mktsegment,
       CAST(o.o_orderdate AS DATE)::VARCHAR AS last_date,
       o.o_totalprice AS last_price
FROM customer c
JOIN (
  SELECT o_custkey, o_orderdate, o_totalprice FROM (
    SELECT o_custkey, o_orderdate, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_totalprice DESC) rn
    FROM orders) WHERE rn = 1
) o ON c.c_custkey = o.o_custkey
""")
def q_join_append_dup(spark, sf_dir):
    # --append-fields with duplicate filter keys + allow_duplicate_keys
    # ('last wins', tsv-join.d:563): one ACTUAL row per key — the max over
    # the append-tuple struct, which equals the DuckDB multi-key DESC sort
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice")
    out = join_filter(c, o, data_keys=["c_custkey"],
                      filter_keys=["o_custkey"], mode="append",
                      append=["o_orderdate", "o_totalprice"],
                      allow_duplicate_keys=True)
    return out.select("c_custkey", "c_mktsegment",
                      F.col("o_orderdate").cast("date").cast("string")
                       .alias("last_date"),
                      F.col("o_totalprice").alias("last_price"))


@q("tsv_roundtrip", """
SELECT lang, source, count(*) AS n,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY lang, source
""")
def q_tsv_roundtrip(spark, sf_dir):
    # sources round-trip (§2.8): write documents' flat columns as
    # quote-less TSV (write_tsv), read back with the reference's
    # no-quoting semantics (read_tsv), aggregate from the strings —
    # proving the format layer loses nothing on TSV-safe data
    from tsv_utils_spark.sources.tsv import read_tsv, write_tsv

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/tsv_roundtrip_{tag}"
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source",
                                              "n_chars")
    write_tsv(d, path)
    back = read_tsv(spark, path)
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_chars").try_cast("long")).alias("chars"))


@q("csv2tsv_roundtrip", """
SELECT doc_id, lang || ',"' || source || '" ' || n_chars AS tricky
FROM documents
""")
def q_csv2tsv_roundtrip(spark, sf_dir):
    # csv2tsv semantics (csv2tsv.d:429-640): build a field containing a
    # comma, RFC quotes, and a TAB; write as quoted CSV; read honoring
    # quotes; TAB normalizes to a space. The oracle predicts the final
    # TSV-safe value straight from parquet.
    from tsv_utils_spark.sources.tsv import csv_to_tsv_df

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/csv2tsv_roundtrip_{tag}"
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("lang"), F.lit(',"'), F.col("source"), F.lit('"\t'),
                 F.col("n_chars").cast("string")).alias("tricky"))
    (d.write.mode("overwrite").option("header", True)
      .option("quote", '"').option("escape", '"').csv(path))
    back = csv_to_tsv_df(spark, path)
    return back.select(F.col("doc_id").try_cast("long").alias("doc_id"),
                       "tricky")


@q("csv2tsv_multiline_par", """
SELECT doc_id, lang || ' "' || source || '" ' || n_chars AS tricky
FROM documents
""")
def q_csv2tsv_multiline_par(spark, sf_dir):
    # the parallel quoted-newline scanner end-to-end: build cells with
    # EMBEDDED LF and CRLF plus quotes/commas, write as quoted CSV
    # (the writer quotes multi-line cells), read back through the
    # quote-parity block scanner (multiline='parallel' forces it), and
    # TSV-normalize: LF -> one space, CRLF -> ONE space
    # (csv2tsv.d:335-347). The oracle predicts the final value straight
    # from parquet.
    from tsv_utils_spark.sources.tsv import csv_to_tsv_df

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/csv2tsv_mlpar_{tag}"
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("lang"), F.lit('\n"'), F.col("source"),
                 F.lit('"\r\n'), F.col("n_chars").cast("string"))
         .alias("tricky"))
    (d.write.mode("overwrite").option("header", True)
      .option("quote", '"').option("escape", '"').csv(path))
    back = csv_to_tsv_df(spark, path, multiline="parallel")
    return back.select(F.col("doc_id").try_cast("long").alias("doc_id"),
                       "tricky")


@q("uniq_wholeline", """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""")
def q_uniq_wholeline(spark, sf_dir):
    # whole-line key (tsv-uniq.d:250-254 field 0): keys default to ALL
    # columns; order auto-derived from the scan's (file, offset) row_id
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    return uniq(li)


@q("unique_values_first_seen", """
SELECT lang, string_agg(source, '|' ORDER BY first_seen) AS sources
FROM (
  SELECT lang, source, min(doc_id) AS first_seen
  FROM documents GROUP BY lang, source
) GROUP BY lang
""")
def q_unique_values_first_seen(spark, sf_dir):
    # --unique-values keeps FIRST-SEEN order (tsv-summarize.d:4250)
    d = _t(spark, sf_dir, "documents")
    return summarize(d, ["lang"],
                     [Op.unique_values("source", header="sources")],
                     order_col="doc_id")


@q("filter_len", """
SELECT doc_id, CAST(length(text) AS INTEGER) AS n_cp,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
FROM documents
WHERE length(text) >= 100 AND octet_length(encode(text)) <= 1000
""")
def q_filter_len(spark, sf_dir):
    # char-len (code points) + byte-len predicates (tsv-filter.d:331-343)
    d = _t(spark, sf_dir, "documents")
    out = tsv_filter(d, [P.char_len("text", "ge", 100),
                         P.byte_len("text", "le", 1000)])
    return out.select("doc_id",
                      F.char_length("text").alias("n_cp"),
                      F.octet_length("text").alias("n_bytes"))


@q("sample_replacement_det", """
WITH numbered AS (
  SELECT doc_id, lang, row_number() OVER (ORDER BY doc_id) - 1 AS idx
  FROM documents
), counts AS (
  SELECT (1103515245 * i + 12345) % (SELECT count(*) FROM documents) AS idx,
         count(*) AS m
  FROM range(500) t(i) GROUP BY 1
)
SELECT doc_id, lang FROM (
  SELECT doc_id, lang, unnest(range(m)) AS r
  FROM numbered JOIN counts USING (idx)
)
""")
def q_sample_replacement_det(spark, sf_dir):
    # exact-N with-replacement (tsv-sample.d:1571-1598): 500 draws over
    # documents; the deterministic LCG draw replaces rand() so DuckDB can
    # replicate the multiset exactly (duplicates included)
    from tsv_utils_spark.operators.sample import sample_with_replacement

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sample_with_replacement(
        d, 500, order_col="doc_id",
        draw_expr=lambda i, total: (F.lit(1103515245) * i + 12345) % total)


# ----------------------------------------------------- tsv-split /select
@q("split_bucket_det", """
SELECT bucket, count(*) AS n FROM (
  SELECT ascii(substr(md5(o_orderkey::VARCHAR), 1, 1)) % 8 AS bucket
  FROM orders) GROUP BY bucket
""")
def q_split_bucket_det(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    bucket = (F.ascii(F.substring(F.md5(F.col("o_orderkey").cast("string")),
                                  1, 1)) % 8).alias("bucket")
    return o.select(bucket).groupBy("bucket") \
        .agg(F.count(F.lit(1)).alias("n"))


@q("select_project", """
SELECT p_partkey, upper(p_brand) AS brand_u, p_size
FROM part WHERE p_size > 20
""")
def q_select_project(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") > 20) \
        .withColumn("brand_u", F.upper("p_brand"))
    return select_fields(p, ["p_partkey", "brand_u", "p_size"])


@q("append_union", """
SELECT source, count(*) AS n FROM (
  SELECT 'auto' AS source, c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
  UNION ALL
  SELECT 'bldg' AS source, c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
) GROUP BY source
""")
def q_append_union(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    u = append_tables([("auto", a), ("bldg", b)], track_source=True)
    return u.groupBy("source").agg(F.count(F.lit(1)).alias("n"))


@q("number_lines", """
SELECT row_number() OVER (ORDER BY doc_id) AS line, doc_id FROM documents
""")
def q_number_lines(spark, sf_dir):
    from tsv_utils_spark.operators.misc import number_lines

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return number_lines(d, "doc_id") \
        .select(F.col("line").cast("long").alias("line"), "doc_id")


@q("values_ordered", """
SELECT lang, string_agg(source, '|' ORDER BY doc_id) AS sources
FROM documents GROUP BY lang
""")
def q_values_ordered(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return summarize(d, ["lang"],
                     [Op.values("source", header="sources")],
                     order_col="doc_id")


# ----------------------------------------------------- sketch operators
@q("hll_unique_count", """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS parts,
       count(DISTINCT l_suppkey) AS supps
FROM lineitem GROUP BY l_returnflag
""")
def q_hll_unique_count(spark, sf_dir):
    # HLL sparse phase is exact at these cardinalities — matching the
    # exact-distinct oracle while remaining a true sketch at scale.
    # sparse_limit is raised for THIS query so sf0.1's ~20k distinct
    # parts per group stay in the exact phase (blob <= 2MB for 3 groups;
    # library default stays m/2, the memory-scaled production setting)
    _ensure_shipped(spark)
    li = _t(spark, sf_dir, "lineitem")
    out = sketch_agg(li, ["l_returnflag"],
                     [SketchSpec("hll", "l_partkey", "parts",
                                 {"sparse_limit": 1 << 18}),
                      SketchSpec("hll", "l_suppkey", "supps",
                                 {"sparse_limit": 1 << 18})])
    return out.select("l_returnflag",
                      F.col("parts").cast("long").alias("parts"),
                      F.col("supps").cast("long").alias("supps"))


@q("cm_mode", """
SELECT l_returnflag, mode_status, mode_n FROM (
  SELECT l_returnflag, l_linestatus AS mode_status, cnt AS mode_n,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, l_linestatus ASC) AS rn
  FROM (SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_linestatus)
) WHERE rn = 1
""")
def q_cm_mode(spark, sf_dir):
    # count-min point queries are exact at this cardinality/width ratio
    _ensure_shipped(spark)
    li = _t(spark, sf_dir, "lineitem")
    out = sketch_agg(li, ["l_returnflag"],
                     [SketchSpec("cm", "l_linestatus", "mode_status",
                                 {"finalize": "mode"}),
                      SketchSpec("cm", "l_linestatus", "mode_n",
                                 {"finalize": "mode_count"})])
    return out.select("l_returnflag", "mode_status", "mode_n")


def _rank_validated(li, key, value_col, est_df, probs, out_prefix, eps_of):
    """Self-validating sketch-quantile row: for each (group, q) estimate,
    compute its EXACT normalized rank over the data and emit a
    within-rank-eps flag — so the driver row itself evidences the
    published error bound (no SQL oracle can replay a sketch, but the
    bound check is exact and must be all-true).

    r6 restructure (guide §2.3): the estimate table is tiny (one row per
    group), so collect it and fold every rank check into ONE conditional
    aggregation over the data — replacing the broadcast-join that
    multiplied the scan len(probs)-fold before aggregating. The avg of
    0/1 doubles is an exact integer sum over an exact count, so the
    result is bit-identical to the joined formulation."""
    est_rows = est_df.collect()
    cells = []  # (group_key_value, q, est)
    for r in est_rows:
        for q in probs:
            cells.append((r[key],
                          r[f"{out_prefix}_q{f'{q:g}'.replace('.', '_')}"], q))
    aggs = []
    for i, (g, est, _q) in enumerate(cells):
        v = F.col(value_col)
        aggs.append(F.avg(F.when(F.col(key).eqNullSafe(F.lit(g)),
                                 (v <= F.lit(est)).cast("double")))
                     .alias(f"le_{i}"))
        aggs.append(F.avg(F.when(F.col(key).eqNullSafe(F.lit(g)),
                                 (v < F.lit(est)).cast("double")))
                     .alias(f"lt_{i}"))
    flat = li.select(key, value_col).agg(*aggs).collect()[0]
    spark = li.sparkSession
    key_field = li.schema[key]
    schema = T.StructType([key_field,
                           T.StructField("q", T.DoubleType(), False),
                           T.StructField("est", T.DoubleType()),
                           T.StructField("rank_le", T.DoubleType()),
                           T.StructField("rank_lt", T.DoubleType())])
    rows = [(g, q, est, flat[f"le_{i}"], flat[f"lt_{i}"])
            for i, (g, est, q) in enumerate(cells)]
    ranks = spark.createDataFrame(rows, schema)
    # DISCRETE-safe criterion: with atom-valued data (l_quantity has ~50
    # distinct values, ~2% rank mass each) the exact rank of the correct
    # atom can sit a whole atom-width from q — so require q to lie in
    # [rank(< est) - eps, rank(<= est) + eps], which collapses to
    # |rank - q| <= eps for continuous data
    eps = eps_of(F.col("q"))
    return ranks.select(
        key, "q", F.round("est", 4).alias("est"),
        F.round("rank_le", 6).alias("exact_rank"),
        ((F.col("q") >= F.col("rank_lt") - eps)
         & (F.col("q") <= F.col("rank_le") + eps)).alias("within_bound"))


@q("kll_quantiles")  # no oracle: genuinely approximate — but the row is
# SELF-VALIDATING: each estimate's exact rank and a within-eps flag ride
# along (rank-eps ~0.015 at k=200/n=600k; 0.02 used as the gate)
def q_kll_quantiles(spark, sf_dir):
    _ensure_shipped(spark)
    li = _t(spark, sf_dir, "lineitem")
    probs = [0.5, 0.9, 0.99]
    est = sketch_agg(li, ["l_returnflag"],
                     [SketchSpec("kll", "l_extendedprice", "price",
                                 {"quantiles": probs})])
    return _rank_validated(li, "l_returnflag", "l_extendedprice", est,
                           probs, "price", lambda q: F.lit(0.02))


@q("tdigest_quantiles")  # no oracle: approximate — self-validating like
# kll_quantiles; eps = 3x the k1 cluster half-width pi*sqrt(q(1-q))/delta
def q_tdigest_quantiles(spark, sf_dir):
    _ensure_shipped(spark)
    li = _t(spark, sf_dir, "lineitem")
    probs = [0.5, 0.95]
    est = sketch_agg(li, ["l_linestatus"],
                     [SketchSpec("tdigest", "l_quantity", "qty",
                                 {"quantiles": probs})])
    import math

    def eps_of(q):
        return 3 * math.pi * F.sqrt(q * (1 - q)) / F.lit(200.0)

    return _rank_validated(li, "l_linestatus", "l_quantity", est,
                           probs, "qty", eps_of)


# --------------------------------------------- training-data pipeline ops
@q("dedup_exact_docs", """
SELECT md5(text) AS h, min(doc_id) AS first_doc, count(*) AS n
FROM documents GROUP BY md5(text)
""")
def q_dedup_exact_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text").cast("string")).alias("h")) \
        .agg(F.min("doc_id").alias("first_doc"), F.count(F.lit(1)).alias("n"))


@q("text_tokens", """
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
            AS INTEGER) AS n_tokens
FROM documents
""")
def q_text_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens"))


@q("text_quality", """
SELECT doc_id,
       CAST(length(regexp_replace(text, '[^.!?]', '', 'g'))
            AS INTEGER) AS n_punct,
       round(CASE WHEN length(text) > 0
                  THEN length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE
                       / length(text) ELSE 0 END, 6) AS upper_ratio
FROM documents
""")
def q_text_quality(spark, sf_dir):
    from tsv_utils_spark.operators.text import punct_count, upper_ratio

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id",
                    punct_count("text").alias("n_punct"),
                    upper_ratio("text").alias("upper_ratio"))


@q("text_fingerprint", """
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
""")
def q_text_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fp"))


@q("sha_invariant", """
SELECT doc_id, sha256(text) AS sha FROM documents
""")
def q_sha_invariant(spark, sf_dir):
    # the per-row content invariant from BASELINE.json:input_hint
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.sha2(F.col("text"), 256).alias("sha"))


@q("events_json_extract", """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""")
def q_events_json_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select("event_id",
                    F.get_json_object("props", "$.k").cast("long").alias("k"))


@q("ann_bruteforce", """
SELECT query_id, neighbor_id FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                                     c.vec_id ASC) AS rn
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
) WHERE rn <= 5
""")
def q_ann_bruteforce(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") < 3)
    return cosine_topk(emb, qv, k=5).select("query_id", "neighbor_id")


@q("lang_id", r"""
SELECT doc_id,
  CASE
    WHEN regexp_matches(text, '[\x{4E00}-\x{9FFF}]') THEN 'zh'
    WHEN regexp_matches(text, '[\x{3040}-\x{30FF}]') THEN 'ja'
    WHEN regexp_matches(text, '[\x{0400}-\x{04FF}]') THEN 'ru'
    WHEN regexp_matches(text, '(?i)\b(the|and|of|to|is)\b') THEN 'en'
    WHEN regexp_matches(text, '(?i)\b(el|la|los|las|una)\b') THEN 'es'
    WHEN regexp_matches(text, '(?i)\b(le|les|des|une|est)\b') THEN 'fr'
    WHEN regexp_matches(text, '(?i)\b(der|die|das|und|ist)\b') THEN 'de'
    ELSE 'other' END AS lang_guess
FROM documents
""")
def q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id("text").alias("lang_guess"))


def _plant_docs(d, n=5):
    """Corpus + exact copies of the first n docs under disjoint ids."""
    copies = d.where(F.col("doc_id") < n) \
              .withColumn("doc_id", F.col("doc_id") + _PLANT_OFFSET)
    return d.unionByName(copies)


@q("minhash_near_dup")  # no oracle: LSH + verify isn't SQL-expressible —
# SELF-VALIDATING instead: 5 exact copies are planted and the constant
# planted_all_found column asserts each linked back to its original
def q_minhash_near_dup(spark, sf_dir):
    _ensure_shipped(spark)
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = minhash_dedup(_plant_docs(d), "text", "doc_id",
                        bands=32, threshold=0.7) \
        .localCheckpoint(eager=True)  # the flag count below must not
    # re-run the whole LSH pipeline when the driver collects the result
    # planted copy must appear in the OUTPUT (linked into some verified
    # component — dup_of is the component MINIMUM, which is the original
    # only when the original isn't itself a near-dup of a smaller id)
    found = out.where(F.col("doc_id") >= _PLANT_OFFSET) \
               .select("doc_id").distinct().count()
    return out.withColumn("planted_all_found", F.lit(found >= 5))


@q("simhash_near_dup")  # no oracle: same reason — planted-copy
# self-validation (hamming-0 pair per planted doc)
def q_simhash_near_dup(spark, sf_dir):
    _ensure_shipped(spark)
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = simhash_dedup(_plant_docs(d), "text", "doc_id", max_hamming=3) \
        .localCheckpoint(eager=True)
    ok = out.where((F.col("id_b") >= _PLANT_OFFSET)
                   & (F.col("id_a") == F.col("id_b") - _PLANT_OFFSET)
                   & (F.col("hamming") == 0))
    found = ok.select("id_b").distinct().count()
    return out.withColumn("planted_all_found", F.lit(found >= 5))


_PLANT_OFFSET = 1_000_000


def _planted_corpus(emb, qv):
    """Corpus + an exact twin of each query vector under a disjoint id —
    the synthetic embeddings are near-orthogonal (no true neighbors), so
    the meaningful self-validation is: does the index FIND the planted
    twin? (the pytest planted-recall gate, in-row)."""
    twins = qv.withColumn("vec_id", F.col("vec_id") + _PLANT_OFFSET)
    return emb.unionByName(twins)


def _with_planted_flag(approx, qv):
    # derive the flag FROM THE QUERY SET, not from approx's groups — a
    # query that retrieved nothing at all must still surface as a
    # found_planted=False row, never silently vanish
    queries = qv.select(F.col("vec_id").alias("query_id"))
    found = approx.groupBy("query_id").agg(
        F.max((F.col("neighbor_id")
               == F.col("query_id") + _PLANT_OFFSET).cast("int"))
         .alias("__f"))
    per_q = queries.join(found, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("__f") == 1, F.lit(False)).alias("found_planted"))
    rows = approx.join(per_q, "query_id").select(
        "query_id", "neighbor_id", "found_planted")
    empties = per_q.join(approx.select("query_id").distinct(),
                         "query_id", "left_anti") \
        .select("query_id", F.lit(None).cast("long").alias("neighbor_id"),
                "found_planted")
    return rows.unionByName(empties)


@q("ann_lsh")  # no oracle: approximate by design — but SELF-VALIDATING:
# an exact twin of each query is planted in the corpus and every row
# carries whether the index retrieved it (the pytest planted-recall
# gate, evidenced in the driver row)
def q_ann_lsh(spark, sf_dir):
    _ensure_shipped(spark)
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") < 3)
    approx = lsh_cosine_topk(_planted_corpus(emb, qv), qv, k=5)
    return _with_planted_flag(approx, qv)


@q("text_profile", r"""
WITH m AS (
  SELECT doc_id, text,
    length(text) AS n,
    trim(text) AS t,
    regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_extract_all(trim(text), '\w+'))
              + length(regexp_replace(trim(text), '[\w\s]', '', 'g'))
         END AS n_pieces,
    length(regexp_replace(text, '[^.!?]', '', 'g')) AS n_punct
  FROM documents
), r AS (
  SELECT *,
    round(CASE WHEN n > 0
               THEN length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE / n
               ELSE 0 END, 6) AS upper_ratio,
    round(CASE WHEN len(toks) > 0
               THEN len(list_filter(toks, x -> x IN
                    ('the','and','of','to','a','is','in','it')))::DOUBLE
                    / len(toks)
               ELSE 0 END, 6) AS stopword_ratio
  FROM m
)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
  CAST(n_pieces AS INTEGER) AS n_pieces,
  CAST(n_punct AS INTEGER) AS n_punct, upper_ratio, stopword_ratio,
  (
    (CASE WHEN n >= 200 THEN 1.0 ELSE n / 200.0 END) +
    (CASE WHEN n_punct::DOUBLE / greatest(n, 1) <= 0.05 THEN 1.0
          ELSE greatest(0.0,
               1.0 - (n_punct::DOUBLE / greatest(n, 1) - 0.05) * 10) END) +
    (CASE WHEN upper_ratio <= 0.3 THEN 1.0
          ELSE greatest(0.0, 1.0 - (upper_ratio - 0.3) * 2) END) +
    least(stopword_ratio * 5, 1.0)
  ) / 4.0 AS quality,
  CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
       WHEN regexp_matches(text, '[぀-ヿ]') THEN 'ja'
       WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
       WHEN regexp_matches(text, '(?i)\b(the|and|of|to|is)\b') THEN 'en'
       WHEN regexp_matches(text, '(?i)\b(el|la|los|las|una)\b') THEN 'es'
       WHEN regexp_matches(text, '(?i)\b(le|les|des|une|est)\b') THEN 'fr'
       WHEN regexp_matches(text, '(?i)\b(der|die|das|und|ist)\b') THEN 'de'
       ELSE 'other' END AS lang_guess,
  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM r
""")
def q_text_profile(spark, sf_dir):
    # the composite one-pass profile; every metric replicated in the
    # DuckDB oracle above (n_pieces uses the lookaround-free closed form
    # word-runs + non-space-non-word chars, since RE2 has no lookarounds —
    # equivalence property-tested in tests)
    d = _t(spark, sf_dir, "documents")
    return analyze(d, "text", "doc_id")


@q("scrub_pii", r"""
WITH d AS (
  SELECT doc_id,
         coalesce(text, '') ||
         CASE doc_id % 4
           WHEN 0 THEN ' contact user' || doc_id || '@example.com'
           WHEN 1 THEN ' from 10.0.' || (doc_id % 256) || '.7'
           WHEN 2 THEN ' call +1 415 555 01' || lpad((doc_id % 100)::VARCHAR, 2, '0')
           ELSE '' END AS text
  FROM documents
), s1 AS (
  SELECT doc_id, text AS c,
    len(regexp_extract_all(text,
        '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS n_email,
    regexp_replace(text, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                   '[EMAIL]', 'g') AS c1
  FROM d
), s2 AS (
  SELECT doc_id, n_email,
    len(regexp_extract_all(c1, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
    regexp_replace(c1, '\b(\d{1,3}\.){3}\d{1,3}\b', '[IPV4]', 'g') AS c2
  FROM s1
), s3 AS (
  SELECT doc_id, n_email, n_ipv4,
    len(regexp_extract_all(c2,
        '\+?\d{1,3}[ .\-]?\(?\d{2,4}\)?([ .\-]?\d{2,4}){2,4}')) AS n_phone,
    regexp_replace(c2, '\+?\d{1,3}[ .\-]?\(?\d{2,4}\)?([ .\-]?\d{2,4}){2,4}',
                   '[PHONE]', 'g') AS scrubbed
  FROM s2
)
SELECT doc_id, CAST(n_email AS INTEGER) AS n_email,
       CAST(n_ipv4 AS INTEGER) AS n_ipv4,
       CAST(n_phone AS INTEGER) AS n_phone, scrubbed
FROM s3
""")
def q_scrub_pii(spark, sf_dir):
    # PII redaction (emails / IPv4 / phone-like numbers) over documents
    # with deterministic planted PII; the DuckDB oracle replays the
    # identical RE2-compatible patterns and redaction order
    from tsv_utils_spark.operators.text import scrub_pii

    d = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com")))
         .when(F.col("doc_id") % 4 == 1,
               F.concat(F.lit(" from 10.0."),
                        (F.col("doc_id") % 256).cast("string"),
                        F.lit(".7")))
         .when(F.col("doc_id") % 4 == 2,
               F.concat(F.lit(" call +1 415 555 01"),
                        F.lpad((F.col("doc_id") % 100).cast("string"),
                               2, "0")))
         .otherwise(F.lit("")))
    return scrub_pii(d.select("doc_id", planted.alias("text")))


@q("extract_urls", r"""
WITH d AS (
  SELECT doc_id,
         coalesce(text, '') ||
         CASE doc_id % 3
           WHEN 0 THEN ' see https://example.com/a' || doc_id
                       || ' and http://Mirror' || (doc_id % 5)
                       || '.example.org:8080/x'
           WHEN 1 THEN ' ref https://docs.example.net'
           ELSE '' END AS text
  FROM documents
), u AS (
  SELECT doc_id,
         regexp_extract_all(text,
           'https?://[A-Za-z0-9.\-]+(:\d+)?(/[^ \t\n\f\r<>"'']*)?') AS urls
  FROM d
)
SELECT doc_id, CAST(coalesce(len(urls), 0) AS INTEGER) AS n_urls,
       coalesce(array_to_string(list_sort(list_distinct(
         list_transform(urls,
           x -> lower(regexp_extract(x, 'https?://([A-Za-z0-9.\-]+)', 1))
         ))), ','), '') AS domains_csv
FROM u
""")
def q_extract_urls(spark, sf_dir):
    # URL/domain inventory over documents with deterministic planted
    # links; arrays are sorted + joined for a stable cross-engine hash
    from tsv_utils_spark.operators.text import extract_urls

    d = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" see https://example.com/a"),
                        F.col("doc_id").cast("string"),
                        F.lit(" and http://Mirror"),
                        (F.col("doc_id") % 5).cast("string"),
                        F.lit(".example.org:8080/x")))
         .when(F.col("doc_id") % 3 == 1, F.lit(" ref https://docs.example.net"))
         .otherwise(F.lit("")))
    out = extract_urls(d.select("doc_id", planted.alias("text")))
    return out.select(
        "doc_id", "n_urls",
        F.array_join(F.array_sort("domains"), ",").alias("domains_csv"))


@q("decontaminate_exact", r"""
SELECT d.doc_id, d.lang FROM documents d
WHERE md5(trim(regexp_replace(lower(coalesce(d.text, '')), '\s+', ' ', 'g')))
  NOT IN (SELECT md5(trim(regexp_replace(lower(coalesce(text, '')),
                                         '\s+', ' ', 'g')))
          FROM documents WHERE doc_id % 7 = 0)
""")
def q_decontaminate_exact(spark, sf_dir):
    # eval-set leakage guard: drop train docs whose normalized content
    # fingerprint appears in the held-out set (anti-join on md5 keys)
    from tsv_utils_spark.operators.dedup import decontaminate

    d = _t(spark, sf_dir, "documents") \
        .withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    heldout = d.where(F.col("doc_id") % 7 == 0)
    return decontaminate(d, heldout, "text", "doc_id", mode="exact") \
        .select("doc_id", "lang")


@q("text_gopher_quality", r"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS c,
         regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS words,
         regexp_split_to_array(coalesce(text, ''), '\n') AS lines
  FROM documents
), m AS (
  SELECT doc_id, c, words, lines,
    CASE WHEN length(trim(c)) = 0 THEN 0 ELSE len(words) END AS n_words,
    CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS sum_wl,
    length(regexp_replace(c, '[^#]', '', 'g')) AS n_hash,
    length(regexp_replace(c, '[^…]', '', 'g'))
      + (length(c) - length(replace(c, '...', ''))) / 3 AS n_ell,
    len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
    len(list_intersect(list_distinct(list_transform(words, w -> lower(w))),
        ['the','be','to','of','and','that','have','with'])) AS n_stops,
    len(list_filter(lines, l -> regexp_matches(trim(l), '^[•‣▪*-]'))) AS n_bullet,
    len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS n_ellend,
    len(lines) AS n_lines_raw,
    len(list_distinct(lines)) AS n_uniq_lines,
    CAST(list_sum(list_transform(lines, l -> length(l))) AS BIGINT) AS line_chars,
    CAST(list_sum(list_transform(list_distinct(lines), l -> length(l)))
         AS BIGINT) AS uniq_chars
  FROM base
)
SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
  CAST(sum_wl AS DOUBLE) / greatest(n_words, 1) AS mean_word_len,
  (n_hash + n_ell) / greatest(n_words, 1) AS symbol_ratio,
  CAST(alpha_words AS DOUBLE) / greatest(n_words, 1) AS alpha_frac,
  CAST(n_stops AS INTEGER) AS n_stopwords,
  CAST(n_bullet AS DOUBLE) / greatest(n_lines_raw, 1) AS bullet_frac,
  CAST(n_ellend AS DOUBLE) / greatest(n_lines_raw, 1) AS ellipsis_end_frac,
  1.0 - CAST(n_uniq_lines AS DOUBLE) / greatest(n_lines_raw, 1)
    AS dup_line_frac,
  CAST(line_chars - uniq_chars AS DOUBLE) / greatest(line_chars, 1)
    AS dup_char_frac,
  (n_words BETWEEN 50 AND 100000
   AND CAST(sum_wl AS DOUBLE) / greatest(n_words, 1) BETWEEN 3.0 AND 10.0
   AND (n_hash + n_ell) / greatest(n_words, 1) <= 0.1
   AND CAST(n_bullet AS DOUBLE) / greatest(n_lines_raw, 1) <= 0.9
   AND CAST(n_ellend AS DOUBLE) / greatest(n_lines_raw, 1) <= 0.3
   AND CAST(alpha_words AS DOUBLE) / greatest(n_words, 1) >= 0.8
   AND n_stops >= 2
   AND 1.0 - CAST(n_uniq_lines AS DOUBLE) / greatest(n_lines_raw, 1) <= 0.3
   AND CAST(line_chars - uniq_chars AS DOUBLE)
       / greatest(line_chars, 1) <= 0.2
  ) AS gopher_pass
FROM m
""")
def q_text_gopher_quality(spark, sf_dir):
    # the published Gopher quality rules (Rae et al. 2021 App. A1.1) as
    # one Catalyst projection; every metric replayed in DuckDB list
    # comprehensions — fractions are identical int/int IEEE divisions
    from tsv_utils_spark.operators.text import gopher_quality

    return gopher_quality(_t(spark, sf_dir, "documents"))


@q("text_top_ngram", r"""
WITH base AS (
  SELECT doc_id, length(coalesce(text, '')) AS chars,
         regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+')
           AS toks
  FROM documents
), grams AS (
  SELECT doc_id, chars,
         CASE WHEN len(toks) < 2 THEN []
              ELSE [array_to_string(toks[i:i+1], ' ')
                    for i in range(1, len(toks))] END AS gs
  FROM base
), ex AS (SELECT doc_id, chars, unnest(gs) AS g FROM grams),
c AS (SELECT doc_id, chars, g, count(*) AS n FROM ex GROUP BY 1, 2, 3),
t AS (SELECT doc_id, chars,
             max(struct_pack(n := n, l := length(g), g := g)) AS top
      FROM c GROUP BY 1, 2)
SELECT b.doc_id, t.top.g AS top_gram,
       CAST(coalesce(t.top.n, 0) AS INTEGER) AS top_n,
       least(1.0, coalesce(t.top.n * t.top.l, 0)
                  / greatest(b.chars, 1)) AS top_char_frac
FROM base b LEFT JOIN t ON b.doc_id = t.doc_id
""")
def q_text_top_ngram(spark, sf_dir):
    # Gopher's n-gram repetition metric (top-2-gram character fraction),
    # distributed explode -> count -> per-doc struct max; the DuckDB
    # replay uses the identical (count, len, gram) tie-break
    from tsv_utils_spark.operators.text import top_ngram_stats

    return top_ngram_stats(_t(spark, sf_dir, "documents"), n=2)


@q("grapheme_length", """
SELECT doc_id, length(text) AS n_graphemes FROM documents
""")
def q_grapheme_length(spark, sf_dir):
    # these documents contain no combining sequences, so grapheme count ==
    # code-point count and plain length() is a valid oracle; the UDF's
    # cluster rules (ZWJ/flags/combining marks) are pytest-covered
    from tsv_utils_spark.operators.text import grapheme_length

    _ensure_shipped(spark)
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id",
                    grapheme_length("text").cast("long").alias("n_graphemes"))


@q("ann_ivf")  # no oracle: approximate (IVF cell probing) — self-
# validating planted-twin retrieval, like ann_lsh
def q_ann_ivf(spark, sf_dir):
    from tsv_utils_spark.operators.similarity import ivf_topk

    _ensure_shipped(spark)
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") < 3)
    approx = ivf_topk(_planted_corpus(emb, qv), qv, k=5)
    return _with_planted_flag(approx, qv)


@q("embedding_near_dup")  # no oracle: LSH-bucketed candidates — planted
# twin vectors self-validate (each must pair with its original, score 1)
def q_embedding_near_dup(spark, sf_dir):
    from tsv_utils_spark.operators.dedup import embedding_dedup

    _ensure_shipped(spark)
    emb = _t(spark, sf_dir, "embeddings")
    twins = emb.where(F.col("vec_id") < 5) \
               .withColumn("vec_id", F.col("vec_id") + _PLANT_OFFSET)
    corpus = emb.unionByName(twins)
    # synthetic embeddings are near-orthogonal (no true dups); 0.2 keeps
    # the candidate-generation + verify pipeline observable end-to-end
    out = embedding_dedup(corpus, "embedding", "vec_id", threshold=0.2) \
        .select("id_a", "id_b", F.round("score", 4).alias("score")) \
        .localCheckpoint(eager=True)
    ok = out.where((F.col("id_b") >= _PLANT_OFFSET)
                   & (F.col("id_a") == F.col("id_b") - _PLANT_OFFSET)
                   & (F.col("score") >= 0.999))
    found = ok.select("id_b").distinct().count()
    return out.withColumn("planted_all_found", F.lit(found >= 5))


# =====================================================================
# Source-code table (BASELINE.json:input_hint): (repo, path, commit,
# lang, content) with the per-row sha256 invariant. For ORACLED queries
# the table is DERIVED deterministically from the documents parquet with
# expressions that are bit-identical in Spark and DuckDB: u = first 52
# md5 bits / 2^52 (exactly representable), repo rank = floor(1/u) - 1
# (Zipf: P(rank >= r) = 1/(r+1); repo_0 holds ~half the files — the
# mega-repo skew pathology). sources/codegen.py is the spark.range
# generator for the same shape at arbitrary scale (benchmarks).
_CODE_LANGS = ["py", "java", "go", "cpp", "js", "rs", "rb", "scala"]
_CODE_CTE = """
WITH code0 AS (
  SELECT 'repo_' || CAST(LEAST(CAST(FLOOR(1.0 / GREATEST(
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::UBIGINT
             / 4503599627370496.0, 2.220446049250313e-16)) AS BIGINT) - 1,
             199) AS VARCHAR) AS repo,
         'src/m' || CAST(doc_id % 50 AS VARCHAR) || '/f_'
             || CAST(doc_id AS VARCHAR) || '.'
             || (['py','java','go','cpp','js','rs','rb','scala'])
                [CAST(doc_id % 8 AS INTEGER) + 1] AS path,
         (['py','java','go','cpp','js','rs','rb','scala'])
                [CAST(doc_id % 8 AS INTEGER) + 1] AS lang,
         text AS content,
         doc_id
  FROM documents
), code AS (
  SELECT *, substr(md5(repo || '@' || CAST(doc_id % 97 AS VARCHAR)),
                   1, 12) AS commit
  FROM code0
)
"""


def _code_df(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    u = F.greatest(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
               16, 10).cast("double") / F.lit(2.0 ** 52),
        F.lit(2.0 ** -52))
    rank = F.least(F.floor(F.lit(1.0) / u) - 1, F.lit(199))
    repo = F.concat(F.lit("repo_"), rank.cast("string"))
    lang = F.element_at(F.array(*[F.lit(x) for x in _CODE_LANGS]),
                        (F.col("doc_id") % 8 + 1).cast("int"))
    path = F.concat(F.lit("src/m"), (F.col("doc_id") % 50).cast("string"),
                    F.lit("/f_"), F.col("doc_id").cast("string"),
                    F.lit("."), lang)
    commit = F.substring(
        F.md5(F.concat(repo, F.lit("@"),
                       (F.col("doc_id") % 97).cast("string"))), 1, 12)
    return d.select(repo.alias("repo"), path.alias("path"),
                    commit.alias("commit"), lang.alias("lang"),
                    F.col("text").alias("content"), "doc_id")


@q("code_sha_invariant", _CODE_CTE + """
SELECT path, commit, sha256(content) AS sha FROM code
""")
def q_code_sha_invariant(spark, sf_dir):
    # the per-row content invariant from BASELINE.json:input_hint —
    # Spark's sha2(content, 256) must equal the oracle's recomputed
    # sha256 on every row
    c = _code_df(spark, sf_dir)
    return c.select("path", "commit",
                    F.sha2(F.col("content"), 256).alias("sha"))


@q("code_hll_langs", _CODE_CTE + """
SELECT lang, CAST(count(DISTINCT path) AS BIGINT) AS paths,
       CAST(count(DISTINCT repo) AS BIGINT) AS repos
FROM code GROUP BY lang
""")
def q_code_hll_langs(spark, sf_dir):
    # HLL distinct path/repo counts per lang over the code table — the
    # north rule's headline sketch; sparse-exact at this cardinality
    # while remaining a true mergeable sketch at 10^12 files
    _ensure_shipped(spark)
    c = _code_df(spark, sf_dir)
    out = sketch_agg(c, ["lang"],
                     [SketchSpec("hll", "path", "paths",
                                 {"sparse_limit": 1 << 18}),
                      SketchSpec("hll", "repo", "repos",
                                 {"sparse_limit": 1 << 18})])
    return out.select("lang", F.col("paths").cast("long").alias("paths"),
                      F.col("repos").cast("long").alias("repos"))


@q("code_cm_heavy_hitters", _CODE_CTE + """
SELECT lang, top_repo, top_n FROM (
  SELECT lang, repo AS top_repo, cnt AS top_n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY cnt DESC, repo ASC) AS rn
  FROM (SELECT lang, repo, count(*) AS cnt FROM code GROUP BY lang, repo)
) WHERE rn = 1
""")
def q_code_cm_heavy_hitters(spark, sf_dir):
    # count-min heavy-hitter repo per lang: candidates (<= 200 distinct
    # repos) fit max_candidates, so the mode and its count are exact up
    # to full-depth CM collisions (~0 at width 2^13)
    _ensure_shipped(spark)
    c = _code_df(spark, sf_dir)
    out = sketch_agg(c, ["lang"],
                     [SketchSpec("cm", "repo", "top_repo",
                                 {"finalize": "mode"}),
                      SketchSpec("cm", "repo", "top_n",
                                 {"finalize": "mode_count"})])
    return out.select("lang", "top_repo", "top_n")


@q("code_cm_topk", _CODE_CTE + """
SELECT lang, CAST(rank AS INTEGER) AS rank, repo, n FROM (
  SELECT lang, repo, cnt AS n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY cnt DESC, repo ASC) AS rank
  FROM (SELECT lang, repo, count(*) AS cnt FROM code GROUP BY lang, repo)
) WHERE rank <= 3
""")
def q_code_cm_topk(spark, sf_dir):
    # count-min top-k heavy hitters per lang (the north star's
    # 'heavy-hitter language/extension frequencies'): the sketch's
    # candidate set finalizes as topk_json; parsed + exploded JVM-side
    # into exact (lang, rank, repo, n) rows for the oracle
    _ensure_shipped(spark)
    c = _code_df(spark, sf_dir)
    out = sketch_agg(c, ["lang"],
                     [SketchSpec("cm", "repo", "top",
                                 {"finalize": "topk_json", "k_top": 3})])
    parsed = out.select(
        "lang",
        F.from_json("top", "array<array<string>>").alias("tk"))
    return parsed.select(
        "lang", F.posexplode("tk").alias("pos", "pair")) \
        .select("lang",
                (F.col("pos") + 1).cast("int").alias("rank"),
                F.col("pair")[0].alias("repo"),
                F.col("pair")[1].cast("long").alias("n"))


@q("code_rollup_paths", _CODE_CTE + """
SELECT lang, CAST(count(*) AS BIGINT) AS n_files,
       CAST(count(DISTINCT path) AS BIGINT) AS paths
FROM code GROUP BY lang
""")
def q_code_rollup_paths(spark, sf_dir):
    # hierarchical sketch ROLLUP: per-(lang, module) blob table computed
    # once, then re-aggregated to per-lang purely by merging blobs — the
    # base table is never rescanned. Mergeability/associativity shown
    # end-to-end against an exact oracle (HLL sparse-exact here).
    _ensure_shipped(spark)
    from tsv_utils_spark.plans import sketch_partials, sketch_rollup

    c = _code_df(spark, sf_dir).withColumn(
        "module", F.split(F.col("path"), "/")[1])
    specs = [SketchSpec("hll", "path", "paths", {"sparse_limit": 1 << 18})]
    fine = sketch_partials(c, ["lang", "module"], specs)
    out = sketch_rollup(fine, ["lang"], specs, include_rows=True)
    return out.select("lang", F.col("rows").alias("n_files"),
                      F.col("paths").cast("long").alias("paths"))


@q("code_kll_sizes")  # no oracle: KLL is approximate by design — but
# SELF-VALIDATING: each estimate's exact rank and a within-eps flag ride
# along (n per group ~60 at sf0.01 < k=200, so the sketch is exact here)
def q_code_kll_sizes(spark, sf_dir):
    _ensure_shipped(spark)
    c = _code_df(spark, sf_dir).withColumn(
        "size_chars", F.length("content").cast("double"))
    probs = [0.5, 0.9]
    est = sketch_agg(c, ["lang"],
                     [SketchSpec("kll", "size_chars", "sz",
                                 {"quantiles": probs})])
    return _rank_validated(c, "lang", "size_chars", est, probs, "sz",
                           lambda q: F.lit(0.02))


@q("code_bloom_anti", _CODE_CTE + """
SELECT path FROM code
WHERE repo <> 'repo_0'
  AND doc_id % 97 NOT IN (SELECT doc_id % 97 FROM code
                          WHERE repo = 'repo_0')
""")
def q_code_bloom_anti(spark, sf_dir):
    # Bloom anti-join membership test over the code table: files outside
    # the mega-repo whose chunk id never appears in repo_0. Bloom misses
    # skip the shuffle entirely; hits are exact-verified (no false drops)
    _ensure_shipped(spark)
    c = _code_df(spark, sf_dir).withColumn("chunk", F.col("doc_id") % 97)
    data = c.where(F.col("repo") != "repo_0")
    filt = c.where(F.col("repo") == "repo_0").select("chunk")
    return bloom_anti_join(data, filt, ["chunk"]).select("path")


@q("code_salted_stats", _CODE_CTE + """
SELECT repo, CAST(count(*) AS BIGINT) AS n_files,
       CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
       CAST(count(DISTINCT commit) AS BIGINT) AS n_commits
FROM code GROUP BY repo
""")
def q_code_salted_stats(spark, sf_dir):
    # the north rule's skew clause, evidenced end-to-end: explicit
    # salting (salt = pmod(xxhash64(row), 16)) + two-level partial/final
    # merge over the Zipf repo key — repo_0 holds ~half of all files,
    # and its sketch work still spreads across 16 salt partials
    _ensure_shipped(spark)
    c = _code_df(spark, sf_dir)
    out = sketch_agg(c, ["repo"],
                     [SketchSpec("hll", "path", "n_paths",
                                 {"sparse_limit": 1 << 18}),
                      SketchSpec("hll", "commit", "n_commits",
                                 {"sparse_limit": 1 << 18})],
                     mode="salt", salt_partitions=16, include_rows=True)
    return out.select("repo", F.col("rows").alias("n_files"),
                      F.col("n_paths").cast("long").alias("n_paths"),
                      F.col("n_commits").cast("long").alias("n_commits"))


@q("cm_mode_day", """
SELECT event_type, mode_day, mode_day_n FROM (
  SELECT event_type, day AS mode_day, cnt AS mode_day_n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cnt DESC, day ASC) AS rn
  FROM (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY event_type, CAST(ts AS DATE))
) WHERE rn = 1
""")
def q_cm_mode_day(spark, sf_dir):
    # count-min over a TYPED date key (typed=True keeps the native
    # DateType through the kernel — hash64 canonicalizes datetimes to
    # epoch-ns): mode day per event type finalizes as a real DATE, no
    # string pre-cast. str(date) ordering == chronological, so the CM
    # tie-break matches the oracle's (cnt DESC, day ASC)
    _ensure_shipped(spark)
    e = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    out = sketch_agg(e, ["event_type"],
                     [SketchSpec("cm", "day", "mode_day",
                                 {"finalize": "mode", "typed": True,
                                  "out_type": "date"}),
                      SketchSpec("cm", "day", "mode_day_n",
                                 {"finalize": "mode_count", "typed": True})])
    return out.select("event_type", "mode_day", "mode_day_n")


@q("text_compression")  # no SQL oracle exists for zlib — SELF-VALIDATING
# instead: every row's ratio is checked against the published deflate
# worst-case bound (stored blocks: <= 5 bytes per 65535-byte block + 11)
def q_text_compression(spark, sf_dir):
    _ensure_shipped(spark)
    from tsv_utils_spark.operators.text import compression_ratio

    d = _t(spark, sf_dir, "documents")
    out = compression_ratio(d, "text", "doc_id")
    raw = F.greatest(F.col("raw_bytes"), F.lit(1)).cast("double")
    bound = (F.col("raw_bytes") + F.lit(11.0)
             + F.lit(5.0) * F.ceil(F.col("raw_bytes") / F.lit(65535.0))) / raw
    return out.select(
        "doc_id", "raw_bytes",
        F.round("compression_ratio", 6).alias("compression_ratio"),
        ((F.col("compression_ratio") > 0)
         & (F.col("compression_ratio") <= bound)).alias("within_bound"))


@q("join_bucketed", """
SELECT o.o_orderkey, o.o_custkey, c.c_name
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""")
def q_join_bucketed(spark, sf_dir):
    # bucketed big-big join: both sides written ONCE bucketed on the
    # join key, then joined with ZERO Exchange on either side (plan
    # pinned by tests/test_plans.py) — result must equal the plain join
    from tsv_utils_spark.sources.buckets import bucketed_join, write_bucketed

    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"))
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name")
    write_bucketed(o, f"bkt_orders_{tag}", ["custkey"], 8,
                   path=f"/tmp/bkt_orders_{tag}")
    write_bucketed(c, f"bkt_customer_{tag}", ["custkey"], 8,
                   path=f"/tmp/bkt_customer_{tag}")
    out = bucketed_join(spark, f"bkt_orders_{tag}", f"bkt_customer_{tag}",
                        ["custkey"])
    return out.select("o_orderkey", F.col("custkey").alias("o_custkey"),
                      "c_name")


@q("sample_token_budget_nomat", """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY md5(doc_id::VARCHAR)
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS cum_excl
  FROM documents
) WHERE coalesce(cum_excl, 0) < 50000
""")
def q_sample_token_budget_nomat(spark, sf_dir):
    # the no-materialize twin of sample_token_budget: md5 order column
    # -> deterministic hex-prefix bucketing, no localCheckpoint, no
    # RangePartitioner sampling — same oracle, same result
    from tsv_utils_spark.operators.sample import sample_to_budget

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars") \
        .withColumn("__ord", F.md5(F.col("doc_id").cast("string")))
    out = sample_to_budget(d, "n_chars", 50_000, "__ord", materialize=False)
    return out.select("doc_id", "n_chars")


@q("decontaminate_near")  # no oracle: LSH near-dup decontamination isn't
# SQL-expressible — SELF-VALIDATING: heldout = 5 long train docs with a
# trailing perturbation (exact pass can't catch them); planted_all_found
# asserts every planted original was removed by the near pass
def q_decontaminate_near(spark, sf_dir):
    _ensure_shipped(spark)
    from tsv_utils_spark.operators.dedup import decontaminate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    planted = [r["doc_id"] for r in
               d.where(F.col("n_chars") > 200).orderBy("doc_id")
                .limit(5).collect()]
    held = (d.where(F.col("doc_id").isin(planted))
             .select("doc_id",
                     F.concat(F.col("text"),
                              F.lit(" trailing eval marker")).alias("text")))
    train = d.select("doc_id", "text")
    clean = decontaminate(train, held, "text", "doc_id", mode="near",
                          threshold=0.5, bands=32)
    removed = train.join(clean, "doc_id", "left_anti").select("doc_id") \
        .localCheckpoint(eager=True)  # flag count below must not re-run
    # the whole LSH pipeline when the driver collects the result
    n_found = removed.where(F.col("doc_id").isin(planted)).count()
    return removed.withColumn("planted_all_found",
                              F.lit(n_found >= len(planted)))


@q("dsir_scores_det", r"""
WITH toks AS (
  SELECT doc_id, lang,
         regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS t,
         length(trim(coalesce(text, ''))) AS tl
  FROM documents
), gb AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(g), 1, 13))::UBIGINT % 8192 AS BIGINT) AS b
  FROM (SELECT doc_id, lang, unnest(
          t || [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]
        ) AS g
        FROM toks WHERE tl > 0)
), nb AS (SELECT doc_id, b, count(*) AS n FROM gb GROUP BY 1, 2),
rc AS (SELECT b, sum(n) AS cr FROM nb GROUP BY 1),
tc AS (SELECT b, count(*) AS ct FROM gb WHERE lang = 'zh' GROUP BY 1),
tot AS (SELECT (SELECT sum(cr) FROM rc) AS totr,
               (SELECT coalesce(sum(ct), 0) FROM tc) AS tott),
llr AS (
  SELECT rc.b,
         CAST(round((ln(coalesce(tc.ct, 0) + 1) - ln(tot.tott + 8192)
                   - ln(rc.cr + 1) + ln(tot.totr + 8192)) * 1000000)
              AS BIGINT) AS q
  FROM rc LEFT JOIN tc USING (b), tot
)
SELECT d.doc_id, CAST(coalesce(s.score, 0) AS BIGINT) AS dsir_score
FROM documents d LEFT JOIN (
  SELECT nb.doc_id, sum(nb.n * llr.q) AS score
  FROM nb JOIN llr USING (b) GROUP BY 1
) s USING (doc_id)
""")
def q_dsir_scores_det(spark, sf_dir):
    # DSIR importance scoring (Xie et al. 2023): hashed unigram+bigram
    # buckets, Laplace-smoothed target(lang=zh)-vs-raw log-likelihood
    # ratios QUANTIZED to integer micro-nats — scores are exact int64
    # dot products, so the oracle reproduces them bit-for-bit (the only
    # float steps are per-bucket ln() + one half-away round, identical
    # on both engines). operators/importance.py.
    _ensure_shipped(spark)
    from tsv_utils_spark.operators.importance import dsir_scores

    d = _t(spark, sf_dir, "documents")
    tgt = d.where(F.col("lang") == "zh")
    return dsir_scores(d, tgt, "text", "doc_id")


@q("ngram_contamination", r"""
WITH span AS (
  SELECT substr(coalesce(text, ''), 1, 120) AS sp FROM documents
  WHERE doc_id = 0
), aug AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 7 = 0 AND d.doc_id >= 3
              THEN coalesce(d.text, '') || ' ' || span.sp
              ELSE coalesce(d.text, '') END AS text
  FROM documents d, span
), toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS t
  FROM aug
), sh AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                ELSE [array_to_string(t[i:i+4], ' ')
                      for i in range(1, len(t) - 3)] END) AS s
  FROM toks
), hg AS (
  -- held-out docs restricted to >= 5 tokens BY CONSTRUCTION on both
  -- sides: this SQL cannot replay the operator's shrink-to-example
  -- rule for shorter eval docs (that path is pytest-gated), so the
  -- query guarantees the single-size regime the oracle encodes
  SELECT DISTINCT g FROM (
    SELECT unnest(s) AS g FROM sh
    JOIN toks USING (doc_id)
    WHERE doc_id < 3 AND len(t) >= 5)
), tr AS (
  SELECT doc_id, unnest(s) AS g FROM sh
)
SELECT doc_id, CAST(count(DISTINCT g) AS BIGINT) AS n_shared_ngrams
FROM tr WHERE g IN (SELECT g FROM hg) GROUP BY doc_id
""")
def q_ngram_contamination(spark, sf_dir):
    # GPT-3-style n-gram contamination flagging (5-grams for the small
    # corpus; 13 is the published production n). heldout = docs 0-2; a
    # 120-char quote of doc 0 is PLANTED into every 7th train doc —
    # exactly the single-quoted-eval-question case doc-level LSH can
    # miss — and each planted doc must be flagged with the same shared
    # count the oracle derives.
    from tsv_utils_spark.operators.dedup import ngram_contamination

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    span = d.where(F.col("doc_id") == 0).select(
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 120)
         .alias("__sp"))
    aug = d.crossJoin(F.broadcast(span)).select(
        "doc_id",
        F.when((F.col("doc_id") % 7 == 0) & (F.col("doc_id") >= 3),
               F.concat(F.coalesce(F.col("text"), F.lit("")),
                        F.lit(" "), F.col("__sp")))
         .otherwise(F.coalesce(F.col("text"), F.lit(""))).alias("text"))
    n_toks = F.size(F.split(F.trim(F.lower(F.coalesce(F.col("text"),
                                                      F.lit("")))),
                            "[ \t\n\f\r]+"))
    held = aug.where((F.col("doc_id") < 3) & (n_toks >= 5))
    return ngram_contamination(aug, held, "text", "doc_id", n=5)


@q("text_boilerplate", r"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN coalesce(text, '') || chr(10) ||
                   'Subscribe to our newsletter!'
              ELSE coalesce(text, '') END AS text
  FROM documents
), base AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM aug
), lines AS (
  SELECT doc_id, i AS pos, ls[i] AS line
  FROM base, UNNEST(range(1, len(ls) + 1)) AS t(i)
), hot AS (
  SELECT lower(trim(line)) AS norm FROM lines
  WHERE lower(trim(line)) <> ''
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3
)
SELECT a.doc_id, coalesce(r.text, '') AS text
FROM aug a LEFT JOIN (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM lines WHERE lower(trim(line)) NOT IN (SELECT norm FROM hot)
  GROUP BY doc_id
) r USING (doc_id)
""")
def q_text_boilerplate(spark, sf_dir):
    # C4-style boilerplate line removal: a footer line is planted into
    # every 5th document (100 docs >> min_docs) and must come back out;
    # organic lines shared by >= 3 docs are removed identically on both
    # sides. Byte-exact reassembled text is the gate.
    from tsv_utils_spark.operators.text import remove_boilerplate_lines

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.coalesce(F.col("text"), F.lit("")),
                        F.lit("\nSubscribe to our newsletter!")))
         .otherwise(F.coalesce(F.col("text"), F.lit(""))).alias("text"))
    return remove_boilerplate_lines(d, "text", "doc_id", min_docs=3)


@q("text_token_freq", r"""
WITH toks AS (
  SELECT doc_id, t.tok FROM (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(coalesce(text, ''))),
                                 '[ \t\n\f\r]+') AS ts
    FROM documents
  ), UNNEST(ts) AS t(tok) WHERE t.tok <> ''
), vocab AS (
  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
), topk AS (
  SELECT tok FROM vocab ORDER BY cnt DESC, tok ASC LIMIT 10
), per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(cnt) AS BIGINT) AS sum_token_freq,
         CAST(sum(CASE WHEN tok IN (SELECT tok FROM topk)
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
  FROM toks JOIN vocab USING (tok) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.sum_token_freq, 0) AS BIGINT) AS sum_token_freq,
       CAST(p.sum_token_freq AS DOUBLE) / CAST(p.n_tokens AS DOUBLE)
           AS mean_token_freq,
       CAST(p.n_oov AS DOUBLE) / CAST(p.n_tokens AS DOUBLE) AS oov_frac
FROM documents d LEFT JOIN per p USING (doc_id)
""")
def q_text_token_freq(spark, sf_dir):
    # corpus-frequency quality signals, integer-exact until ONE final
    # IEEE divide per column (the rounding-contract-safe shape): mean
    # corpus frequency of a doc's tokens + top-K vocab coverage.
    # top_k=10 < the corpus's 31 distinct tokens, so the OOV path is
    # genuinely exercised (top_k >= vocab would make oov_frac vacuous)
    from tsv_utils_spark.operators.text import token_frequency_stats

    d = _t(spark, sf_dir, "documents")
    return token_frequency_stats(d, "text", "doc_id", top_k=10)


@q("theta_part_overlap", """
WITH fp AS (SELECT DISTINCT l_returnflag AS f, l_partkey AS p
            FROM lineitem)
SELECT a.f AS flag_a, b.f AS flag_b,
       CAST(count(*) AS BIGINT) AS common_parts
FROM fp a JOIN fp b ON a.p = b.p AND a.f < b.f
GROUP BY a.f, b.f
""")
def q_theta_part_overlap(spark, sf_dir):
    # theta/KMV set operations: per-returnflag sketches over l_partkey
    # built ONCE (one scan, blob table), then pairwise INTERSECTION
    # cardinalities computed from the sketches alone — the question HLL
    # cannot answer. The pairing, blob attachment and estimates all run
    # DISTRIBUTED (plans/setops.py: keys-only inequality join, blob
    # equi-joins, mapInPandas estimates — no driver collect of blobs),
    # so the same code holds at many groups with multi-MB blobs.
    # k=2^18 exceeds per-group distincts at sf<=0.1, so every sketch
    # retains all hashes (theta=1) and the overlap counts are exact —
    # the oracle-exactness regime; at 10^12 files the same code degrades
    # gracefully to ~1/sqrt(k) relative error.
    _ensure_shipped(spark)
    from tsv_utils_spark.plans import sketch_partials, theta_pairwise
    from tsv_utils_spark.plans.agg import SketchSpec as _S

    li = _t(spark, sf_dir, "lineitem")
    spec = _S("theta", "l_partkey", "parts", {"k": 1 << 18})
    blobs = sketch_partials(li, ["l_returnflag"], [spec])
    pw = theta_pairwise(blobs, ["l_returnflag"])
    # zero-overlap pairs are omitted to match the oracle's inner-join
    # row set (a pair sharing no parts produces no join rows)
    return (pw.select(
        F.col("l_returnflag_a").alias("flag_a"),
        F.col("l_returnflag_b").alias("flag_b"),
        F.round("intersect_est").cast("bigint").alias("common_parts"))
        .where(F.col("common_parts") > 0)
        .orderBy("flag_a", "flag_b"))


@q("sample_mixture_det", """
WITH cnt AS (SELECT lang, count(*) AS n FROM documents
             WHERE lang IS NOT NULL GROUP BY lang),
flo AS (SELECT min(n) AS m FROM cnt)
SELECT d.doc_id, d.lang FROM documents d
JOIN cnt USING (lang), flo
WHERE d.lang IS NOT NULL
  AND ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 13))::UBIGINT
      / 4503599627370496.0
      < least(1.0, CAST(flo.m AS DOUBLE) / CAST(cnt.n AS DOUBLE))
""")
def q_sample_mixture_det(spark, sf_dir):
    # corpus mixing: equalize languages (down-sample every lang to the
    # smallest lang's size in expectation) with the md5-derived uniform
    # — rates are exact int/int divisions, so both engines make
    # identical keep/drop decisions row by row
    from tsv_utils_spark.operators.sample import mixture_sample

    d = _t(spark, sf_dir, "documents")
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16, 10).cast("double") / F.lit(2.0 ** 52))
    return mixture_sample(d, "lang", "equalize", u_expr=u) \
        .select("doc_id", "lang")


@q("pack_sequences_det", """
WITH rt AS (
  SELECT doc_id, n_chars,
         CAST(coalesce(sum(n_chars) OVER (ORDER BY md5(doc_id::VARCHAR)
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS cum
  FROM documents
)
SELECT doc_id, n_chars,
       cum // 512 AS seq_id,
       cum % 512 AS seq_offset,
       (cum + greatest(n_chars, 1) - 1) // 512 - cum // 512 + 1 AS n_seqs
FROM rt
""")
def q_pack_sequences_det(spark, sf_dir):
    # GPT-style sequence packing bookkeeping: concatenate docs in
    # deterministic md5 order, cut every 512 tokens; each doc gets its
    # starting sequence, offset, and span count. running_total keeps
    # int64 arithmetic end-to-end, so the distributed prefix sum is
    # bit-identical to the oracle's sequential window cumsum.
    _ensure_shipped(spark)
    from tsv_utils_spark.operators.pack import pack_sequences

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars") \
        .withColumn("__ord", F.md5(F.col("doc_id").cast("string")))
    return pack_sequences(d, "n_chars", 512, "__ord") \
        .select("doc_id", "n_chars", "seq_id", "seq_offset", "n_seqs")


@q("pack_segments_det", """
WITH rt AS (
  SELECT doc_id, n_chars,
         CAST(coalesce(sum(n_chars) OVER (ORDER BY md5(doc_id::VARCHAR)
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS cum
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, seq_id,
       greatest(cum, seq_id * 512) - cum AS slice_start,
       least(cum + n_chars, (seq_id + 1) * 512)
         - greatest(cum, seq_id * 512) AS slice_len,
       greatest(cum, seq_id * 512) % 512 AS seq_pos
FROM rt, UNNEST(range(cum // 512, (cum + n_chars - 1) // 512 + 1))
         AS t(seq_id)
""")
def q_pack_segments_det(spark, sf_dir):
    # writer-side packing: every (doc, sequence) slice a straddling doc
    # contributes — groupBy(seq_id) over this materializes finished
    # training sequences. Int64 bookkeeping end-to-end; the oracle
    # replays the same slice arithmetic with an UNNEST(range()).
    _ensure_shipped(spark)
    from tsv_utils_spark.operators.pack import pack_segments

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars") \
        .where(F.col("n_chars") > 0) \
        .withColumn("__ord", F.md5(F.col("doc_id").cast("string")))
    return pack_segments(d, "n_chars", 512, "__ord") \
        .select("doc_id", "seq_id", "slice_start", "slice_len", "seq_pos")


@q("pipeline_e2e", r"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS c, n_chars,
         regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS words
  FROM documents
), m AS (
  SELECT doc_id, c, n_chars,
    CASE WHEN length(trim(c)) = 0 THEN 0 ELSE len(words) END AS n_words,
    len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
      AS alpha_words,
    len(list_intersect(list_distinct(list_transform(words,
                                                    w -> lower(w))),
        ['the','be','to','of','and','that','have','with'])) AS n_stops
  FROM base
), kept AS (
  SELECT doc_id, c, n_chars FROM m
  WHERE n_words >= 10
    AND CAST(alpha_words AS DOUBLE) / greatest(n_words, 1) >= 0.5
    AND n_stops >= 1
), dedup AS (
  SELECT k.* FROM kept k
  JOIN (SELECT md5(c) AS h, min(doc_id) AS keep_id
        FROM kept GROUP BY md5(c)) r
    ON k.doc_id = r.keep_id
), clean AS (
  SELECT * FROM dedup
  WHERE md5(trim(regexp_replace(lower(c), '\s+', ' ', 'g')))
    NOT IN (SELECT md5(trim(regexp_replace(lower(coalesce(text, '')),
                                           '\s+', ' ', 'g')))
            FROM documents WHERE doc_id % 11 = 0)
), sel AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY md5(doc_id::VARCHAR)
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS cum
  FROM clean
)
SELECT doc_id, n_chars FROM sel WHERE coalesce(cum, 0) < 30000
""")
def q_pipeline_e2e(spark, sf_dir):
    # FLAGSHIP COMPOSITION: the four stages of a real LLM-pretraining
    # data pipeline, chained through the library's own operators and
    # verified end-to-end against one composed oracle —
    #   1. quality gate   (gopher_quality metrics, corpus-scaled
    #                      thresholds: >=10 words, >=50% alphabetic,
    #                      >=1 stopword — 382/500 docs pass)
    #   2. exact dedup    (md5 content hash, keep-first)
    #   3. decontaminate  (normalized-fingerprint anti-join vs a
    #                      held-out set, mode='exact')
    #   4. token budget   (30k-char greedy prefix in deterministic md5
    #                      order, the no-materialize hex-bucket path)
    # Every intermediate stays a DataFrame: one logical plan, Catalyst
    # fuses the quality projection into the scan and AQE broadcasts the
    # tiny fingerprint/keep-id sides.
    _ensure_shipped(spark)
    from tsv_utils_spark.operators.dedup import decontaminate, exact_dedup
    from tsv_utils_spark.operators.sample import sample_to_budget
    from tsv_utils_spark.operators.text import gopher_quality

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text"),
        "n_chars")
    met = gopher_quality(d)
    keep = met.where("n_words >= 10 AND alpha_frac >= 0.5 "
                     "AND n_stopwords >= 1").select("doc_id")
    kept = d.join(keep, "doc_id", "left_semi")
    deduped = exact_dedup(kept, "text", "doc_id", keep="first")
    held = d.where(F.col("doc_id") % 11 == 0)
    clean = decontaminate(deduped, held, "text", "doc_id", mode="exact")
    sel = sample_to_budget(
        clean.withColumn("__ord", F.md5(F.col("doc_id").cast("string"))),
        "n_chars", 30_000, "__ord", materialize=False)
    return sel.select("doc_id", "n_chars")


# ------------------------------------------------- web-corpus operators
# (round-5 late additions: C4 rules, global paragraph dedup, URL
# canonicalization/dedup, SemDeDup)

@q("text_c4_quality", r"""
WITH docs AS (
  SELECT doc_id, coalesce(text,'')
   || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'This line has enough words to keep it.'
        || chr(10) || 'Short line.'
        || chr(10) || 'A javascript line with many words here.'
        || chr(10) || 'Another good sentence ends here! Really? Yes.'
      WHEN doc_id % 7 = 1 THEN chr(10) || 'lorem ipsum dolor sit amet here.'
      WHEN doc_id % 7 = 2 THEN chr(10) || 'var x = { a: 1 }; done now okay?'
      ELSE '' END AS text
  FROM documents
), base AS (
  SELECT doc_id, coalesce(text, '') AS c,
         regexp_split_to_array(coalesce(text, ''), '\n') AS lines
  FROM docs
), m AS (
  SELECT doc_id, c, lines,
    list_filter(lines, l -> regexp_matches(trim(l), '[.!?"”]$')
        AND len(regexp_split_to_array(trim(l), '[ \t\n\f\r]+')) >= 5
        AND NOT contains(lower(l), 'javascript')) AS kept
  FROM base
), s AS (
  SELECT doc_id, c, lines, kept,
    coalesce(array_to_string(kept, chr(10)), '') AS clean
  FROM m
)
SELECT doc_id,
  CAST(len(lines) AS INTEGER) AS n_lines,
  CAST(len(kept) AS INTEGER) AS n_lines_kept,
  CAST(len(kept) AS DOUBLE) / greatest(len(lines), 1) AS frac_lines_kept,
  CAST(len(list_filter(regexp_split_to_array(clean, '[.!?]+'),
       x -> regexp_matches(x, '[\p{L}\p{N}]'))) AS INTEGER) AS n_sentences,
  contains(lower(c), 'lorem ipsum') AS has_lorem_ipsum,
  contains(c, '{') AS has_curly_brace,
  clean AS clean_text,
  (len(list_filter(regexp_split_to_array(clean, '[.!?]+'),
       x -> regexp_matches(x, '[\p{L}\p{N}]'))) >= 3
   AND NOT contains(lower(c), 'lorem ipsum')
   AND NOT contains(c, '{')) AS c4_pass
FROM s
""")
def q_text_c4_quality(spark, sf_dir):
    # the published C4 cleaning rules (Raffel et al. 2020 §2.2) as one
    # Catalyst projection; planted lines exercise every rule (terminal
    # punctuation, min words, javascript, lorem ipsum, curly brace);
    # every metric replayed in DuckDB list comprehensions
    from tsv_utils_spark.operators.text import c4_quality

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(i % 3 == 0,
               F.lit("\nThis line has enough words to keep it."
                     "\nShort line."
                     "\nA javascript line with many words here."
                     "\nAnother good sentence ends here! Really? Yes."))
         .when(i % 7 == 1, F.lit("\nlorem ipsum dolor sit amet here."))
         .when(i % 7 == 2, F.lit("\nvar x = { a: 1 }; done now okay?"))
         .otherwise(F.lit("")))
    return c4_quality(d.select("doc_id", planted.alias("text")))


@q("dedup_paragraphs_global", r"""
WITH docs AS (
  SELECT doc_id, coalesce(text,'')
   || CASE WHEN doc_id % 4 = 0 THEN chr(10)||chr(10)||'Shared License Paragraph v1.'
        ||chr(10)||chr(10)||'Unique tail '||CAST(doc_id AS VARCHAR) ELSE '' END
   || CASE WHEN doc_id % 6 = 1 THEN chr(10)||chr(10)||chr(10)
        ||'shared license paragraph V1.  '||chr(10)||chr(10)
        ||'Another common intro block.' ELSE '' END AS text
  FROM documents
), base AS (
  SELECT doc_id, text, regexp_split_to_array(text, '\n{2,}') AS paras
  FROM docs
), p AS (
  SELECT doc_id, unnest(paras) AS para,
         CAST(unnest(range(len(paras))) AS INTEGER) AS pos FROM base
), t AS (
  SELECT doc_id, pos, para, lower(trim(para)) AS norm FROM p
), keep AS (
  SELECT doc_id, pos, para FROM t WHERE norm = ''
  UNION ALL
  SELECT doc_id, pos, para FROM (
    SELECT doc_id, pos, para,
           row_number() OVER (PARTITION BY norm ORDER BY doc_id, pos) AS rn
    FROM t WHERE norm != '') WHERE rn = 1
)
SELECT d.doc_id, coalesce(k.text, '') AS text
FROM docs d LEFT JOIN (
  SELECT doc_id, string_agg(para, chr(10)||chr(10) ORDER BY pos) AS text
  FROM keep GROUP BY doc_id) k USING (doc_id)
""")
def q_dedup_paragraphs_global(spark, sf_dir):
    # RefinedWeb-style corpus-wide keep-FIRST paragraph dedup; planted
    # shared paragraphs (exact + case/space-variant) recur across docs,
    # the oracle replays the same window keep-first in DuckDB
    from tsv_utils_spark.operators.dedup import (
        remove_duplicate_paragraphs_global,
    )

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(i % 4 == 0,
               F.concat(F.lit("\n\nShared License Paragraph v1."
                              "\n\nUnique tail "),
                        i.cast("string"))).otherwise(F.lit("")),
        F.when(i % 6 == 1,
               F.lit("\n\n\nshared license paragraph V1.  "
                     "\n\nAnother common intro block."))
         .otherwise(F.lit("")))
    return remove_duplicate_paragraphs_global(
        d.select("doc_id", planted.alias("text")))


# one canonicalization expression, shared by both URL oracles — the
# DuckDB replay of operators/web.url_normalize (same RE2 regexes)
_URL_CANON_SQL = r"""
  CASE WHEN lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) = ''
         OR lower(regexp_extract(regexp_extract(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1), '([^@]*)$', 1), '^([^:]*)', 1)) = ''
  THEN NULL ELSE
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) || '://' ||
    lower(regexp_extract(regexp_extract(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1), '([^@]*)$', 1), '^([^:]*)', 1)) ||
    CASE WHEN regexp_extract(regexp_extract(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1), '([^@]*)$', 1), ':([0-9]+)$', 1) = ''
           OR (lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) = 'http'
               AND regexp_extract(regexp_extract(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1), '([^@]*)$', 1), ':([0-9]+)$', 1) = '80')
           OR (lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) = 'https'
               AND regexp_extract(regexp_extract(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1), '([^@]*)$', 1), ':([0-9]+)$', 1) = '443')
    THEN '' ELSE ':' || regexp_extract(regexp_extract(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1), '([^@]*)$', 1), ':([0-9]+)$', 1) END ||
    CASE WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) IN ('', '/') THEN ''
         WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) LIKE '%/'
         THEN substr(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1), 1,
                     length(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1)) - 1)
         ELSE regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) END ||
    CASE WHEN coalesce(array_to_string(list_sort(list_filter(
            string_split(regexp_extract(regexp_extract(url, '^([^#]*)', 1), '\?(.*)$', 1), '&'),
            p -> p != '' AND NOT starts_with(lower(regexp_extract(p, '^([^=]*)', 1)), 'utm_')
                 AND lower(regexp_extract(p, '^([^=]*)', 1)) NOT IN
                     ('fbclid','gclid','msclkid','igshid','mc_eid','ref','ref_src','spm'))), '&'), '') = ''
    THEN '' ELSE '?' || array_to_string(list_sort(list_filter(
            string_split(regexp_extract(regexp_extract(url, '^([^#]*)', 1), '\?(.*)$', 1), '&'),
            p -> p != '' AND NOT starts_with(lower(regexp_extract(p, '^([^=]*)', 1)), 'utm_')
                 AND lower(regexp_extract(p, '^([^=]*)', 1)) NOT IN
                     ('fbclid','gclid','msclkid','igshid','mc_eid','ref','ref_src','spm'))), '&') END
  END
"""

_URL_PLANT_SQL = r"""
  SELECT doc_id,
    CASE WHEN doc_id % 6 = 0 THEN 'https://Site' || (doc_id % 7) || '.Example.COM:443/page/' || (doc_id % 11) || '/?utm_source=x&b=2&a=' || (doc_id % 3) || '#s'
         WHEN doc_id % 6 = 1 THEN 'https://site' || (doc_id % 7) || '.example.com/page/' || (doc_id % 11) || '?a=' || (doc_id % 3) || '&b=2'
         WHEN doc_id % 6 = 2 THEN 'http://Host' || (doc_id % 5) || '.example.org:80/x/' || (doc_id % 13)
         WHEN doc_id % 6 = 3 THEN 'http://host' || (doc_id % 5) || '.example.org/x/' || (doc_id % 13) || '/'
         WHEN doc_id % 6 = 4 THEN 'not a url ' || doc_id
         ELSE 'https://cdn.example.net/asset?gclid=' || doc_id || '&v=' || (doc_id % 4) END AS url
  FROM documents
"""


def _planted_urls(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    url = (F.when(i % 6 == 0, F.concat(
                F.lit("https://Site"), s(i % 7),
                F.lit(".Example.COM:443/page/"), s(i % 11),
                F.lit("/?utm_source=x&b=2&a="), s(i % 3), F.lit("#s")))
            .when(i % 6 == 1, F.concat(
                F.lit("https://site"), s(i % 7),
                F.lit(".example.com/page/"), s(i % 11),
                F.lit("?a="), s(i % 3), F.lit("&b=2")))
            .when(i % 6 == 2, F.concat(
                F.lit("http://Host"), s(i % 5),
                F.lit(".example.org:80/x/"), s(i % 13)))
            .when(i % 6 == 3, F.concat(
                F.lit("http://host"), s(i % 5),
                F.lit(".example.org/x/"), s(i % 13), F.lit("/")))
            .when(i % 6 == 4, F.concat(F.lit("not a url "), s(i)))
            .otherwise(F.concat(
                F.lit("https://cdn.example.net/asset?gclid="), s(i),
                F.lit("&v="), s(i % 4))))
    return d.select("doc_id", url.alias("url"))


@q("url_dedup", r"""
WITH docs AS (PLANT), c AS (
  SELECT doc_id, url, CANON AS canonical_url FROM docs
)
SELECT doc_id, url, canonical_url FROM (
  SELECT doc_id, url, canonical_url,
         row_number() OVER (PARTITION BY canonical_url ORDER BY doc_id) AS rn
  FROM c WHERE canonical_url IS NOT NULL) WHERE rn = 1
UNION ALL
SELECT doc_id, url, canonical_url FROM c WHERE canonical_url IS NULL
""".replace("PLANT", _URL_PLANT_SQL).replace("CANON", _URL_CANON_SQL))
def q_url_dedup(spark, sf_dir):
    # crawl-stage URL dedup: canonicalize (case, default ports,
    # fragments, tracking params, trailing slash), keep min id per
    # canonical URL, unparseable rows all kept; planted URL families
    # exercise every rule, the oracle replays the normalization verbatim
    from tsv_utils_spark.operators.web import url_dedup

    return url_dedup(_planted_urls(spark, sf_dir))


@q("url_host_stats", r"""
WITH docs AS (PLANT), c AS (
  SELECT doc_id, CANON AS canonical_url FROM docs
), g AS (
  SELECT doc_id, canonical_url,
         regexp_extract(canonical_url, '^[a-z][a-z0-9+.\-]*://([^:/?#]*)', 1) AS host
  FROM c WHERE canonical_url IS NOT NULL
)
SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT canonical_url) AS BIGINT) AS n_urls,
       CAST(min(doc_id) AS BIGINT) AS first_id
FROM g GROUP BY host
""".replace("PLANT", _URL_PLANT_SQL).replace("CANON", _URL_CANON_SQL))
def q_url_host_stats(spark, sf_dir):
    # per-host crawl inventory (page counts, distinct canonical URLs,
    # first-seen id) — the input to per-domain caps; exact-oracled
    from tsv_utils_spark.operators.web import host_stats

    return host_stats(_planted_urls(spark, sf_dir))


@q("dedup_sentence_spans", r"""
WITH docs AS (
  SELECT doc_id, coalesce(text,'')
   || CASE WHEN doc_id % 4 = 0 THEN '. News intro sentence number one. Second shared sentence here! Third shared sentence ends? Unique tail ' || doc_id || '.' ELSE '' END
   || CASE WHEN doc_id % 6 = 1 THEN '. NEWS INTRO SENTENCE NUMBER ONE. SECOND SHARED SENTENCE HERE! THIRD SHARED SENTENCE ENDS? ' ELSE '' END AS text
  FROM documents
), a AS (
  SELECT doc_id, coalesce(text,'') AS c,
         regexp_extract_all(coalesce(text,''), '[^.!?]*[.!?]+[ \t\n\f\r]*|[^.!?]+$') AS arr
  FROM docs
), sp AS (
  SELECT doc_id, CAST(unnest(range(len(arr) - 3 + 1)) AS INTEGER) AS start, arr
  FROM a WHERE len(arr) >= 3
), keyed AS (
  SELECT doc_id, start,
         md5(trim(regexp_replace(lower(array_to_string(arr[CAST(start+1 AS INT):CAST(start+3 AS INT)], '')), '[ \t\n\f\r]+', ' ', 'g'))) AS key
  FROM sp
), d2 AS (
  SELECT doc_id, start FROM (
    SELECT doc_id, start, key,
           row_number() OVER (PARTITION BY key ORDER BY doc_id, start) AS rn
    FROM keyed) WHERE rn > 1
), rm AS (
  SELECT DISTINCT doc_id, CAST(unnest([start, start+1, start+2]) AS INTEGER) AS sidx FROM d2
), g AS (
  SELECT doc_id, list(sidx) AS rml FROM rm GROUP BY doc_id
)
SELECT a.doc_id,
  coalesce(array_to_string(list_filter(a.arr,
    (x, i) -> NOT list_contains(coalesce(g.rml, []), CAST(i - 1 AS INTEGER))), ''), '') AS text
FROM a LEFT JOIN g USING (doc_id)
""")
def q_dedup_sentence_spans(spark, sf_dir):
    # C4's actual dedup unit: corpus-wide keep-first over 3-sentence
    # spans, rebuilt byte-exactly from surviving sentence tokens; the
    # planted shared block (lower + UPPER case-folded twin) recurs
    # across docs at sentence boundaries, the oracle replays the same
    # tokenize/window/index-filter pipeline in DuckDB
    from tsv_utils_spark.operators.dedup import dedup_sentence_spans_global

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(i % 4 == 0,
               F.concat(F.lit(". News intro sentence number one. "
                              "Second shared sentence here! "
                              "Third shared sentence ends? Unique tail "),
                        i.cast("string"), F.lit(".")))
         .otherwise(F.lit("")),
        F.when(i % 6 == 1,
               F.lit(". NEWS INTRO SENTENCE NUMBER ONE. "
                     "SECOND SHARED SENTENCE HERE! "
                     "THIRD SHARED SENTENCE ENDS? "))
         .otherwise(F.lit("")))
    return dedup_sentence_spans_global(
        d.select("doc_id", planted.alias("text")))


@q("url_domain_cap", r"""
WITH docs AS (PLANT), c AS (
  SELECT doc_id, url, CANON AS canonical_url FROM docs
), t AS (
  SELECT doc_id, url,
         CASE WHEN canonical_url IS NULL THEN NULL
              ELSE regexp_extract(canonical_url, '^[a-z][a-z0-9+.\-]*://([^:/?#]*)', 1)
         END AS host
  FROM c
)
SELECT doc_id, url, host FROM (
  SELECT doc_id, url, host,
         row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
  FROM t WHERE host IS NOT NULL) WHERE rn <= 20
UNION ALL
SELECT doc_id, url, host FROM t WHERE host IS NULL
""".replace("PLANT", _URL_PLANT_SQL).replace("CANON", _URL_CANON_SQL))
def q_url_domain_cap(spark, sf_dir):
    # per-domain page cap (keep-earliest 20 per host, unparseable rows
    # all kept) over the planted URL families; exact window replay
    from tsv_utils_spark.operators.web import domain_cap

    return domain_cap(_planted_urls(spark, sf_dir), 20)


@q("text_chunk_documents", r"""
WITH base AS (
  SELECT doc_id, regexp_replace(coalesce(text,''), '^[ \t\n\f\r]+|[ \t\n\f\r]+$', '', 'g') AS t FROM documents
), a AS (
  SELECT doc_id,
    CASE WHEN length(t)=0 THEN [] ELSE regexp_split_to_array(t, '[ \t\n\f\r]+') END AS toks
  FROM base
), m AS (
  SELECT doc_id, toks, len(toks) AS n,
    CASE WHEN len(toks)=0 THEN 0
         ELSE 1 + CAST(floor((greatest(len(toks) - 24, 0) + 15) / 16) AS INTEGER) END AS n_chunks
  FROM a
), e AS (
  SELECT doc_id, toks, CAST(unnest(range(n_chunks)) AS INTEGER) AS chunk_idx FROM m
)
SELECT doc_id, chunk_idx,
  CAST(len(toks[CAST(chunk_idx*16+1 AS INT):CAST(chunk_idx*16+24 AS INT)]) AS INTEGER) AS n_chunk_tokens,
  array_to_string(toks[CAST(chunk_idx*16+1 AS INT):CAST(chunk_idx*16+24 AS INT)], ' ') AS chunk_text
FROM e
""")
def q_text_chunk_documents(spark, sf_dir):
    # context-window chunking (max 24 tokens, overlap 8 -> stride 16):
    # overlapping windows per doc, last chunk reaches the final token;
    # pure projection+explode, zero shuffle — the oracle replays the
    # same start arithmetic and list slices in DuckDB
    from tsv_utils_spark.operators.text import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"),
                           max_tokens=24, overlap=8)


@q("text_bad_words", r"""
WITH docs AS (
  SELECT doc_id, lang, coalesce(text,'')
   || CASE WHEN doc_id % 6 = 0 THEN ' so darn.'
           WHEN doc_id % 6 = 1 THEN ' DarnED'
           WHEN doc_id % 6 = 2 THEN ' and heck  DANG indeed'
           WHEN doc_id % 6 = 3 THEN ' heckdang'
           WHEN doc_id % 6 = 4 THEN ' (darn-ish)'
           ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  (list_has_any(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                ['darn'])
   OR regexp_matches(regexp_replace(lower(text), '[ \t\n\f\r]+', ' ', 'g'),
                     '(^|[^a-z0-9_])heck dang($|[^a-z0-9_])')) AS has_bad_word
FROM docs
""")
def q_text_bad_words(spark, sf_dir):
    # C4's bad-words page rule with \b word-boundary semantics:
    # planted 'darn.', '(darn-ish)' and the reflowed 'heck  DANG' must
    # flag; 'DarnED' and 'heckdang' must NOT; pure Catalyst, replayed
    # with DuckDB list_has_any over word-char runs + boundary regex
    from tsv_utils_spark.operators.text import flag_bad_words

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(i % 6 == 0, F.lit(" so darn."))
         .when(i % 6 == 1, F.lit(" DarnED"))
         .when(i % 6 == 2, F.lit(" and heck  DANG indeed"))
         .when(i % 6 == 3, F.lit(" heckdang"))
         .when(i % 6 == 4, F.lit(" (darn-ish)"))
         .otherwise(F.lit("")))
    return flag_bad_words(d.select("doc_id", planted.alias("text")),
                          ["darn", "heck dang"]) \
        .select("doc_id", "has_bad_word")


@q("near_dedup_select_exact", r"""
WITH d AS (
  SELECT doc_id, lang,
    CASE WHEN doc_id % 3 = 0 THEN 'shared text block ' || (doc_id % 37)
         ELSE coalesce(text,'') END AS t
  FROM documents
)
SELECT doc_id, lang FROM (
  SELECT doc_id, lang, min(doc_id) OVER (PARTITION BY md5(t)) AS m
  FROM d) WHERE doc_id = m
""")
def q_near_dedup_select_exact(spark, sf_dir):
    # near_dedup_select's CC + keep-min + anti-join machinery gated
    # EXACTLY: pairs built from exact-content equality (planted clone
    # cliques), so the surviving set must equal min-id-per-fingerprint
    from tsv_utils_spark.operators.dedup import near_dedup_select

    _ensure_shipped(spark)
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    t = F.when(i % 3 == 0,
               F.concat(F.lit("shared text block "),
                        (i % 37).cast("string"))) \
         .otherwise(F.coalesce(F.col("text"), F.lit("")))
    d2 = d.select("doc_id", t.alias("__t"), "lang")
    fp = d2.select(F.col("doc_id"), F.md5("__t").alias("__fp"))
    pairs = (fp.alias("a").join(fp.alias("b"), "__fp")
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b")))
    return near_dedup_select(d2, pairs, "doc_id") \
        .select("doc_id", "lang")


@q("jsonl_roundtrip", r"""
SELECT doc_id,
  CASE WHEN doc_id % 5 = 1 THEN 'tab' || chr(9) || 'here "quoted" back\slash'
       WHEN doc_id % 5 = 2 THEN 'newline' || chr(10) || 'unicode é中😀'
       WHEN doc_id % 5 = 3 THEN NULL
       WHEN doc_id % 5 = 4 THEN ''
       ELSE coalesce(text, '') END AS text,
  lang
FROM documents
""")
def q_jsonl_roundtrip(spark, sf_dir):
    # JSONL source/sink roundtrip (web-corpus interchange format):
    # planted control characters, quotes, unicode, explicit NULL and
    # empty-string rows survive write_jsonl -> read_jsonl byte-exactly
    # (nulls KEPT as explicit null fields — the lossless default); the
    # oracle predicts the planted values straight from parquet
    from tsv_utils_spark.sources.jsonl import read_jsonl, write_jsonl

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/jsonl_roundtrip_{tag}"
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    text2 = (F.when(i % 5 == 1,
                    F.lit('tab\there "quoted" back\\slash'))
              .when(i % 5 == 2, F.lit("newline\nunicode é中😀"))
              .when(i % 5 == 3, F.lit(None).cast("string"))
              .when(i % 5 == 4, F.lit(""))
              .otherwise(F.coalesce(F.col("text"), F.lit(""))))
    out = d.select("doc_id", text2.alias("text"), "lang")
    write_jsonl(out, path)
    return read_jsonl(spark, path, schema=out.schema)


@q("dedup_token_windows", r"""
WITH docs AS (
  SELECT doc_id, coalesce(text,'')
   || CASE WHEN doc_id % 4 = 0 THEN ' alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu tail' || doc_id ELSE '' END
   || CASE WHEN doc_id % 6 = 1 THEN '  ALPHA   BETA   GAMMA   DELTA   EPSILON   ZETA   ETA   THETA   IOTA   KAPPA   LAMBDA   MU' ELSE '' END AS text
  FROM documents
), a AS (
  SELECT doc_id, coalesce(text,'') AS c,
         regexp_extract_all(coalesce(text,''), '^[ \t\n\f\r]+|[^ \t\n\f\r]+[ \t\n\f\r]*') AS arr
  FROM docs
), sp AS (
  SELECT doc_id, CAST(unnest(range(len(arr) - 12 + 1)) AS INTEGER) AS start, arr
  FROM a WHERE len(arr) >= 12
), keyed AS (
  SELECT doc_id, start,
         md5(trim(regexp_replace(lower(array_to_string(arr[CAST(start+1 AS INT):CAST(start+12 AS INT)], '')), '[ \t\n\f\r]+', ' ', 'g'))) AS key
  FROM sp
), f AS (
  SELECT key, min(struct_pack(doc_id := doc_id, start := start)) AS m
  FROM keyed GROUP BY key
), d2 AS (
  SELECT k.doc_id, k.start FROM keyed k JOIN f USING (key)
  WHERE k.doc_id != f.m.doc_id OR k.start != f.m.start
), rm AS (
  SELECT DISTINCT doc_id, CAST(unnest(range(start, start + 12)) AS INTEGER) AS sidx FROM d2
), g AS (
  SELECT doc_id, list(sidx) AS rml FROM rm GROUP BY doc_id
)
SELECT a.doc_id,
  coalesce(array_to_string(list_filter(a.arr,
    (x, i) -> NOT list_contains(coalesce(g.rml, []), CAST(i - 1 AS INTEGER))), ''), '') AS text
FROM a LEFT JOIN g USING (doc_id)
""")
def q_dedup_token_windows(spark, sf_dir):
    # Lee et al. 2021 exact-substring dedup at token granularity
    # (12-token windows here): planted word runs recur across docs
    # exactly and as reflowed UPPER-CASE copies (whitespace-collapsed
    # case-folded keys must match both); the oracle replays the full
    # tokenize/window/keep-first/index-filter pipeline — rebuilt text
    # is byte-exact
    from tsv_utils_spark.operators.dedup import dedup_token_windows_global

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(i % 4 == 0,
               F.concat(F.lit(" alpha beta gamma delta epsilon zeta eta "
                              "theta iota kappa lambda mu tail"),
                        i.cast("string"))).otherwise(F.lit("")),
        F.when(i % 6 == 1,
               F.lit("  ALPHA   BETA   GAMMA   DELTA   EPSILON   ZETA   "
                     "ETA   THETA   IOTA   KAPPA   LAMBDA   MU"))
         .otherwise(F.lit("")))
    return dedup_token_windows_global(
        d.select("doc_id", planted.alias("text")), window=12)


@q("dedup_rate_by_source", r"""
WITH d AS (
  SELECT doc_id, source,
    CASE WHEN doc_id % 5 = 0 THEN 'cloned body ' || (doc_id % 23)
         ELSE coalesce(text,'') END AS t
  FROM documents
), keyed AS (
  SELECT doc_id, source, md5(t) AS fp FROM d
), surv AS (
  SELECT doc_id, source FROM (
    SELECT doc_id, source, min(doc_id) OVER (PARTITION BY fp) AS m
    FROM keyed) WHERE doc_id = m
)
SELECT k.source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(*) - coalesce(s.n_kept, 0) AS BIGINT) AS n_removed,
  CAST(count(*) - coalesce(s.n_kept, 0) AS DOUBLE) / count(*)
    AS dup_rate
FROM keyed k LEFT JOIN (
  SELECT source, count(*) AS n_kept FROM surv GROUP BY source) s
  USING (source)
GROUP BY k.source, s.n_kept
""")
def q_dedup_rate_by_source(spark, sf_dir):
    # corpus-intake dedup report: per-source doc counts, removed-row
    # counts and dup rate after exact keep-first dedup — pure
    # composition of verified operators (exact_dedup + one aggregate);
    # planted clone cliques (1-in-5 docs share one of 23 bodies) give
    # real rates, the oracle replays keep-min-per-fingerprint
    from tsv_utils_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    t = F.when(i % 5 == 0,
               F.concat(F.lit("cloned body "), (i % 23).cast("string"))) \
         .otherwise(F.coalesce(F.col("text"), F.lit("")))
    corpus = d.select("doc_id", "source", t.alias("text"))
    kept = exact_dedup(corpus, "text", "doc_id", keep="first") \
        .groupBy("source").agg(F.count(F.lit(1)).alias("__kept"))
    totals = corpus.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"))
    return (totals.join(kept, "source", "left")
            .select("source", "n_docs",
                    (F.col("n_docs") - F.coalesce("__kept", F.lit(0)))
                    .alias("n_removed"),
                    ((F.col("n_docs") - F.coalesce("__kept", F.lit(0)))
                     .cast("double") / F.col("n_docs").cast("double"))
                    .alias("dup_rate")))


@q("html_extract_text", r"""
WITH docs AS (
  SELECT doc_id,
    '<html><head><style>p{color:red}</style><script>var j="<p>bad</p>";</script></head><body>'
    || CASE WHEN doc_id % 3 = 0 THEN '<h1>Title ' || doc_id || '</h1>' ELSE '' END
    || '<p>' || coalesce(text, '') || '</p>'
    || CASE WHEN doc_id % 4 = 1 THEN '<ul><li>one&nbsp;item</li><li>R&amp;D &lt;ok&gt;</li></ul>' ELSE '' END
    || '<!-- c --><br></body></html>' AS html
  FROM documents
)
SELECT doc_id,
 regexp_replace(regexp_replace(regexp_replace(regexp_replace(
   replace(replace(replace(replace(replace(replace(replace(
     regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       coalesce(html, ''),
       '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
       '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
       '(?s)<!--.*?-->', ' ', 'g'),
       '(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|blockquote|section|article|header|footer)>', chr(10), 'g'),
       '(?i)<br\b[^>]*>', chr(10), 'g'),
       '<[^>]+>', ' ', 'g'),
     '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
     '&#39;', ''''), '&apos;', ''''), '&amp;', '&'),
   '[ '||chr(9)||chr(12)||chr(13)||']+', ' ', 'g'),
   ' ?'||chr(10)||' ?', chr(10), 'g'),
   chr(10)||'{3,}', chr(10)||chr(10), 'g'),
   '^[ '||chr(10)||']+|[ '||chr(10)||']+$', '', 'g') AS text
FROM docs
""")
def q_html_extract_text(spark, sf_dir):
    # WET-style HTML -> text extraction (the step before every text
    # operator): planted pages wrap documents in script/style/comment
    # chrome, headers, lists, breaks and entities (incl. the &amp;lt;
    # double-escape); the oracle replays the exact stage list from
    # web._HTML_STRIP_STAGES/_HTML_ENTITIES — byte-exact output
    from tsv_utils_spark.operators.web import html_to_text

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    html = F.concat(
        F.lit('<html><head><style>p{color:red}</style>'
              '<script>var j="<p>bad</p>";</script></head><body>'),
        F.when(i % 3 == 0, F.concat(F.lit("<h1>Title "),
                                    i.cast("string"), F.lit("</h1>")))
         .otherwise(F.lit("")),
        F.lit("<p>"), F.coalesce(F.col("text"), F.lit("")), F.lit("</p>"),
        F.when(i % 4 == 1,
               F.lit("<ul><li>one&nbsp;item</li>"
                     "<li>R&amp;D &lt;ok&gt;</li></ul>"))
         .otherwise(F.lit("")),
        F.lit("<!-- c --><br></body></html>"))
    return d.select("doc_id", html.alias("html")) \
            .select("doc_id", html_to_text("html").alias("text"))


@q("hash_split_det", r"""
SELECT doc_id,
  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT
            / 4503599627370496.0 < 0.8 THEN 'train'
       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT
            / 4503599627370496.0 < (0.8 + 0.1) THEN 'val'
       ELSE 'test' END AS split,
  lang
FROM documents
""")
def q_hash_split_det(spark, sf_dir):
    # deterministic 80/10/10 train/val/test split by content hash
    # (u = 52 md5 bits / 2^52, the repo's cross-engine uniform trick;
    # cumulative bound 0.8+0.1 is the same IEEE sum on both engines) —
    # stable under corpus growth, zero shuffle
    from tsv_utils_spark.operators.split import hash_split

    d = _t(spark, sf_dir, "documents")
    return hash_split(d, "doc_id",
                      {"train": 0.8, "val": 0.1, "test": 0.1}) \
        .select("doc_id", "split", "lang")


@q("embedding_quantize", r"""
WITH q AS (
  SELECT vec_id,
    list_max(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
    embedding
  FROM embeddings
)
SELECT vec_id, scale,
  CAST(CASE WHEN scale = 0 THEN 0 ELSE coalesce(list_sum(
    list_transform(embedding, x ->
      CAST(sign(CAST(x AS DOUBLE) / scale)
           * floor(abs(CAST(x AS DOUBLE) / scale) + 0.5) AS BIGINT))), 0)
  END AS BIGINT) AS q_sum,
  CAST(len(embedding) AS INTEGER) AS dim
FROM q
""")
def q_embedding_quantize(spark, sf_dir):
    # symmetric per-vector int8 quantization audit: scale (max|x|/127)
    # and the exact integer sum of the quantized codes — explicit
    # round-half-away arithmetic replayed bit-for-bit in DuckDB
    from tsv_utils_spark.operators.vectors import quantize_int8

    emb = _t(spark, sf_dir, "embeddings")
    qz = emb.select("vec_id", quantize_int8("embedding").alias("__z"),
                    F.size("embedding").alias("dim"))
    return qz.select(
        "vec_id", F.col("__z.scale").alias("scale"),
        F.aggregate(F.col("__z.q"), F.lit(0).cast("long"),
                    lambda a, x: a + x.cast("long")).alias("q_sum"),
        F.col("dim").cast("int").alias("dim"))


@q("classifier_score_det", r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS t,
         length(trim(coalesce(text, ''))) AS tl
  FROM documents
), gb AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(g), 1, 13))::UBIGINT % 8192 AS BIGINT) AS b
  FROM (SELECT doc_id, unnest(
          t || [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]
        ) AS g
        FROM toks WHERE tl > 0)
), nb AS (SELECT doc_id, b, count(*) AS n FROM gb GROUP BY 1, 2)
SELECT d.doc_id, CAST(coalesce(s.score, 0) + 7 AS BIGINT) AS score
FROM documents d LEFT JOIN (
  SELECT doc_id, sum(n * ((b % 1000) - 500)) AS score
  FROM nb GROUP BY 1
) s USING (doc_id)
""")
def q_classifier_score_det(spark, sf_dir):
    # fastText-style hashed linear classifier scoring with a
    # deterministic integer weight table (w[b] = b%1000 - 500 micro-
    # units, bias 7): the dot product is an exact int64 sum, so the
    # oracle reproduces it bit-for-bit through the same md5 bucket
    # hashing as DSIR (operators/importance.py)
    _ensure_shipped(spark)
    from tsv_utils_spark.operators.importance import hashed_ngram_score

    d = _t(spark, sf_dir, "documents")
    w = {b: (b % 1000) - 500 for b in range(8192)}
    return hashed_ngram_score(d, w, bias=7)


@q("corpus_quality_report", r"""
WITH base AS (
  SELECT doc_id, lang, coalesce(text, '') AS c,
         regexp_split_to_array(trim(coalesce(text, '')), '[ \t\n\f\r]+') AS words,
         regexp_split_to_array(coalesce(text, ''), '\n') AS lines
  FROM documents
), m AS (
  SELECT doc_id, lang,
    CASE WHEN length(trim(c)) = 0 THEN 0 ELSE len(words) END AS n_words,
    len(list_intersect(list_distinct(list_transform(words, w -> lower(w))),
        ['the','be','to','of','and','that','have','with'])) AS n_stops,
    len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
    len(list_filter(regexp_split_to_array(
          coalesce(array_to_string(list_filter(lines,
            l -> regexp_matches(trim(l), '[.!?"”]$')
                 AND len(regexp_split_to_array(trim(l), '[ \t\n\f\r]+')) >= 5
                 AND NOT contains(lower(l), 'javascript')), chr(10)), ''),
          '[.!?]+'),
        x -> regexp_matches(x, '[\p{L}\p{N}]'))) AS n_sentences,
    contains(lower(c), 'lorem ipsum') AS lorem, contains(c, '{') AS brace
  FROM base
)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_words) AS BIGINT) AS total_words,
  CAST(sum(CASE WHEN n_words >= 10 AND CAST(alpha_words AS DOUBLE)
                     / greatest(n_words, 1) >= 0.5 AND n_stops >= 1
                THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_pass,
  CAST(sum(CASE WHEN n_sentences >= 3 AND NOT lorem AND NOT brace
                THEN 1 ELSE 0 END) AS BIGINT) AS n_c4_pass
FROM m GROUP BY lang
""")
def q_corpus_quality_report(spark, sf_dir):
    # the composed corpus-intake report: per-language doc/word counts
    # plus corpus-scaled Gopher-style and C4 pass rates. The quality
    # stages CHAIN via their `keep` passthrough (gopher keeps lang +
    # text for c4; c4 keeps lang + gopher's metrics), so the whole
    # report is ONE scan + ONE groupBy(lang) — no self-join on doc_id
    # (verified: executed plan has a single FileScan, one exchange,
    # zero joins, zero Python)
    from tsv_utils_spark.operators.text import c4_quality, gopher_quality

    d = _t(spark, sf_dir, "documents")
    g = gopher_quality(d, keep=("lang", "text"))
    met = c4_quality(g, keep=("lang", "n_words", "alpha_frac",
                              "n_stopwords"))
    return met.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum(F.when((F.col("n_words") >= 10)
                     & (F.col("alpha_frac") >= 0.5)
                     & (F.col("n_stopwords") >= 1), 1)
               .otherwise(0)).cast("long").alias("n_quality_pass"),
        F.sum(F.when(F.col("c4_pass"), 1).otherwise(0)).cast("long")
         .alias("n_c4_pass"))


@q("semdedup_planted")  # no oracle: k-means cells are not SQL-expressible;
# planted exact clones self-validate (every clone must drop, every
# original must survive) — planted_all_found gates the result
def q_semdedup_planted(spark, sf_dir):
    from tsv_utils_spark.operators.dedup import semdedup

    _ensure_shipped(spark)
    emb = _t(spark, sf_dir, "embeddings")
    clones = emb.where(F.col("vec_id") % 13 == 0) \
                .withColumn("vec_id", F.col("vec_id") + _PLANT_OFFSET)
    corpus = emb.unionByName(clones)
    out = semdedup(corpus, "embedding", "vec_id", threshold=0.999,
                   n_clusters=8, seed=42).localCheckpoint(eager=True)
    n_clones = clones.count()
    clone_kept = out.where((F.col("vec_id") >= _PLANT_OFFSET)
                           & F.col("keep")).count()
    orig_dropped = out.where((F.col("vec_id") < _PLANT_OFFSET)
                             & ~F.col("keep")).count()
    ok = (clone_kept == 0) and (orig_dropped == 0) and (n_clones > 0)
    return out.withColumn("planted_all_found", F.lit(ok))


# =====================================================================
# The driver's per-round correctness board samples the FIRST 50 entries
# of queries().  Registration order above is thematic; the dict returned
# here is REORDERED so queries that have never had a driver-green row
# (round-3 additions + the self-validating approximates, all verified
# locally via tools/check_oracles.py) come first, ahead of the 50-query
# window.  Previously-witnessed queries follow in registration order.
_FRONT_OF_BOARD = [
    # round-6 rotation (VERDICT r5 item 1): the 22 queries whose latest
    # driver-green is r3 come first — after the r6 driver run no oracled
    # query's most recent green predates r4.
    "csv2tsv_roundtrip", "events_hourly", "events_sessions",
    "filter_empty_blank", "filter_len", "filter_numeric_classes",
    "format_number", "gen_random_inorder_det", "join_append_dup",
    "ngram_jaccard_pairs", "sample_bernoulli_det", "sample_distinct_det",
    "sample_replacement_det", "sample_stratified_det",
    "sample_token_budget", "sample_topk_det", "sample_weighted_det",
    "summarize_retain", "tsv_roundtrip", "uniq_ignore_case",
    "uniq_wholeline", "unique_values_first_seen",
    # then 28 r4-dated slots, prioritizing queries whose IMPLEMENTATION
    # changed this optimization round (selection quantiles, rank
    # validation, sketch fast paths, expression rewrites) so the driver
    # re-evidences their unchanged results:
    "summarize_quantiles", "summarize_global", "summarize_mad_range",
    "summarize_basic", "summarize_stats3", "summarize_mode",
    "summarize_unique_count", "summarize_first_last",
    "summarize_missing_policy", "summarize_unique_values",
    "text_profile", "kll_quantiles", "tdigest_quantiles", "cm_mode_day",
    "theta_part_overlap", "filter_numeric", "filter_or_invert",
    "filter_regex", "filter_label", "filter_count", "scrub_pii",
    "decontaminate_exact", "decontaminate_near", "ann_lsh", "ann_ivf",
    "minhash_near_dup", "simhash_near_dup", "embedding_near_dup",
    # (the remaining r4-dated queries — code_* family, joins, text_*,
    # pack/sample dets, pipeline_e2e — stay r4-green on the back board;
    # every r5-green query rotates behind them)
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    front = {n: QUERIES[n] for n in _FRONT_OF_BOARD if n in QUERIES}
    rest = {n: f for n, f in QUERIES.items() if n not in front}
    return {**front, **rest}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
