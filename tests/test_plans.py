"""Physical-plan regression tests: the properties that make these
operators survive a 100x scale-up are plan-shape properties — filter
pushdown into the parquet scan, column pruning, broadcast for small
dims, and map-side partial aggregation with exactly one shuffle. These
tests pin them so a refactor can't silently trade one away."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def plan_of(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlanShape:
    def test_filter_pushdown_reaches_scan(self, spark):
        p = plan_of(spark, "filter_numeric")
        pushed = p.split("PushedFilters: [", 1)[1].split("]", 1)[0]
        assert "GreaterThan(l_quantity,30.0)" in pushed
        # the display truncates long filter lists — the second predicate's
        # prefix is enough to prove it reached the scan
        assert "GreaterThan(l_e" in pushed

    def test_column_pruning_reaches_scan(self, spark):
        p = plan_of(spark, "filter_numeric")
        schema = p.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
        # 4 needed columns only — not lineitem's full width
        for c in ("l_orderkey", "l_linenumber", "l_quantity",
                  "l_extendedprice"):
            assert c in schema
        assert "l_comment" not in schema and "l_shipdate" not in schema

    def test_select_pushdown(self, spark):
        p = plan_of(spark, "select_project")
        assert "GreaterThan(p_size,20)" in p
        schema = p.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
        assert schema.count(":") == 3  # exactly 3 columns scanned

    def test_semi_join_broadcasts_filter_side(self, spark):
        p = plan_of(spark, "join_semi")
        assert "BroadcastHashJoin" in p and "LeftSemi" in p
        # the big probe side must NOT shuffle (the filter side's dedup
        # aggregate may — it's the small side, pre-broadcast)
        assert "Exchange hashpartitioning(o_" not in p

    def test_summarize_is_single_shuffle_with_partials(self, spark):
        p = plan_of(spark, "summarize_basic")
        assert p.count("Exchange hashpartitioning") == 1
        # partial + final aggregation (map-side combine)
        assert p.count("HashAggregate") >= 2 or \
            p.count("ObjectHashAggregate") >= 2

    def test_whole_stage_codegen_in_exact_paths(self, spark):
        for name in ("filter_numeric", "summarize_stats3", "text_tokens"):
            p = plan_of(spark, name)
            # codegen'd operators print with a "*(stage)" prefix; AQE
            # plans defer that until execution, so only assert it on the
            # non-adaptive ones
            if "AdaptiveSparkPlan" not in p:
                assert "*(" in p, name
            # no Python evaluation in reference-parity exact paths
            assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name

    def test_salted_join_no_global_skew_point(self, spark):
        """The salted join must shuffle on (key, salt) — never on the bare
        key — so a hot key fans out across ``salt`` reducers; and the big
        side must not be broadcast."""
        p = plan_of(spark, "join_salted")
        # the join condition itself carries the salt
        join_line = next(ln for ln in p.splitlines() if "HashJoin" in ln)
        assert "__salt" in join_line, join_line
        # the BIG (doc_id-carrying) side never shuffles: its only plan
        # nodes are scan/filter/project feeding the join. Any exchange in
        # this plan belongs to the tiny per-key aggregate side.
        for frag in p.split("Exchange hashpartitioning(")[1:]:
            args = frag.split(")", 1)[0]
            assert "doc_id" not in args, args

    def test_format_number_stays_codegen(self, spark):
        p = plan_of(spark, "format_number")
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        # pure projection over the scan: no shuffle at all
        assert "Exchange" not in p

    def test_numeric_classes_stays_codegen(self, spark):
        p = plan_of(spark, "filter_numeric_classes")
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "Exchange" not in p

    def test_gopher_quality_single_pass_no_python(self, spark):
        p = plan_of(spark, "text_gopher_quality")
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "Exchange" not in p
        # one scan reading exactly (doc_id, text)
        schema = p.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
        assert "doc_id" in schema and "text" in schema
        assert "n_chars" not in schema

    def test_weighted_sample_is_takeordered(self, spark):
        # the A-Res weighted reservoir must plan as per-partition top-k +
        # driver merge, NOT a global sort
        p = plan_of(spark, "sample_weighted_det")
        assert "TakeOrderedAndProject" in p
        assert "Exchange rangepartitioning" not in p

    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        """Same-bucketed tables join with ZERO shuffle on either side —
        the write-once-join-forever pre-partitioning path for repeated
        big-big joins (sources/buckets.py)."""
        from tsv_utils_spark.sources.buckets import (
            bucketed_join,
            write_bucketed,
        )

        orders = spark.read.parquet(f"{SF}/orders.parquet") \
            .select("o_orderkey", "o_custkey", "o_totalprice")
        cust = spark.read.parquet(f"{SF}/customer.parquet") \
            .select("c_custkey", "c_mktsegment") \
            .withColumnRenamed("c_custkey", "o_custkey")
        try:
            write_bucketed(orders, "orders_b", ["o_custkey"], 8,
                           path=str(tmp_path / "ob"))
            write_bucketed(cust, "cust_b", ["o_custkey"], 8,
                           path=str(tmp_path / "cb"))
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = bucketed_join(spark, "orders_b", "cust_b", ["o_custkey"])
            p = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in p
            assert "Exchange" not in p, p
            # (Spark still inserts per-task Sorts unless each bucket is a
            # single file whose ordering it trusts — cheap, task-local,
            # and nothing like the shuffle this layout eliminates)
            # correctness: equals the plain join
            plain = orders.join(cust, "o_custkey")
            assert j.count() == plain.count()
            # bucket-local aggregation: groupBy on the bucket key also
            # needs no shuffle
            agg = spark.read.table("orders_b").groupBy("o_custkey").count()
            pa = agg._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in pa, pa
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS orders_b")
            spark.sql("DROP TABLE IF EXISTS cust_b")

    def test_partitioned_write_prunes_directories(self, spark, tmp_path):
        """partitionBy layout: a predicate on the partition key becomes a
        PartitionFilter — non-matching directories are never read."""
        from tsv_utils_spark.sources.buckets import write_partitioned

        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "lang", "n_chars")
        out = str(tmp_path / "docs_by_lang")
        write_partitioned(docs, out, ["lang"])
        scan = spark.read.parquet(out).where("lang = 'en'")
        p = scan._jdf.queryExecution().executedPlan().toString()
        pf = p.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "lang" in pf and "en" in pf, p
        # and the data filter list does NOT re-check lang (pruned, not
        # filtered)
        assert scan.count() == docs.where("lang = 'en'").count()

    def test_sketch_pipeline_shuffles_only_blobs(self, spark):
        from tsv_utils_spark.plans import SketchSpec, sketch_agg

        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        df = sketch_agg(li, ["l_returnflag"],
                        [SketchSpec("hll", "l_partkey", "uc")])
        p = df._jdf.queryExecution().executedPlan().toString()
        # one shuffle between level-1 partials and the level-2 merge
        assert p.count("Exchange hashpartitioning") == 1
        # the scan projects only the key + hashed input, not full rows
        schema = p.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
        assert "l_returnflag" in schema and "l_partkey" in schema
        assert "l_extendedprice" not in schema
