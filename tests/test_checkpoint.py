"""Checkpoint/resume: crash between epochs, resume, estimates identical to
the single-shot job; lineage + metrics recorded."""

from __future__ import annotations

import pytest

from tsv_utils_spark.plans import SketchSpec, sketch_agg
from tsv_utils_spark.plans.checkpoint import (
    completed_epochs,
    read_metrics,
    sketch_agg_checkpointed,
)

SPECS = [SketchSpec("hll", "l_partkey", "uc"),
         SketchSpec("kll", "l_quantity", "q50", {"quantiles": [0.5]})]


class TestCheckpoint:
    def test_crash_and_resume(self, tables, tmp_path):
        li = tables["lineitem"]
        ckpt = str(tmp_path / "ckpt")

        # "crash": only epochs 0 and 1 of 4 complete
        with pytest.raises(RuntimeError, match="resume"):
            sketch_agg_checkpointed(li, ["l_returnflag"], SPECS, ckpt,
                                    epochs=4, _run_epochs=[0, 1])
        assert completed_epochs(ckpt) == {0, 1}

        # resume: remaining epochs computed, nothing recomputed
        out = sketch_agg_checkpointed(li, ["l_returnflag"], SPECS, ckpt,
                                      epochs=4) \
            .toPandas().set_index("l_returnflag").sort_index()
        assert completed_epochs(ckpt) == {0, 1, 2, 3}
        metrics = read_metrics(ckpt)
        assert sorted(m["epoch"] for m in metrics) == [0, 1, 2, 3]
        assert all(m["rows_per_sec"] > 0 for m in metrics)
        total_rows = sum(m["rows"] for m in metrics)
        assert total_rows == li.count()  # every row in exactly one epoch

        # estimates identical to the non-checkpointed job (associativity)
        direct = sketch_agg(li, ["l_returnflag"], SPECS) \
            .toPandas().set_index("l_returnflag").sort_index()
        assert (out["uc"] == direct["uc"]).all()  # HLL sparse: exact match

    def test_second_call_skips_everything(self, tables, tmp_path):
        li = tables["lineitem"]
        ckpt = str(tmp_path / "ckpt2")
        sketch_agg_checkpointed(li, ["l_linestatus"], SPECS[:1], ckpt,
                                epochs=2).collect()
        n_metrics = len(read_metrics(ckpt))
        sketch_agg_checkpointed(li, ["l_linestatus"], SPECS[:1], ckpt,
                                epochs=2).collect()
        # no new epochs were computed on the second call
        assert len(read_metrics(ckpt)) == n_metrics

    def test_lineage_columns_present(self, tables, tmp_path, spark):
        li = tables["lineitem"]
        ckpt = str(tmp_path / "ckpt3")
        sketch_agg_checkpointed(li, ["l_returnflag"], SPECS[:1], ckpt,
                                epochs=2).collect()
        partials = spark.read.parquet(f"{ckpt}/partials")
        cols = set(partials.columns)
        assert {"epoch", "partition_id", "__rows", "__blob_0"} <= cols
