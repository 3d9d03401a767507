from tsv_utils_spark.plans.agg import SketchSpec, sketch_agg

__all__ = ["SketchSpec", "sketch_agg"]
