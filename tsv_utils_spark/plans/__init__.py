from tsv_utils_spark.plans.agg import (
    SketchSpec,
    sketch_agg,
    sketch_partials,
    sketch_rollup,
)

__all__ = ["SketchSpec", "sketch_agg", "sketch_partials", "sketch_rollup"]
