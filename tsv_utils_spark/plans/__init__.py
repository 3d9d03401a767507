from tsv_utils_spark.plans.agg import (
    SketchSpec,
    sketch_agg,
    sketch_partials,
    sketch_rollup,
)
from tsv_utils_spark.plans.setops import theta_pairwise

__all__ = ["SketchSpec", "sketch_agg", "sketch_partials", "sketch_rollup",
           "theta_pairwise"]
