from tsv_utils_spark.operators.summarize import Op, summarize
from tsv_utils_spark.operators.filter import Predicates, tsv_filter
from tsv_utils_spark.operators.join import join_filter
from tsv_utils_spark.operators.uniq import uniq
from tsv_utils_spark.operators.sample import sample
from tsv_utils_spark.operators.select import select_fields
from tsv_utils_spark.operators.split import split_by_key, split_random
from tsv_utils_spark.operators.append import append_tables

__all__ = [
    "Op", "summarize", "Predicates", "tsv_filter", "join_filter", "uniq",
    "sample", "select_fields", "split_by_key", "split_random", "append_tables",
]
