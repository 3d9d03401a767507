from tsv_utils_spark.functions.missing import MissingPolicy
from tsv_utils_spark.functions.fieldlist import resolve_fields

__all__ = ["MissingPolicy", "resolve_fields"]
