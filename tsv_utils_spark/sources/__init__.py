from tsv_utils_spark.sources.codegen import synthesize_source_code_table
from tsv_utils_spark.sources.tables import read_table
from tsv_utils_spark.sources.tsv import (
    csv_to_tsv_df,
    read_csv_multiline_parallel,
    read_tsv,
    write_tsv,
)
from tsv_utils_spark.sources.buckets import (
    bucketed_join,
    read_bucketed,
    write_bucketed,
    write_partitioned,
)

__all__ = ["synthesize_source_code_table", "read_table", "read_tsv",
           "write_tsv", "csv_to_tsv_df", "read_csv_multiline_parallel",
           "write_bucketed", "read_bucketed",
           "bucketed_join", "write_partitioned"]
