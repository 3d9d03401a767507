from tsv_utils_spark.streaming.sketch_stream import streaming_sketch_agg

__all__ = ["streaming_sketch_agg"]
