from tsv_utils_spark.operators.summarize import Op, summarize
from tsv_utils_spark.operators.filter import Predicates, tsv_filter
from tsv_utils_spark.operators.join import join_filter
from tsv_utils_spark.operators.uniq import uniq
from tsv_utils_spark.operators.sample import (
    mixture_sample,
    sample,
    sample_to_budget,
    stratified_sample,
)
from tsv_utils_spark.operators.select import select_fields
from tsv_utils_spark.operators.split import split_by_key, split_random
from tsv_utils_spark.operators.append import append_tables
from tsv_utils_spark.operators.importance import dsir_scores, dsir_select
from tsv_utils_spark.operators.dedup import (
    decontaminate,
    exact_dedup,
    minhash_dedup,
    ngram_contamination,
    simhash_dedup,
)
from tsv_utils_spark.operators.join import bloom_anti_join, bloom_semi_join, salted_join
from tsv_utils_spark.operators.pack import pack_segments, pack_sequences, running_total
from tsv_utils_spark.operators.text import (
    analyze,
    compression_ratio,
    extract_urls,
    gopher_quality,
    remove_boilerplate_lines,
    scrub_pii,
    token_frequency_stats,
    top_ngram_stats,
)
from tsv_utils_spark.operators.timeseries import (
    asof_join,
    range_join,
    session_stats,
    sessionize,
    windowed_agg,
)
from tsv_utils_spark.operators.multimodal import (
    audio_features,
    image_features,
    resize_images,
)

__all__ = [
    "Op", "summarize", "Predicates", "tsv_filter", "join_filter", "uniq",
    "sample", "sample_to_budget", "stratified_sample", "mixture_sample", "select_fields", "split_by_key", "split_random", "append_tables",
    "dsir_scores", "dsir_select",
    "exact_dedup", "minhash_dedup", "simhash_dedup", "decontaminate",
    "ngram_contamination", "running_total", "pack_sequences", "pack_segments",
    "bloom_semi_join", "bloom_anti_join", "salted_join",
    "analyze", "gopher_quality", "top_ngram_stats", "scrub_pii",
    "extract_urls", "compression_ratio", "remove_boilerplate_lines",
    "token_frequency_stats",
    "sessionize", "session_stats", "windowed_agg",
    "asof_join", "range_join",
    "image_features", "audio_features", "resize_images",
]
