"""JSONL (newline-delimited JSON) source/sink — the interchange format
of web-scale document corpora (Common Crawl derivatives, HF datasets
exports ship as ``.jsonl``/``.jsonl.gz``).

Scale notes baked into the API:

- JSONL is LINE-splittable: Spark scans a 100 TB corpus in parallel
  splits exactly like TSV. ``multiline=True`` (a single JSON array /
  pretty-printed objects) is NOT splittable — one task per file — so it
  is a separate opt-in, mirroring the CSV reader's multiline trap.
- Schema inference costs an extra full scan and can mis-type sparse
  fields (a column that is null in the sampled files infers as string).
  ``read_jsonl`` therefore takes an explicit schema for production
  paths; inference is the convenience fallback.
- Spark's JSON writer drops null fields by default
  (``ignoreNullFields=true``) — a write/read roundtrip silently turns
  explicit nulls into absent keys, and schemaless re-readers then
  infer different shapes per file. ``write_jsonl`` defaults to KEEPING
  null fields so roundtrips are lossless; pass
  ``ignore_null_fields=True`` for the compact crawl-style output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jsonl(spark: SparkSession, path: str, schema=None,
               mode: str = "PERMISSIVE",
               corrupt_col: str | None = None,
               multiline: bool = False) -> DataFrame:
    """Read newline-delimited JSON.

    ``mode``: PERMISSIVE (bad rows -> nulls, optionally captured in
    ``corrupt_col``), DROPMALFORMED, or FAILFAST — the same malformed-
    record policy surface as the TSV/CSV readers. ``corrupt_col`` adds
    a string column holding each unparseable line (PERMISSIVE only);
    with an explicit ``schema`` the column is appended automatically.
    """
    reader = spark.read.option("mode", mode)
    if multiline:
        reader = reader.option("multiLine", True)
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        if schema is not None:
            from pyspark.sql.types import StringType, StructType

            if isinstance(schema, StructType) \
                    and corrupt_col not in schema.fieldNames():
                schema = StructType(schema.fields).add(corrupt_col,
                                                       StringType())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = None,
                ignore_null_fields: bool = False) -> None:
    """Write as JSONL, one object per row. Null fields are KEPT by
    default (lossless roundtrip — see module docstring); set
    ``ignore_null_fields=True`` for compact output. ``compression``:
    e.g. ``gzip``, ``zstd`` (splittability is lost for gzip)."""
    w = df.write.mode(mode) \
        .option("ignoreNullFields", "true" if ignore_null_fields
                else "false")
    if compression is not None:
        w = w.option("compression", compression)
    w.json(path)
