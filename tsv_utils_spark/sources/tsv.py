"""TSV/CSV sources and sinks with the reference's format semantics.

- ``read_tsv``   — the reference's native format: TAB-delimited, no
                   quoting/escaping AT ALL (utils.d bufferedByLine just
                   splits on the delimiter), first line optionally header.
                   So: quote handling is disabled (quote='') — a quote
                   char is data, exactly like tsv-utils.
- ``csv_to_tsv_df`` — csv2tsv semantics (csv2tsv.d:429-640): RFC-4180
                   quotes/escapes honored on read, then TAB/CR/LF inside
                   fields replaced by a space so the output is valid TSV.
- ``write_tsv``  — TAB-separated, no quoting, header on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_tsv(spark: SparkSession, path: str, header: bool = True,
             schema=None, delimiter: str = "\t",
             fast: bool = True) -> DataFrame:
    """Read tsv-utils-format TSV: TAB-delimited, NO quoting/escaping.

    ``fast=True`` (default) models the format exactly as the reference
    does (utils.d bufferedByLine: split each line on the delimiter,
    nothing else): ``spark.read.text`` + a JVM-side split — measured
    ~1.4x the univocity CSV reader per core, and semantically tighter
    (quotes are data, never parsed). Header lines are removed by exact
    match, which also drops repeated headers in multi-file inputs (the
    same rule tsv-append applies). ``schema`` supplies names and
    per-field try_cast types; otherwise the header names all-string
    columns. ``fast=False`` falls back to the CSV reader with quoting
    disabled."""
    if fast:
        txt = spark.read.text(path)
        hdr_line = None
        if header:
            first = txt.limit(1).collect()
            hdr_line = first[0]["value"] if first else None
        if schema is not None:
            fields = list(schema.fields)
        elif hdr_line is not None:
            from pyspark.sql import types as T

            fields = [T.StructField(n, T.StringType())
                      for n in hdr_line.split(delimiter)]
        else:
            raise ValueError("read_tsv needs header=True or a schema")
        if hdr_line is not None:
            txt = txt.where(F.col("value") != hdr_line)
        # keep the pattern a bare literal where possible: Spark's split
        # fast-paths simple patterns, and \Q..\E quoting forces the full
        # regex engine (measured 2.3x slower on a TAB split)
        meta = ".\\[]{}()*+?^$|"
        pattern = "".join(("\\" + c) if c in meta else c for c in delimiter)
        parts = F.split(F.col("value"), pattern, -1)
        cols = [parts.getItem(i).try_cast(f.dataType).alias(f.name)
                for i, f in enumerate(fields)]
        return txt.select(*cols)
    r = (spark.read
         .option("sep", delimiter)
         .option("header", header)
         .option("quote", "")        # no quote handling: quotes are data
         .option("inferSchema", False))
    if schema is not None:
        r = r.schema(schema)
    return r.csv(path)


def csv_to_tsv_df(spark: SparkSession, path: str, header: bool = True,
                  replacement: str = " ",
                  multiline: bool = True) -> DataFrame:
    """Read RFC-ish CSV and normalize every string cell to TSV-safe form
    (TAB/CR/LF -> ``replacement``), mirroring csv2tsv's state machine
    outcome (csv2tsv.d:505-640) declaratively.

    ``multiline=True`` (default) honors quoted embedded newlines like the
    reference always does — but makes files unsplittable (one task per
    file) and engages the slower parser. Pass ``multiline=False`` when
    the data is known newline-free: files split across tasks and the
    fast univocity path applies (~2x per core, parallel ingest).
    """
    df = (spark.read
          .option("header", header)
          .option("multiLine", multiline)
          .option("quote", '"')
          .option("escape", '"')
          .option("inferSchema", False)
          .csv(path))
    cleaned = [F.regexp_replace(F.col(c), "[\t\r\n]", replacement).alias(c)
               for c in df.columns]
    return df.select(*cleaned)


def write_tsv(df: DataFrame, path: str, header: bool = True,
              delimiter: str = "\t", single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    (out.write.mode("overwrite")
        .option("sep", delimiter)
        .option("header", header)
        .option("quote", "")
        .option("emptyValue", "")
        .csv(path))
