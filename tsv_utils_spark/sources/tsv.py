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
             schema=None, delimiter: str = "\t") -> DataFrame:
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
