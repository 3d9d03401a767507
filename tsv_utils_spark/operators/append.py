"""tsv-append parity: header-aware concat with source tracking.

Reference: tsv-append/src/tsv_utils/tsv-append.d:56-130 — concatenates
files keeping one header, optional --t|track-source column carrying the
file name (or --f source=name alias).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_tables(tables: list[tuple[str, DataFrame]] | list[DataFrame],
                  track_source: bool = False,
                  source_col: str = "source") -> DataFrame:
    """Union by name; with track_source, prepend a source label column
    (the named variant of --t)."""
    if not tables:
        raise ValueError("no tables")
    norm = []
    for i, t in enumerate(tables):
        name, df = t if isinstance(t, tuple) else (f"t{i}", t)
        if track_source:
            df = df.select(F.lit(name).alias(source_col), "*")
        norm.append(df)
    out = norm[0]
    for df in norm[1:]:
        out = out.unionByName(df)
    return out
