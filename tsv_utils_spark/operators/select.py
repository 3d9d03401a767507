"""tsv-select parity: projection / reorder / duplicate / exclude / rest.

Reference: tsv-select/src/tsv_utils/tsv-select.d:450-607 with the
field-list language of common/fieldlist.d. Pure projection — Catalyst
column pruning pushes it into the parquet scan (ReadSchema), which is the
principled version of the reference's early-terminate line splitting
(tsv-select.d:530).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsv_utils_spark.functions.fieldlist import resolve_fields


def select_fields(df: DataFrame,
                  fields,
                  exclude: bool = False,
                  rest: str | None = None) -> DataFrame:
    """fields: list of names / 1-based numbers / wildcards / ranges
    (reversed ok, duplicates ok). ``exclude`` = --e; ``rest`` = --r
    'first'|'last' places unmentioned columns before/after.
    """
    picked = resolve_fields(df.columns, fields)
    if exclude:
        keep = [c for c in df.columns if c not in set(picked)]
        return df.select(*keep)
    remaining = [c for c in df.columns if c not in set(picked)]
    if rest == "first":
        order = remaining + picked
    elif rest == "last":
        order = picked + remaining
    elif rest is None:
        order = picked
    else:
        raise ValueError("rest must be 'first'|'last'|None")
    # duplicates must survive (tsv-select allows duplication) -> alias copies
    seen: dict[str, int] = {}
    cols = []
    for c in order:
        k = seen.get(c, 0)
        cols.append(F.col(c) if k == 0 else F.col(c).alias(f"{c}_{k}"))
        seen[c] = k + 1
    return df.select(*cols)
