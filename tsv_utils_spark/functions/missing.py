"""Missing-value policy mirroring the reference's MissingFieldPolicy
(tsv-summarize/src/tsv_utils/tsv-summarize.d:1994-2036).

The reference's missing value is the EMPTY STRING (its data model has no
NULL). In Spark we honor both '' and NULL as "missing" so the policy works
over typed parquet columns too.

Three behaviors:
- ``use`` (default): missing values participate as-is.
- ``exclude``: drop missing values from the calculation
  (``--x|exclude-missing``).
- ``replace``: substitute ``replacement`` (``--r|replace-missing STR``).

``--missing-count``/``--not-missing-count`` ignore the policy by design
(tsv-summarize.d:3863-3870) — summarize() handles that exception.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MissingPolicy:
    mode: str = "use"          # use | exclude | replace
    replacement: str = ""

    def __post_init__(self):
        if self.mode not in ("use", "exclude", "replace"):
            raise ValueError(f"bad missing-policy mode: {self.mode}")

    @staticmethod
    def is_missing(col: Column) -> Column:
        return col.isNull() | (col.cast("string") == F.lit(""))

    def apply(self, col: Column) -> Column:
        """Column with the policy applied: excluded values become NULL
        (Spark aggregates skip NULLs — the exact analogue of the
        reference's 'drop from calculation')."""
        if self.mode == "use":
            return col
        if self.mode == "exclude":
            return F.when(~self.is_missing(col), col)
        return F.when(~self.is_missing(col), col).otherwise(F.lit(self.replacement))


USE = MissingPolicy("use")
EXCLUDE = MissingPolicy("exclude")
