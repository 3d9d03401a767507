"""tsv-filter parity: the predicate family as Catalyst Column expressions.

Reference: tsv-filter/src/tsv_utils/tsv-filter.d (predicate bodies
:292-380, option table :916-979, eval loop :1172-1189).

Every predicate is a pure Column expression — JVM-side, codegen'd,
pushdown-eligible. ``tsv_filter`` combines them with AND (default) or OR
(--or), supports --invert, and the three run modes filter|count|label
(tsv-filter.d:1061-1067).

The reference ABORTS the run when a numeric test hits a non-numeric value
(tsv-filter.d:194-197). Spark casts silently to NULL (row just fails the
test); ``strict_numeric`` restores abort semantics via a validation count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Predicates:
    """Builders mirroring tsv-filter's predicate families (file:line cited
    per group in tsv-filter.d)."""

    # empty / blank (:292-295)
    @staticmethod
    def empty(c): return F.col(c).isNull() | (F.col(c) == "")

    @staticmethod
    def not_empty(c): return ~Predicates.empty(c)

    @staticmethod
    def blank(c): return F.col(c).isNull() | F.col(c).rlike(r"^\s*$")

    @staticmethod
    def not_blank(c): return ~Predicates.blank(c)

    # numeric classification (:297-300)
    @staticmethod
    def is_numeric(c): return F.col(c).try_cast("double").isNotNull()

    @staticmethod
    def is_finite(c):
        d = F.col(c).try_cast("double")
        return d.isNotNull() & ~F.isnan(d) & (F.abs(d) != float("inf"))

    @staticmethod
    def is_nan(c): return F.isnan(F.col(c).try_cast("double"))

    @staticmethod
    def is_infinity(c): return F.abs(F.col(c).try_cast("double")) == float("inf")

    # numeric comparisons (:302-307)
    @staticmethod
    def num(c, op, v):
        d = F.col(c).try_cast("double")
        return _cmp(d, op, F.lit(float(v)))

    # string comparisons, byte-lexical (:309-314)
    @staticmethod
    def str_cmp(c, op, s):
        return _cmp(F.col(c), op, F.lit(s))

    # substring / case-insensitive (:315-323)
    @staticmethod
    def str_in_fld(c, s): return F.col(c).contains(s)

    @staticmethod
    def str_not_in_fld(c, s): return ~F.col(c).contains(s)

    @staticmethod
    def istr_eq(c, s): return F.lower(F.col(c)) == s.lower()

    @staticmethod
    def istr_ne(c, s): return F.lower(F.col(c)) != s.lower()

    @staticmethod
    def istr_in_fld(c, s): return F.lower(F.col(c)).contains(s.lower())

    @staticmethod
    def istr_not_in_fld(c, s): return ~F.lower(F.col(c)).contains(s.lower())

    # regex (:328-329)
    @staticmethod
    def regex(c, pattern): return F.col(c).rlike(pattern)

    @staticmethod
    def not_regex(c, pattern): return ~F.col(c).rlike(pattern)

    @staticmethod
    def iregex(c, pattern): return F.col(c).rlike(f"(?i){pattern}")

    @staticmethod
    def not_iregex(c, pattern): return ~F.col(c).rlike(f"(?i){pattern}")

    # length tests (:331-343). char_len uses code points — the reference
    # counts graphemes (documented divergence, SURVEY.md §7 risks).
    @staticmethod
    def char_len(c, op, n): return _cmp(F.char_length(F.col(c)), op, F.lit(n))

    @staticmethod
    def byte_len(c, op, n): return _cmp(F.octet_length(F.col(c)), op, F.lit(n))

    # field-vs-field (:345-360)
    @staticmethod
    def ff_num(c1, op, c2):
        return _cmp(F.col(c1).try_cast("double"), op, F.col(c2).try_cast("double"))

    @staticmethod
    def ff_str(c1, op, c2): return _cmp(F.col(c1), op, F.col(c2))

    @staticmethod
    def ff_istr_eq(c1, c2): return F.lower(F.col(c1)) == F.lower(F.col(c2))

    @staticmethod
    def ff_istr_ne(c1, c2): return F.lower(F.col(c1)) != F.lower(F.col(c2))

    # absolute / relative diff (:362-380)
    @staticmethod
    def ff_absdiff_le(c1, c2, v):
        return F.abs(F.col(c1).try_cast("double") - F.col(c2).try_cast("double")) <= v

    @staticmethod
    def ff_absdiff_gt(c1, c2, v):
        return F.abs(F.col(c1).try_cast("double") - F.col(c2).try_cast("double")) > v

    @staticmethod
    def ff_reldiff_le(c1, c2, v):
        a, b = F.col(c1).try_cast("double"), F.col(c2).try_cast("double")
        return (F.abs(a - b) / F.least(F.abs(a), F.abs(b))) <= v

    @staticmethod
    def ff_reldiff_gt(c1, c2, v):
        a, b = F.col(c1).try_cast("double"), F.col(c2).try_cast("double")
        return (F.abs(a - b) / F.least(F.abs(a), F.abs(b))) > v


_OPS = {
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
}


def _cmp(a: Column, op: str, b) -> Column:
    return _OPS[op](a, b)


def tsv_filter(df: DataFrame,
               predicates: list[Column],
               mode: str = "filter",
               disjunct: bool = False,
               invert: bool = False,
               label: str = "matched",
               label_values: tuple[str, str] = ("1", "0"),
               strict_numeric_cols: list[str] | None = None) -> DataFrame:
    """Apply tsv-filter semantics.

    mode: 'filter' -> matching rows; 'count' -> 1-row count of matches
    (--count, tsv-filter.d:1177-1179); 'label' -> all rows + label column
    (--label, :1181-1185). ``disjunct`` = --or, ``invert`` = --v.
    """
    if strict_numeric_cols:
        assert_numeric(df, strict_numeric_cols)
    combine = (lambda a, b: a | b) if disjunct else (lambda a, b: a & b)
    pred = reduce(combine, predicates)
    if invert:
        pred = ~pred
    if mode == "filter":
        return df.filter(pred)
    if mode == "count":
        return df.filter(pred).agg(F.count(F.lit(1)).alias("count"))
    if mode == "label":
        t, f_ = label_values
        return df.withColumn(label, F.when(pred, F.lit(t)).otherwise(F.lit(f_)))
    raise ValueError(f"bad mode {mode!r}")


def assert_numeric(df: DataFrame, cols: list[str]) -> None:
    """Strict-parse mode: abort (raise) if any non-empty value fails the
    numeric cast — the reference's behavior (tsv-filter.d:194-197,
    tsv-summarize.d:649-659). One distributed count over the scan."""
    bad = [F.sum(((F.col(c).isNotNull()) & (F.col(c).cast("string") != "") &
                  F.col(c).try_cast("double").isNull()).cast("long")).alias(c)
           for c in cols]
    row = df.agg(*bad).first()
    offenders = {c: row[c] for c in cols if row[c]}
    if offenders:
        raise ValueError(f"non-numeric values in numeric operator fields: {offenders}")
