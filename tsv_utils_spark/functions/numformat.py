"""Number formatting mirroring the reference's output rules.

formatNumber (common/src/tsv_utils/common/numerics.d:44-143): calculated
floats print with (default) 12 significant digits; values that are
integral print WITHOUT a decimal point or exponent; nan/inf pass through.

Provided as a Catalyst expression builder (JVM-side, for TSV export
parity) and a plain Python helper (for driver-side rendering/tests).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_number_ref(value: float, digits: int = 12) -> str:
    """Python twin of the reference's formatNumber."""
    if value is None or (isinstance(value, float) and math.isnan(value)):
        return "nan"
    if isinstance(value, float) and math.isinf(value):
        return "inf" if value > 0 else "-inf"
    if float(value) == int(value) and abs(value) < 1e15:
        return str(int(value))
    return f"{value:.{digits}g}"


def format_number_expr(col: Column, digits: int = 12) -> Column:
    """Catalyst expression with the same semantics (for write paths)."""
    d = col.try_cast("double")
    integral = (d == F.floor(d)) & (F.abs(d) < 1e15)
    as_int = F.floor(d).cast("long").cast("string")
    # %.12g via format_string (JVM printf supports %g)
    as_g = F.format_string(f"%.{digits}g", d)
    # strip trailing zeros of %g's fixed form (Java %g keeps them)
    trimmed = F.regexp_replace(
        F.regexp_replace(as_g, r"(\.\d*?)0+($|e)", r"$1$2"),
        r"\.($|e)", r"$1")
    return (F.when(d.isNull(), F.lit(None))
             .when(F.isnan(d), F.lit("nan"))
             .when(d == float("inf"), F.lit("inf"))
             .when(d == float("-inf"), F.lit("-inf"))
             .when(integral, as_int)
             .otherwise(trimmed))
