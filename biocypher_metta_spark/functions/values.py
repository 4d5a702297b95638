"""Scalar value coercions.

py_to_float: exact twin of helpers.py:92-115 to_float — float() with
magnitude clamped to 1e±307 (ArangoDB 64-bit safety) and ±inf mapped to
1e307 / 1e-307 (reference maps -inf to *positive* 1e-307; quirk preserved).
"""

from __future__ import annotations

from math import floor, isinf, log10

from pyspark.sql import Column
from pyspark.sql import functions as F


def py_to_float(s) -> float:
    MAX_EXPONENT = 307
    number = float(s)
    if number == 0:
        return number
    if isinf(number) and number > 0:
        return float("1e307")
    if isinf(number) and number < 0:
        return float("1e-307")
    base10 = log10(abs(number))
    exponent = floor(base10)
    if abs(exponent) > MAX_EXPONENT:
        if exponent < 0:
            number = number * float(f"1e{abs(exponent) - MAX_EXPONENT}")
        else:
            number = number / float(f"1e{abs(exponent) - MAX_EXPONENT}")
    return number


def to_float_col(col: Column) -> Column:
    """Column version: cast to double with the 1e±307 clamp. Stays JVM-side
    (least/greatest) — the clamp only engages beyond double's practical
    data range, so plain casts dominate the plan."""
    d = col.cast("double")
    clamped = F.least(F.greatest(d, F.lit(-1e307)), F.lit(1e307))
    # reference maps +inf -> 1e307 and -inf -> 1e-307 (helpers.py:100-104)
    return (
        F.when(d == F.lit(float("inf")), F.lit(1e307))
        .when(d == F.lit(float("-inf")), F.lit(1e-307))
        .otherwise(clamped)
    )
