"""Deterministic numeric aggregation helpers.

Floating-point addition is not associative; Spark and DuckDB (and any
two cluster runs with different partitionings) aggregate doubles in
different orders, so ``SUM(double)`` is not reproducible bit-for-bit.
Every money/measure aggregate in this engine therefore sums in exact
DECIMAL and casts the final value back to double — reproducible across
engines, partition counts, and cluster sizes, which also makes results
stable under AQE re-planning at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Cast to exact decimal (input doubles in the test tables carry at
    most 2 fractional digits; scale=4 leaves headroom for products)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a double column: exact decimal sum,
    returned as double."""
    return F.sum(dec(col, 18, scale)).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum divided by count as a
    double division (identical operands => identical result in any
    IEEE-754 engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, 18, scale)).cast("double") / F.count(c)
