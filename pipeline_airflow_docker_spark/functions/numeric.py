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
    most 2 fractional digits; scale=4 leaves headroom for products).

    Input domain: FINITE doubles within the decimal's range. Outside
    it the engines split (r14 probe, pinned in
    tests/test_numrender_contract.py): Spark (ansi off) renders
    NaN/Inf/overflow as silent NULL — so a SUM quietly skips them —
    while DuckDB's CAST raises, and even TRY_CAST raises on NaN
    (overflow it does NULL). Feed this only columns whose non-finite
    values have been filtered or quarantined (B44's tolerant-cast
    path is the front door for dirty numerics)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a double column: exact decimal sum,
    returned as double."""
    return F.sum(dec(col, 18, scale)).cast("double")


def portable_double_repr(col: Column | str) -> Column:
    """Bit-exact, injective, engine-portable string form of a DOUBLE.

    Every decimal route diverges across engines (r13 probe battery,
    tests/test_numrender_contract.py):

    - native ``CAST(double AS STRING)``: Spark renders Java's
      ``Double.toString`` (``1.0E7``, ``Infinity``), DuckDB C-style
      shortest (``10000000.0``, ``inf``) — different sci-notation
      thresholds, exponent spellings, special spellings;
    - ``printf('%.17e')``: Java formats from the SHORTEST decimal
      repr zero-padded, C from the true binary expansion
      (``0.1`` -> ``...000e-01`` vs ``...006e-01``);
    - ``CAST(double AS DECIMAL(38,12))``: Spark quantizes via the
      shortest-repr digits, DuckDB via the exact binary value —
      733/840 of the probe battery diverged.

    The one shared exact channel is C99 hex-float ``%a``: the IEEE-754
    bits verbatim, no binary->decimal conversion anywhere. Java 17 and
    DuckDB(fmt) disagree only cosmetically — Java writes ``0x1.0p0``
    and bare exponents, C writes ``0x1p+0`` — so two regexes normalize
    Java's spelling to C's:

    1. ``.0p`` -> ``p``   (both trim trailing mantissa zeros, but Java
       keeps one ``.0`` digit when the fraction is empty; a trimmed
       fraction otherwise never ends in ``0``, so the pattern is
       unambiguous);
    2. ``p<digit>`` -> ``p+<digit>`` (Java omits the ``+`` on
       non-negative exponents).

    Specials map to C's spellings (``nan``/``inf``/``-inf``); NULL
    stays NULL; ``-0.0`` keeps its sign bit (``-0x0p+0``), so the
    mapping is injective on the full binary64 value space. FLOAT
    inputs widen exactly. The DuckDB twin is
    :func:`oracle_double_repr`; the pinned battery + 20k random bit
    patterns run both sides in tests/test_numrender_contract.py.
    """
    c = F.col(col) if isinstance(col, str) else col
    v = c.cast("double")
    norm = F.regexp_replace(
        F.regexp_replace(F.format_string("%a", v), r"\.0p", "p"),
        r"p(\d)",
        r"p+$1",
    )
    return (
        # explicit NULL guard: Java's Formatter renders a null argument
        # as the STRING 'null' — format_string does not propagate NULL
        F.when(v.isNull(), F.lit(None).cast("string"))
        .when(F.isnan(v), F.lit("nan"))
        .when(v == F.lit(float("inf")), F.lit("inf"))
        .when(v == F.lit(float("-inf")), F.lit("-inf"))
        .otherwise(norm)
    )


def oracle_double_repr(expr: str) -> str:
    """DuckDB twin of :func:`portable_double_repr` — C's ``%a`` is
    already the canonical spelling (specials included: ``printf``
    renders ``nan``/``inf``/``-inf``; NULL propagates)."""
    return f"printf('%a', CAST({expr} AS DOUBLE))"


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum divided by count as a
    double division (identical operands => identical result in any
    IEEE-754 engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, 18, scale)).cast("double") / F.count(c)
