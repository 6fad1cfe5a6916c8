"""PII redaction — a standard pre-training scrub pass.

Regex-only (emails, SSN-shaped ids, IPv4, phone-shaped numbers): the
heuristic tier every corpus pipeline runs before any model-based PII
pass. All patterns are JVM-side ``regexp_replace`` — map-side, no
shuffle, no Python — and are written in the common subset of Java
regex and RE2 so the DuckDB oracle replays them byte-identically.

Application order is fixed (email -> ssn -> ipv4 -> phone): the phone
pattern is greedy about digit runs and must come last so it cannot eat
the digits of an already-matched SSN/IP.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern) in application order. Common Java-regex/RE2 subset:
# no lookarounds, no backrefs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9][0-9()\s.-]{6,}[0-9]"),
)


def redact_expr(text: Column) -> Column:
    """The chained replacement as a column expression."""
    out = text
    for name, pattern in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, f"<{name.upper()}>")
    return out


def pii_count_expr(text: Column) -> Column:
    """Spans actually redacted: replacement tokens counted in the
    final text. Counting patterns on the original text instead would
    double-count (an IPv4 or SSN is also a phone-shaped digit run —
    but only one replacement happens because earlier patterns consume
    the span first). A source text already containing a literal
    ``<EMAIL>``-style token would inflate the count; acceptable for a
    heuristic scrub metric."""
    token_alt = "|".join(f"<{name.upper()}>" for name, _ in PII_PATTERNS)
    return F.regexp_count(redact_expr(text), F.lit(token_alt)).cast("int")


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace PII spans with ``<EMAIL>``/``<SSN>``/``<IPV4>``/``<PHONE>``
    tokens and add an ``n_pii`` hit count. ``out_col`` defaults to
    replacing ``text_col`` in place."""
    out_col = out_col or text_col
    text = F.col(text_col)
    return df.withColumn("n_pii", pii_count_expr(text)).withColumn(
        out_col, redact_expr(text)
    )
