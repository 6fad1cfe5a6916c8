"""PII redaction — a standard pre-training scrub pass.

Regex-only (emails, SSN-shaped ids, IPv4, phone-shaped numbers): the
heuristic tier every corpus pipeline runs before any model-based PII
pass. All patterns are JVM-side ``regexp_replace`` — map-side, no
shuffle, no Python.

Application order is fixed (email -> ssn -> ipv4 -> phone): the phone
pattern is greedy about digit runs and must come last so it cannot eat
the digits of an already-matched SSN/IP.

Cross-engine contract (r12 probe findings — the DuckDB oracle replays
this chain, and the naive "common subset" spelling silently diverged
in two root-cause classes, the first with two observed manifestations
— non-ASCII letters AND non-ASCII digits both count as Java word
chars):

- **Word boundaries are ASCII**: a boundary is a transition to/from
  ``[0-9A-Za-z_]``. Java's bare ``\\b`` is Unicode-aware (``é``,
  fullwidth ``１``, Devanagari ``०`` count as word chars) while RE2's
  is ASCII — ``é123-45-6789`` redacted as ``é<PHONE>`` on Spark but
  ``é<SSN>`` on DuckDB. The contract pins the ASCII semantic: the
  JAVA_ spellings use zero-width ASCII lookarounds (Java has
  lookaround, RE2 doesn't), the RE2_ spellings use RE2's ``\\b``,
  which is exactly the ASCII boundary. ASCII is also the better scrub
  semantic: ``numéro123-45-6789`` in French text IS an SSN leak.
- **Whitespace is the explicit Java set** ``[\\t\\n\\x0B\\f\\r ]``:
  Java ``\\s`` includes vertical tab, RE2's doesn't, so a phone run
  broken by ``\\x0B`` redacted on Spark only. Both spellings now name
  the class explicitly.

tests/test_redact_contract.py pins the probe battery side-by-side in
both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The explicit Java-\s whitespace class, valid verbatim in both engines.
_WS = r"[\t\n\x0B\f\r ]"
# ASCII word-boundary context, two spellings of one semantic (above).
_JB_L, _JB_R = r"(?<![0-9A-Za-z_])", r"(?![0-9A-Za-z_])"

_SSN_CORE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
_IPV4_CORE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

# (name, java_pattern, re2_pattern) in application order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    ),
    ("ssn", _JB_L + _SSN_CORE + _JB_R, r"\b" + _SSN_CORE + r"\b"),
    ("ipv4", _JB_L + _IPV4_CORE + _JB_R, r"\b" + _IPV4_CORE + r"\b"),
    (
        "phone",
        r"\+?[0-9][0-9()" + _WS[1:-1] + r".-]{6,}[0-9]",
        r"\+?[0-9][0-9()" + _WS[1:-1] + r".-]{6,}[0-9]",
    ),
)


def redact_expr(text: Column) -> Column:
    """The chained replacement as a column expression."""
    out = text
    for name, java_pattern, _ in PII_PATTERNS:
        out = F.regexp_replace(out, java_pattern, f"<{name.upper()}>")
    return out


def oracle_redact_sql(col: str) -> str:
    """The identical chain in RE2 spelling, for DuckDB oracles — the
    single source of truth the graded oracle interpolates."""
    out = col
    for name, _, re2_pattern in PII_PATTERNS:
        lit = re2_pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{lit}', '<{name.upper()}>', 'g')"
    return out


def pii_token_alternation() -> str:
    """``<EMAIL>|<SSN>|<IPV4>|<PHONE>`` derived from ``PII_PATTERNS`` —
    the single source of truth for counting replacement tokens. Both
    the engine-side count and the graded oracle interpolate THIS, so
    adding a pattern to the table can never desync them (it would
    otherwise surface only as a confusing parity-count mismatch). The
    literal tokens contain no regex metacharacters, so the same string
    is valid in Java regex and RE2."""
    return "|".join(f"<{name.upper()}>" for name, _, _ in PII_PATTERNS)


def pii_count_expr(text: Column) -> Column:
    """Spans actually redacted: replacement tokens counted in the
    final text. Counting patterns on the original text instead would
    double-count (an IPv4 or SSN is also a phone-shaped digit run —
    but only one replacement happens because earlier patterns consume
    the span first). A source text already containing a literal
    ``<EMAIL>``-style token would inflate the count; acceptable for a
    heuristic scrub metric."""
    return F.regexp_count(
        redact_expr(text), F.lit(pii_token_alternation())
    ).cast("int")


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
