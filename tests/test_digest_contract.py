"""The digest-substrate cross-engine contract (round 15).

Every content-addressed operator in this engine rides on a digest:
``row_hash`` (operators/reconcile.py) is md5(concat_ws(SEP, cols)),
the hash split / sampling family (operators/splits.py) keys on md5
prefixes, exact dedup groups on md5(text), and the multimodal payload
carries sha2(content, 256). A digest dialect here would be the
q_fuzzy_join class of bug (green-by-fixture, broken on the first
adversarial input), so the r15 probe ran every digest/codec pair
across Spark and DuckDB:

1. **md5(VARCHAR) AGREES byte-for-byte** — empty string, ASCII,
   multibyte UTF-8 (two-byte and three-byte sequences), separator
   control chars, 100-char strings; NULL -> NULL both. The
   md5∘concat_ws row-hash substrate composes identically (pinned
   below on a multibyte + CHR(1)-separator case). Both engines render
   LOWERCASE hex.
2. **sha2(s, 256) == sha256(s) AGREES** — including the empty string
   and UTF-8. Spark hashes the UTF-8 BYTES of a string (md5(str) ==
   md5(CAST(str AS BINARY))), DuckDB hashes the VARCHAR directly;
   they agree because DuckDB's VARCHAR is UTF-8 bytes.
3. **Binary substrate is Spark-only**: DuckDB's md5/sha256 are
   VARCHAR-only (BinderException on BLOB) in this build, and
   VARCHAR->BLOB conversion REJECTS non-ASCII, so an oracle can never
   hash a blob — graded plans hash binary payloads whose bytes ARE
   the UTF-8 text (q_multimodal_meta: sha2(encode(text), 256) vs
   oracle sha256(text)), which is exactly the agreeing surface.
4. **Spark-only functions**: sha1, crc32, sha2 widths 224/384/512,
   regexp-free xxhash64. ``xxhash64`` is ENGINE-INTERNAL — seeded 42
   with per-column type tagging, it matches neither standard XXH64
   (seed 0) nor DuckDB ``hash()`` — so it appears only in Spark-side
   checksums (bench.py actions), never in graded result columns.
5. **hex/unhex**: hex() renders UPPERCASE in both engines (strings,
   ints, two's-complement -1); unhex/from_hex LEFT-PADS odd-length
   input identically; INVALID hex is a dialect (Spark ansi-off NULL,
   DuckDB raises InvalidInputException).
6. **base64 is a dialect past 57 bytes**: Spark emits MIME chunking
   (CRLF every 76 chars), DuckDB's to_base64 is unchunked. Short
   inputs agree. No graded key emits base64 (census below guards
   this); the portable spelling would be replace(base64(x), '\\r\\n',
   '').

Probe provenance: /tmp/probe_digest_r15.py run 2026-08-16; SCALE.md
§22.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest


def _duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


CASES = ["", "abc", "hello world", "café", "中文", "a|b", "x" * 100]


def test_md5_varchar_agrees_and_matches_rfc(spark):
    """Spark == DuckDB == hashlib (the RFC 1321 ground truth) on the
    UTF-8 bytes, lowercase hex, for every case class."""
    con = _duck()
    for c in CASES:
        lit = c.replace("'", "''")
        s = spark.sql(f"SELECT md5('{lit}') AS h").collect()[0].h
        d = con.execute(f"SELECT md5('{lit}')").fetchone()[0]
        ref = hashlib.md5(c.encode("utf-8")).hexdigest()
        assert s == d == ref, (c, s, d, ref)


def test_md5_null_propagates_both(spark):
    con = _duck()
    assert spark.sql(
        "SELECT md5(CAST(NULL AS STRING)) AS h"
    ).collect()[0].h is None
    assert con.execute(
        "SELECT md5(CAST(NULL AS VARCHAR))"
    ).fetchone()[0] is None


def test_row_hash_substrate_composes_identically(spark):
    """md5(concat_ws(CHR(1), multibyte cols)) — the exact row_hash
    composition — agrees across engines."""
    con = _duck()
    s = spark.sql(
        "SELECT md5(concat_ws(char(1), 'café', '中')) AS h"
    ).collect()[0].h
    d = con.execute(
        "SELECT md5(concat_ws(chr(1), 'café', '中'))"
    ).fetchone()[0]
    ref = hashlib.md5("café\x01中".encode()).hexdigest()
    assert s == d == ref


def test_sha256_pair_agrees_and_string_equals_binary_substrate(spark):
    """sha2(s,256) == sha256(s); and Spark's string overload hashes
    the UTF-8 bytes (== hashing CAST(s AS BINARY)), which is why
    hashing a text-derived binary payload against a VARCHAR oracle is
    sound (q_multimodal_meta)."""
    con = _duck()
    for c in ("", "abc", "café"):
        s = spark.sql(
            f"SELECT sha2('{c}', 256) AS a,"
            f" sha2(CAST('{c}' AS BINARY), 256) AS b"
        ).collect()[0]
        d = con.execute(f"SELECT sha256('{c}')").fetchone()[0]
        ref = hashlib.sha256(c.encode("utf-8")).hexdigest()
        assert s.a == s.b == d == ref, (c, s, d)


def test_duckdb_digests_are_varchar_only(spark):
    """Discriminator: if DuckDB ever grows BLOB digest overloads,
    re-probe — until then no oracle can hash binary, and the graded
    binary-hash keys must stay on text-derived payloads."""
    con = _duck()
    for sql in ("SELECT md5('ab'::BLOB)", "SELECT sha256('ab'::BLOB)"):
        with pytest.raises(duckdb.BinderException):
            con.execute(sql)
    # ...and VARCHAR->BLOB itself rejects non-ASCII:
    with pytest.raises(duckdb.ConversionException):
        con.execute("SELECT 'café'::BLOB")
    # while Spark's binary overloads exist (used by q_multimodal_meta)
    row = spark.sql(
        "SELECT md5(CAST('ab' AS BINARY)) AS a, sha1('ab') AS b,"
        " crc32('ab') AS c"
    ).collect()[0]
    assert row.a == hashlib.md5(b"ab").hexdigest()
    assert row.b == hashlib.sha1(b"ab").hexdigest()


def test_xxhash64_is_engine_internal(spark):
    """Spark's xxhash64 (seed 42, type-tagged multi-column fold) is
    NOT standard XXH64(seed 0) and not DuckDB hash() — pinned so
    nobody reaches for it as a cross-engine channel. It stays in
    Spark-side checksums only (bench.py's action)."""
    con = _duck()
    s = spark.sql("SELECT xxhash64('abc') AS h").collect()[0].h
    d = con.execute("SELECT hash('abc')").fetchone()[0]
    std = 4952883123889572249  # xxhash.xxh64('abc', seed=0)
    assert s != std and s != d
    # stable within Spark (a seeded deterministic function):
    s2 = spark.sql("SELECT xxhash64('abc') AS h").collect()[0].h
    assert s == s2 == 1423657621850124518


def test_hex_uppercase_and_unhex_padding_agree(spark):
    con = _duck()
    s = spark.sql(
        "SELECT hex('koála') AS a, hex(255) AS b,"
        " hex(CAST(-1 AS BIGINT)) AS c,"
        " CAST(unhex('4D7953514C') AS STRING) AS d, unhex('ABC') AS e"
    ).collect()[0]
    d = con.execute(
        "SELECT hex('koála'), hex(255), hex(CAST(-1 AS BIGINT)),"
        " CAST(from_hex('4D7953514C') AS VARCHAR), from_hex('ABC')"
    ).fetchone()
    assert (s.a, s.b, s.c, s.d) == (d[0], d[1], d[2], d[3])
    assert s.a == "6B6FC3A16C61"          # uppercase hex digits
    assert bytes(s.e) == bytes(d[4]) == b"\x0a\xbc"  # odd-length left-pad


def test_invalid_hex_is_a_dialect(spark):
    """Spark (ansi off) -> NULL; DuckDB raises. Same class as the
    r14 non-finite->DECIMAL boundary: permissive-NULL vs raise."""
    con = _duck()
    assert spark.sql("SELECT unhex('zz') AS h").collect()[0].h is None
    with pytest.raises(duckdb.InvalidInputException):
        con.execute("SELECT from_hex('zz')")


def test_base64_mime_chunking_is_a_dialect(spark):
    """Spark base64 inserts CRLF every 76 output chars (MIME); DuckDB
    to_base64 never chunks. <=57-byte inputs (76 output chars) agree;
    the portable spelling strips CRLF."""
    con = _duck()
    short_s = spark.sql("SELECT base64('ab') AS h").collect()[0].h
    short_d = con.execute("SELECT to_base64('ab'::BLOB)").fetchone()[0]
    assert short_s == short_d == "YWI="
    long = "a" * 100
    ls = spark.sql(f"SELECT base64('{long}') AS h").collect()[0].h
    ld = con.execute(f"SELECT to_base64('{long}'::BLOB)").fetchone()[0]
    assert "\r\n" in ls and "\r\n" not in ld
    assert ls.replace("\r\n", "") == ld  # the portable spelling


def test_no_graded_key_emits_base64_or_engine_hash(spark):
    """Census guard: base64 and xxhash64 must not appear in any
    registered oracle (they're dialect/engine-internal). Source-level
    scan over the oracle SQL registry."""
    from pipeline_airflow_docker_spark import plans  # noqa: PLC0415

    for key, sql in plans.ORACLES.items():
        low = sql.lower()
        assert "base64" not in low, key
        assert "xxhash64" not in low, key
