"""Cross-engine deterministic text primitives.

Dedup/fingerprint operators need hash values that are *reproducible
across engines and cluster runs* — the DuckDB oracle must compute the
identical value, and a 1000-executor run must hash identically to
local[32]. ``xxhash64``/``hash`` differ per engine, so the hash
primitive is ``md5`` (identical lowercase hex everywhere). Two
families:

- the STRING family (``seeded_md5``/``shingles``/``minhash_signature``
  /``band_keys``): md5 per (shingle, seed) with a seed prefix;
  min/compare on the hex strings (fixed-length hex compares
  lexicographically == numerically). Kept for n-gram Jaccard and as
  the reference formulation.
- the INTEGER family (``token_hashes``/``int_shingles``/
  ``minhash_signature_int``/``band_keys_int``): ONE md5 per token,
  then exact int64 arithmetic (rolling-polynomial shingles, affine-map
  signature hashes, all mod 2^40 — max intermediate 2^40·2^20 < 2^63
  so the math is identical in any engine with 64-bit ints). This is
  the dedup hot path: it removes the per-(shingle, seed) md5 fan-out
  (8× the corpus shingle count) and ships long arrays instead of
  string arrays (measured 3.5× end-to-end on MinHash dedup at sf10).

Everything is built-in higher-order functions — JVM-side, no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the documents table is single-space
    joined)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def seeded_md5(col: Column, seed: Column | int) -> Column:
    """md5 over ``"{seed}:{value}"`` — one independent hash function
    per seed, bit-identical in any engine with md5."""
    s = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    return F.md5(F.concat(s, F.lit(":"), col))


def shingles(toks: Column, n: int = 3) -> Column:
    """Overlapping word n-grams joined by a single space. Documents
    shorter than ``n`` tokens yield one shingle of all their tokens
    (out-of-range element_at is null; concat_ws skips nulls — matching
    DuckDB list indexing + concat_ws).

    A NULL token array yields NULL (same guard and same reasoning as
    :func:`int_shingles`: without it, ``greatest(NULL, 1)`` clamps to
    one window and every NULL-text document emits the constant shingle
    ``['']`` — polluting gram counts and pairing NULL docs with each
    other at Jaccard 1.0 in the n-gram dedup path). The guard is in
    the sequence bound, never wrapped around the transform (perf —
    see int_shingles)."""
    upper = F.size(toks) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), F.when(upper < 1, F.lit(1)).otherwise(upper))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
        ),
    )


def minhash_signature(shingle_set: Column, n_hashes: int = 8) -> Column:
    """MinHash signature: per seed i, the minimum seeded md5 over the
    shingle set. Arrays of hex strings; equal signatures <=> equal
    minhashes."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(F.transform(shingle_set, lambda s: seeded_md5(s, i))),
    )


def band_keys(signature: Column, n_bands: int = 4, rows_per_band: int = 2) -> Column:
    """LSH banding: concatenate ``rows_per_band`` adjacent signature
    elements per band. Two docs collide on a band key iff that band of
    their signatures matches exactly."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda j: F.concat(
            *[
                F.element_at(signature, j * F.lit(rows_per_band) + F.lit(r + 1))
                for r in range(rows_per_band)
            ]
        ),
    )


# ----- integer MinHash family -----------------------------------------
# One md5 per TOKEN (not per shingle×seed): the token hash is the first
# 10 hex digits of md5 as a 40-bit int; shingles are rolling-polynomial
# combinations of token hashes mod 2^40; the per-seed signature hashes
# are affine maps (s*a_i + b_i) mod 2^40 with odd multipliers (a
# bijection mod 2^40, so min statistics behave like independent
# permutation approximations — the standard multiply-mod MinHash
# family). Every step is exact int64 arithmetic (max intermediate
# 2^40 * 2^20 < 2^63), so DuckDB replays it bit-identically — and the
# string scheme's per-(shingle, seed) md5 calls (8× the corpus's
# shingle count) collapse to one md5 per token.

MINHASH_M = 1 << 40
SHINGLE_P = 786433  # odd, < 2^20: rolling-hash base
MINHASH_A = (999983, 999979, 999961, 999959, 999953, 999931, 999917, 999907)
MINHASH_B = (
    15485863, 32452843, 49979687, 67867967,
    86028121, 104395301, 122949823, 141650939,
)


def token_hashes(toks: Column) -> Column:
    """40-bit integer hash per token: first 10 hex digits of md5."""
    return F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 10), 16, 10).cast("long"),
    )


def int_shingles(ih: Column, n: int = 3) -> Column:
    """Integer n-gram shingles from a TOKEN-HASH array (the output of
    :func:`token_hashes`, staged as a real column): rolling polynomial
    ``h = (h*P + token_hash) mod 2^40`` over each window of ``n``
    token hashes. Same short-document semantics as :func:`shingles`
    (windows start at 1..max(len-n+1, 1); out-of-range positions
    contribute 0).

    ``ih`` MUST be a materialized column, not an inline
    ``token_hashes(...)`` expression: Catalyst duplicates an inline
    subexpression into every ``try_element_at`` access inside the
    lambda, re-computing the full md5 array n times per shingle
    (measured 10× end-to-end on the shingle build).

    A NULL input array yields NULL, not a shingle set: without the
    guard, ``size(NULL)`` is NULL, ``greatest(NULL, 1)`` is 1, and
    every windowed read coalesces to 0 — so ALL NULL-text documents
    would share the constant shingle set ``{0}``, collide in every LSH
    band, AND verify against each other at Jaccard 1.0 (unknown text
    silently classified as duplicate text, quadratically). The guard
    lives in the sequence BOUND (a scalar CASE that propagates NULL —
    ``when(upper < 1)`` is false for NULL so NULL flows through),
    never wrapped around the transform itself: a CASE enclosing the
    higher-order lambda measurably slowed the whole shingle pipeline
    (~30% on the minhash bench key)."""
    upper = F.size(ih) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), F.when(upper < 1, F.lit(1)).otherwise(upper))

    def one(i: Column) -> Column:
        h = F.lit(0).cast("long")
        for j in range(n):
            # try_element_at: the last window of a short document reads
            # past the end by design (same semantics as shingles());
            # plain element_at would throw under ANSI sessions.
            tok = F.coalesce(F.try_element_at(ih, i + F.lit(j)), F.lit(0))
            h = (h * F.lit(SHINGLE_P) + tok) % F.lit(MINHASH_M)
        return h

    return F.transform(idx, one)


def minhash_signature_int(shingle_set: Column, n_hashes: int = 8) -> Column:
    """Integer MinHash signature: per seed i, the minimum of
    ``(s * A[i] + B[i]) mod 2^40`` over the shingle set."""
    if n_hashes > len(MINHASH_A):
        raise ValueError(
            f"n_hashes={n_hashes} exceeds the {len(MINHASH_A)} fixed seeds"
        )
    a = F.array(*[F.lit(x) for x in MINHASH_A[:n_hashes]])
    b = F.array(*[F.lit(x) for x in MINHASH_B[:n_hashes]])
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingle_set,
                lambda s: (
                    s * F.element_at(a, i + 1) + F.element_at(b, i + 1)
                ) % F.lit(MINHASH_M),
            )
        ),
    )


def band_keys_int(
    signature: Column, n_bands: int = 4, rows_per_band: int = 2
) -> Column:
    """LSH banding over an integer signature: the band key joins
    ``rows_per_band`` adjacent signature values with ``_``.

    NULL-propagating ``concat`` on purpose, NOT ``concat_ws``: a
    document with a NULL token array (NULL text) carries a signature
    of NULLs, and ``concat_ws`` skips NULLs — every such document
    would collapse onto the same empty-string key in EVERY band,
    manufacturing O(k^2) LSH candidate pairs that the Jaccard verify
    only discards later. With ``concat`` the degenerate key is NULL
    and never equi-joins at all."""

    def one_band(j: Column) -> Column:
        parts: list[Column] = []
        for r in range(rows_per_band):
            if r:
                parts.append(F.lit("_"))
            parts.append(
                F.element_at(
                    signature, j * F.lit(rows_per_band) + F.lit(r + 1)
                ).cast("string")
            )
        return F.concat(*parts)

    return F.transform(F.sequence(F.lit(0), F.lit(n_bands - 1)), one_band)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two *distinct-element* arrays. Integer sizes,
    one double division — bit-identical cross-engine."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def _hex_digit_bit(tok: Column, b: Column) -> Column:
    """Bit ``b`` (0..31, LSB-within-digit ordering) of the first 8 hex
    digits of md5(tok)."""
    digit = F.conv(F.md5(tok).substr((b / 4).cast("int") + 1, F.lit(1)), 16, 10).cast("long")
    p = F.pow(F.lit(2.0), F.lit(3) - (b % 4)).cast("long")
    return F.floor(digit / p).cast("long") % 2


def simhash32(toks: Column) -> Column:
    """32-bit SimHash over a token array: per bit, majority vote of the
    token-hash bits (+1/-1); set the bit when the vote is positive.
    Pure built-in higher-order functions; identical in DuckDB.

    Reference formulation (md5 re-hashed per bit — 32 md5 per token).
    Production callers stage :func:`token_hashes32` as a column and
    use :func:`simhash32_int`, which computes the IDENTICAL value from
    one md5 per token."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda a, tok: a + F.when(_hex_digit_bit(tok, b) == 1, F.lit(1)).otherwise(F.lit(-1)),
            )
            > 0,
            F.pow(F.lit(2.0), b).cast("long"),
        ).otherwise(F.lit(0)),
    )


def token_hashes32(toks: Column) -> Column:
    """32-bit integer hash per token: first 8 hex digits of md5 (the
    int value of the digit string :func:`simhash32`'s bit extractor
    reads)."""
    return F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )


def simhash32_int(ih32: Column) -> Column:
    """:func:`simhash32` computed from a staged :func:`token_hashes32`
    column — bit-identical output (bit ``b`` of the md5-prefix int is
    ``(v >> (31-b)) & 1``, exactly the hex-digit/LSB-within-digit read
    the string form performs), at one md5 per token instead of 32.
    ``ih32`` MUST be a real column: an inline expression would be
    re-evaluated once per bit inside the fold (see
    :func:`int_shingles`)."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(
            F.aggregate(
                ih32,
                F.lit(0).cast("long"),
                lambda a, v: a
                + F.when(
                    F.floor(
                        v / F.pow(F.lit(2.0), F.lit(31) - b).cast("long")
                    ).cast("long") % 2
                    == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1)),
            )
            > 0,
            F.pow(F.lit(2.0), b).cast("long"),
        ).otherwise(F.lit(0)),
    )


def count_in(toks: Column, words: tuple[str, ...]) -> Column:
    """How many tokens (with multiplicity) fall in a constant word
    list."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))
