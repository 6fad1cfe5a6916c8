"""Cross-engine deterministic text primitives.

Dedup/fingerprint operators need hash values that are *reproducible
across engines and cluster runs* — the DuckDB oracle must compute the
identical value, and a 1000-executor run must hash identically to
local[32]. ``xxhash64``/``hash`` differ per engine, so the hash
primitive here is ``md5`` (identical lowercase hex everywhere) with a
seed prefix; min/compare operations use the hex strings directly
(fixed-length hex compares lexicographically == numerically).

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
    DuckDB list indexing + concat_ws)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
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
    Pure built-in higher-order functions; identical in DuckDB."""
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


def count_in(toks: Column, words: tuple[str, ...]) -> Column:
    """How many tokens (with multiplicity) fall in a constant word
    list."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))
