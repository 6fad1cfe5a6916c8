"""Snapshot reconciliation: keyed diff of two table versions.

The reference's pipelines overwrite their sinks blind (`if_exists=
"replace"`, `insert_many` appends — SURVEY.md §2 K4-K6) with no way to
answer "what changed since yesterday's load?". `table_diff` is that
audit: align two snapshots on a key and classify every row as added /
removed / changed / unchanged — the validation step data teams run
after every backfill, migration, or engine swap.

Scale shape: each side collapses to (key, row-hash) map-side — the
hash is md5 over the compared columns with an explicit null sentinel,
so the keyed shuffle carries ~48 bytes/row regardless of row width —
then ONE full-outer equi-join on the key decides the class. No
driver-side collection, no row-by-row compare. (r18 exception, local
only: when the input is under-split — fewer partitions than 3× cores
— a scale-adaptive key-spread fires BEFORE the digest so the md5 pass
parallelizes; that exchange carries the projected compare columns,
not digests. It no-ops at cluster scale, where the digest-width
shuffle shape above holds unchanged.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType

from pipeline_airflow_docker_spark.functions.numeric import (
    portable_double_repr,
)

# Field separator / null sentinel chosen to not occur in the data; an
# ambiguous concat would hash ("a", None) and ("a", "") identically.
_SEP = "\x1f"
_NULL = "\x00∅"
_MISSING = object()


def row_hash(df: DataFrame, cols: Sequence[str]) -> F.Column:
    """Engine-portable row digest: md5 over the compared columns in
    declaration order, null-safe. (xxhash64 would be cheaper but is
    Spark-only; md5 reproduces in any engine, which keeps diffs
    oracle-checkable and lets two *different* engines reconcile.)

    DOUBLE/FLOAT columns render through
    :func:`~pipeline_airflow_docker_spark.functions.numeric.portable_double_repr`
    (bit-exact ``%a`` hex-float), NOT the native string cast: native
    double->string is a per-engine dialect (Spark ``1.0E7`` vs DuckDB
    ``10000000.0`` past 1e7, ``Infinity`` vs ``inf``), so the naive
    digest only reconciled across engines while every double happened
    to sit inside the plain-notation window [1e-3, 1e7) — green by
    fixture range, broken on the first big-valued column (r13 probe;
    the q_fuzzy_join ASCII-accident class)."""
    # Spark resolves column references case-insensitively by default
    # (spark.sql.caseSensitive=false), so the type lookup must too —
    # an exact-match dict would silently route a differently-cased
    # DOUBLE through the native string cast, reviving the per-engine
    # dialect this function exists to avoid. Ambiguous casefold
    # collisions (two fields differing only in case) stay exact-only;
    # a name matching neither way raises instead of guessing.
    # casefold() is INTENTIONALLY stricter than Spark's per-char
    # equalsIgnoreCase resolver on exotic case mappings ('İ' casefolds
    # to 'i̇', so Python won't match the 'i' Spark would): the
    # mismatch can only fail CLOSED (raise "not found" on a name Spark
    # resolves), never silently pick the wrong type — and Java's
    # char-level toUpper/toLower round-trip is not reproducible with
    # any Python str method, so strict-and-documented beats
    # almost-matching (r14 ADVICE).
    by_name = {f.name: f.dataType for f in df.schema.fields}
    by_fold: dict[str, object] = {}
    for f in df.schema.fields:
        key = f.name.casefold()
        by_fold[key] = None if key in by_fold else f.dataType

    def _dtype(name: str):
        if name in by_name:
            return by_name[name]
        folded = by_fold.get(name.casefold(), _MISSING)
        if folded is _MISSING:
            raise ValueError(
                f"row_hash: column {name!r} not found in schema "
                f"{sorted(by_name)}"
            )
        if folded is None:
            raise ValueError(
                f"row_hash: column {name!r} is ambiguous under "
                f"case-insensitive resolution; use the exact case"
            )
        return folded

    parts = [
        F.coalesce(
            portable_double_repr(c)
            if isinstance(_dtype(c), (DoubleType, FloatType))
            else F.col(c).cast("string"),
            F.lit(_NULL),
        )
        for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots: ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, hash differs),
    ``unchanged`` (both, hash equal — excluded unless asked: at 100 TB
    the interesting output is the delta, not the table)."""
    compare_cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c not in keys]
    )
    # r18: the per-row md5 digest is exactly the heavy-per-row
    # pre-exchange class the scale-adaptive spread targets (guide §2.5,
    # SCALE.md §25); hash-distribute on the diff key (high-cardinality
    # by contract — it identifies rows) before computing digests.
    # Projected to keys+compare_cols FIRST so the spread exchange never
    # ships columns the diff doesn't read. Width trade, stated: where
    # the spread fires (under-split local inputs) the exchange carries
    # the compare columns instead of the module's documented ~48-byte
    # (key, digest) rows; at cluster scale the spread no-ops and the
    # keyed shuffle keeps the documented digest-width shape. Measured
    # 0.91 s → 0.58 s on q_table_diff at sf0.1 (4 compare columns);
    # the key-spread partitioning also satisfies the full-outer join's
    # distribution, so no exchange is added — the join's moves earlier.
    from pipeline_airflow_docker_spark.operators.skew import spread  # noqa: PLC0415

    proj = list(dict.fromkeys([*keys, *compare_cols]))
    old = spread(old.select(*proj), key=keys)
    new = spread(new.select(*proj), key=keys)
    o = old.select(*keys, row_hash(old, compare_cols).alias("__h_old"))
    n = new.select(*keys, row_hash(new, compare_cols).alias("__h_new"))
    joined = o.join(n, on=list(keys), how="full_outer")
    change = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*keys, change.alias("change"))
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
