"""Sequence packing for LM training pipelines (SURVEY.md §2 Part C).

Concat-and-cut packing: documents (or chunks) are laid end-to-end in a
deterministic order and cut into fixed ``seq_len``-token training
sequences — the standard GPT-style pre-training layout that wastes no
pad tokens. Each row gets the sequence id (``pack_id``) and offset at
which its first token lands; a row whose tokens straddle a boundary is
split by the trainer at materialization time, which is exactly the
semantics of concatenate-then-chunk.

Scale design: one window shuffle per partition column group. The
running sum is computed per ``part_cols`` partition (e.g. language or
train-split), so no global single-partition window exists — each
partition packs independently, which is also what you want
operationally (a pack never mixes languages/splits). Everything is
built-in window + arithmetic: whole-stage codegen, no UDF, no
driver-side state.
"""

from __future__ import annotations

import numbers

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    seq_len: int,
    part_cols: tuple[str, ...] = (),
    order_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Assign each row a (pack_id, pack_offset) under concat-and-cut
    packing with ``seq_len`` tokens per sequence.

    ``pack_id`` is dense within each ``part_cols`` group; ``order_cols``
    must be a deterministic total order (content ids, not load order)
    so packing is reproducible across runs and cluster sizes.

    ``pack_id`` is BIGINT: it is cumulative-tokens // seq_len, and a
    coarse ``part_cols`` group (one language) holds trillions of
    tokens at corpus scale — far past 2^31 packs. ``pack_offset``
    stays INT (bounded below ``seq_len`` by construction).

    The cut uses exact integer division (``div``), not
    ``floor(start / seq_len)``: ``/`` is DOUBLE division, and past
    ~2^52 cumulative tokens the quotient rounds ACROSS integer
    boundaries before floor sees it (floor((2^54-1)/4) = 2^52 in
    IEEE double; the true pack is 2^52 - 1) — off-by-one pack
    assignment with no error, in both engines identically.
    """
    if not isinstance(seq_len, numbers.Integral) or isinstance(seq_len, bool):
        # A float seq_len (e.g. 256.5 past the annotation) would
        # silently use int(seq_len) in the pack_id `div` but the raw
        # value in the pack_offset `%` — two different denominators.
        # Integral covers numpy.int64 etc.; normalized below so both
        # denominators are the same builtin int.
        raise TypeError(f"seq_len must be an integer, got {seq_len!r}")
    seq_len = int(seq_len)
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return df.select(*df.columns, start.alias("__start_tok")).select(
        *df.columns,
        F.expr(f"__start_tok div {seq_len}").alias("pack_id"),
        (F.col("__start_tok") % seq_len).cast("int").alias("pack_offset"),
    )
