"""Custom stateful streaming operators (``applyInPandasWithState``).

This is the engine's escape hatch for stateful semantics the built-in
window/dedup operators can't express (SURVEY.md §2 streaming closure;
the reference's closest pattern is its per-run XCom counters, G5 —
``processed_items`` at dags/kafka_to_mongo_pipeline_enchanced.py:106,
159 — which reset every run; here the count survives across
micro-batches as managed state).

Scale notes: state is partitioned by the group key and lives in the
RocksDB state store (session.py default) — per-key state here is two
scalars, so state size grows with |keys|, not |events|. Each
micro-batch ships only the keys it touched through Arrow; emission is
one row per touched key per batch (update-style), never the full key
space.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

# Columns produced per (key, micro-batch) emission.
_OUT_SCHEMA = "{key} {ktype}, n_so_far BIGINT, max_so_far DOUBLE"
_STATE_SCHEMA = "n BIGINT, mx DOUBLE"


def running_totals(
    sdf: DataFrame, key_col: str, value_col: str, key_type: str = "bigint"
) -> DataFrame:
    """Cumulative per-key count and max carried across micro-batches.

    Emits ``(key, n_so_far, max_so_far)`` once per micro-batch in which
    the key appears; the *latest* emission per key is the stream-long
    total, so ``out.groupBy(key).agg(max(n_so_far), max(max_so_far))``
    equals the batch ``COUNT(*)``/``MAX(value)`` — the equivalence the
    oracle checks (count and max are carry-exact; a running float SUM
    would be addition-order-dependent and is deliberately not part of
    the checked contract).
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        # mx is None until the key has seen a NON-NULL value: pandas
        # .max() over an all-NULL batch is NaN, and seeding with -inf
        # leaks -inf into the output where SQL MAX(value) is NULL.
        # n counts ROWS (COUNT(*) semantics), NULL values included.
        n, mx = state.get if state.exists else (0, None)
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf[value_col].dropna()
            if len(vals):
                m = float(vals.max())
                mx = m if mx is None else max(mx, m)
        state.update((n, mx))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_so_far": [n], "max_so_far": [mx]}
        )

    return (
        sdf.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=_OUT_SCHEMA.format(key=key_col, ktype=key_type),
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_totals_tws(
    sdf: DataFrame, key_col: str, value_col: str, key_type: str = "bigint"
) -> DataFrame:
    """The same running-totals contract on Spark 4's
    ``transformWithStateInPandas`` — the successor stateful API:
    typed state handles (ValueState here; List/MapState for bigger
    shapes), explicit TimeMode, and per-key timers, replacing
    applyInPandasWithState's single packed state tuple. Kept alongside
    the older operator so both APIs stay exercised; same emission
    contract, so the same oracle grades either.

    Environment note: executing this operator requires ``protobuf``
    (the state-server wire protocol of transformWithState); in
    containers without it the query fails at runtime with an
    ImportError — the test suite skips accordingly, and
    ``running_totals`` (applyInPandasWithState) is the supported,
    dependency-free path (SCALE.md §6 records this support policy)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802
            # Same NULL contract as running_totals above.
            n, mx = self._state.get() if self._state.exists() else (0, None)
            for pdf in rows:
                n += len(pdf)
                vals = pdf[value_col].dropna()
                if len(vals):
                    m = float(vals.max())
                    mx = m if mx is None else max(mx, m)
            self._state.update((n, mx))
            yield pd.DataFrame(
                {key_col: [key[0]], "n_so_far": [n], "max_so_far": [mx]}
            )

        def close(self) -> None:
            pass

    return (
        sdf.select(key_col, value_col)
        .groupBy(key_col)
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=_OUT_SCHEMA.format(key=key_col, ktype=key_type),
            outputMode="Update",
            timeMode="None",
        )
    )
