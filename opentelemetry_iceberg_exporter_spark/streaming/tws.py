"""transformWithStateInPandas operators — Spark 4.x's arbitrary-state
API (the successor to applyInPandasWithState), backed by the RocksDB
state store.

Why a second custom-state path exists next to stateful.py's
applyInPandasWithState: transformWithState gives typed COMPOSITE state
(multiple named ValueState/ListState/MapState per key instead of one
tuple), per-state TTL, timers, and initial-state bootstrap — the
machinery a long-running telemetry aggregator actually needs. The
operators here keep the repo's determinism rules: no wall-clock reads
in the emitted rows, Arrow-batched, state size O(keys).

`running_value_stats` — per-key (count, sum, min, max) maintained in a
ValueState and emitted every batch the key appears in; the canonical
"total-so-far" shape that windowed aggregation cannot express.

`recent_values` — per-key ring of the last N values in a ListState
(bounded by construction): the state shape for "context of the last few
readings per series" features.

Requires `spark.sql.streaming.stateStore.providerClass` =
RocksDBStateStoreProvider (transformWithState's only supported store;
the rocksdbjni jar ships with Spark). The operators set nothing
themselves — session wiring stays in one place (build_session /
the caller), and the tests pin the config requirement.

ENVIRONMENT GATE (same policy as the Kafka source): PySpark's
transformWithState runtime talks to its state server through generated
protobuf stubs, so it needs the `google.protobuf` PYTHON package at
QUERY RUN time — which this container does not ship (the reason
otlp/protobuf.py hand-decodes the wire format). Plan construction works
without it; `tws_available()` reports whether queries can actually run,
and the tests skip (not fail) where it is False. On any normal cluster
(protobuf is a standard dependency) these operators run as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True when the python-side protobuf runtime transformWithState
    needs is importable (see module docstring)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_value_stats(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (n, total, min, max) across all micro-batches,
    emitted for every key seen in the current batch (update mode)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n long, total double, mn double, mx double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, mn, mx = (0, 0.0, None, None)
            if self._state.exists():
                n, total, mn, mx = self._state.get()
            for pdf in rows:
                vals = pd.to_numeric(pdf[value_col], errors="coerce").dropna()
                if len(vals):
                    n += int(len(vals))
                    total += float(vals.sum())
                    bmin, bmax = float(vals.min()), float(vals.max())
                    mn = bmin if mn is None else min(mn, bmin)
                    mx = bmax if mx is None else max(mx, bmax)
            self._state.update((n, total, mn, mx))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n": [n],
                    "total": [total],
                    "min_value": [mn],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=(
            f"{key_col} string, n long, total double, "
            "min_value double, max_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )


def recent_values(
    df: DataFrame, key_col: str, value_col: str, keep: int = 3
) -> DataFrame:
    """Per-key ring buffer of the last `keep` values (arrival order
    within the stream), maintained in a ListState and emitted as an
    array column every batch the key appears in. State is bounded at
    `keep` rows per key by construction."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Recent(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._ring = handle.getListState("ring", "v double")

        def handleInputRows(self, key, rows, timerValues):
            vals = [v for (v,) in self._ring.get()]
            for pdf in rows:
                vals.extend(
                    float(x)
                    for x in pd.to_numeric(pdf[value_col], errors="coerce").dropna()
                )
            vals = vals[-keep:]
            self._ring.put([(v,) for v in vals])
            yield pd.DataFrame({key_col: [key[0]], "recent": [vals]})

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=Recent(),
        outputStructType=f"{key_col} string, recent array<double>",
        outputMode="Update",
        timeMode="None",
    )
