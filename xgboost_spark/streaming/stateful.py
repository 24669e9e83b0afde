"""Custom stateful streaming operators (applyInPandasWithState).

The reference's iterator ingestion (`XGDMatrixCreateFromDataIter`,
`include/xgboost/c_api.h:424`) consumes data incrementally with state
carried between batches; Spark's general form of that pattern is
`applyInPandasWithState` — per-key state + event-time timeouts.  The
flagship example here is stateful sessionization: unlike the window-lag
batch form (`operators/relational.py sessionize`), this one maintains an
OPEN session per key across micro-batches and closes it either by a gap
event or an event-time timeout, so it runs forever on an unbounded
stream with bounded state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id bigint, session_start bigint, session_end bigint, "
                  "n_events bigint")
_STATE_SCHEMA = "start bigint, last bigint, n bigint"


def stateful_sessionize(stream_df: DataFrame, user_col: str = "user_id",
                        ts_col: str = "ts", gap_minutes: int = 30,
                        watermark: str = "2 hours") -> DataFrame:
    """Emit CLOSED sessions (user, start/end epoch-micros, event count).

    A session closes when a later event of the same key arrives more
    than ``gap_minutes`` after the previous one, or when the event-time
    watermark passes the open session's end by the gap (timeout) — so
    state size is O(active keys), never O(history).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        uid = int(key[0])
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [uid], "session_start": [start],
                                "session_end": [last], "n_events": [n]})
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf["_ts_us"])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        for t in ts:
            if last is not None and t <= last:
                # out-of-order within the watermark horizon: fold into
                # the open session (extends it backwards at worst)
                start = min(start, t)
                n += 1
                continue
            if last is not None and (t - last) > gap_us:
                closed.append((start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        state.update((start, last, n))
        # close by timeout once event time passes the session's last
        # event + gap (must stay above the current watermark to be valid)
        state.setTimeoutTimestamp(
            max(last // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(
                {"user_id": [uid] * len(closed),
                 "session_start": [c[0] for c in closed],
                 "session_end": [c[1] for c in closed],
                 "n_events": [c[2] for c in closed]})

    from xgboost_spark.sources.tables import ensure_event_time
    stream_df = ensure_event_time(stream_df, ts_col)
    d = (stream_df
         .withColumn("_ts_us", F.unix_micros(F.col(ts_col)))
         .withWatermark(ts_col, watermark))
    return (d.groupBy(F.col(user_col).cast("bigint").alias("user_id"))
            .applyInPandasWithState(fn, SESSION_SCHEMA, _STATE_SCHEMA,
                                    "append", GroupStateTimeout.EventTimeTimeout))


def stateful_sessionize_tws(stream_df: DataFrame, user_col: str = "user_id",
                            ts_col: str = "ts", gap_minutes: int = 30,
                            watermark: str = "2 hours") -> DataFrame:
    """`stateful_sessionize` on the MODERN Spark 4 stateful API —
    `transformWithStateInPandas` with a `StatefulProcessor`: typed
    value state, explicit event-time timers, RocksDB state store.
    Same closure semantics (gap break or event-time timer once the
    watermark passes end + gap); kept alongside the
    applyInPandasWithState form so both stateful APIs stay covered.

    Requires the RocksDB state store provider — see
    `run_update_to_memory(..., rocksdb=True)` — and the `protobuf`
    package (the TWS Python worker protocol; not bundled in this
    container, so the equivalence test skips here and the
    applyInPandasWithState form remains the oracle-checked default).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1000

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("session", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            uid = int(key[0])
            ts: list[int] = []
            for pdf in rows:
                ts.extend(int(t) for t in pdf["_ts_us"])
            ts.sort()
            if self._state.exists():
                start, last, n = self._state.get()
            else:
                start, last, n = None, None, 0
            closed: list[tuple[int, int, int]] = []
            for t in ts:
                if last is not None and t <= last:
                    start = min(start, t)
                    n += 1
                    continue
                if last is not None and (t - last) > gap_us:
                    closed.append((start, last, n))
                    start, n = t, 0
                if start is None:
                    start = t
                last = t
                n += 1
            self._state.update((start, last, n))
            # one live timer per key: re-arm at the new expiry
            for old in list(self._handle.listTimers()):
                self._handle.deleteTimer(old)
            self._handle.registerTimer(
                max(last // 1000 + gap_ms,
                    timerValues.getCurrentWatermarkInMs() + 1))
            if closed:
                yield pd.DataFrame(
                    {"user_id": [uid] * len(closed),
                     "session_start": [c[0] for c in closed],
                     "session_end": [c[1] for c in closed],
                     "n_events": [c[2] for c in closed]})

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._state.exists():
                start, last, n = self._state.get()
                self._state.clear()
                yield pd.DataFrame(
                    {"user_id": [int(key[0])], "session_start": [start],
                     "session_end": [last], "n_events": [n]})

        def close(self) -> None:
            pass

    from xgboost_spark.sources.tables import ensure_event_time
    stream_df = ensure_event_time(stream_df, ts_col)
    d = (stream_df
         .withColumn("_ts_us", F.unix_micros(F.col(ts_col)))
         .withWatermark(ts_col, watermark))
    return (d.groupBy(F.col(user_col).cast("bigint").alias("user_id"))
            .transformWithStateInPandas(_SessionProcessor(),
                                        SESSION_SCHEMA, "Append",
                                        "EventTime"))


def run_update_to_memory(result_df: DataFrame, query_name: str,
                         rocksdb: bool = False):
    """Drive a stateful streaming query over all available input
    (availableNow) into a memory sink; returns the finished query.

    ``rocksdb=True`` switches the state store provider to RocksDB for
    this query (transformWithState requires it); the previous provider
    is restored afterwards so co-resident queries keep their default.
    """
    spark = result_df.sparkSession
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    if rocksdb:
        spark.conf.set(key, "org.apache.spark.sql.execution.streaming."
                            "state.RocksDBStateStoreProvider")
    try:
        q = (result_df.writeStream.outputMode("append")
             .format("memory").queryName(query_name)
             .trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        if rocksdb:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    return q
