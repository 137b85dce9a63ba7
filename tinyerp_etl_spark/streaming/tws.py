"""Stateful streaming via transformWithStateInPandas (Spark 4).

The successor API to applyInPandasWithState (streaming/stateful.py
keeps the classic version — and remains the TESTED path in this
container: transformWithStateInPandas requires the protobuf package,
absent here, so its stream==batch test auto-skips until the dependency
exists; the classic twin covers the semantics). State is declared as named, typed
variables on a handle — here a ValueState for the running profile and
a MapState for per-event-type counts — instead of one opaque tuple.
The state store schema is therefore introspectable, individually
evolvable, and TTL-capable; semantics are otherwise the reference's
running-counter accumulation (ref tiny_api_v2_cliente.py:208) lifted
to per-key streaming state, now with a distinct-breakdown map.

Scale notes: one shuffle on user_id; each micro-batch touches only
the keys present in the batch; rows arrive as Arrow-batched pandas
frames. MapState entries are point lookups against RocksDB-backed
state at cluster scale — the per-type map never materializes whole
unless iterated (we iterate only to count, keys() streams).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

TWS_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_cents", T.LongType()),
        T.StructField("last_seen", T.TimestampType()),
        T.StructField("n_event_types", T.LongType()),
    ]
)

_PROFILE_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_cents", T.LongType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

_TYPE_KEY = T.StructType([T.StructField("event_type", T.StringType())])
_TYPE_CNT = T.StructType([T.StructField("cnt", T.LongType())])


class UserProfileProcessor(StatefulProcessor):
    """Running per-user profile + per-event-type count map."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState("profile", _PROFILE_STATE)
        self._by_type = handle.getMapState("by_type", _TYPE_KEY, _TYPE_CNT)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._profile.exists():
            n, total, last_us = self._profile.get()
        else:
            n, total, last_us = 0, 0, 0
        for pdf in rows:
            n += len(pdf)
            # exact integer cents, mirroring functions.exact
            total += int(pdf["value"].mul(100).round().astype("int64").sum())
            if len(pdf):
                last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = self._by_type.getValue((etype,))
                prev_cnt = prev[0] if prev is not None else 0
                self._by_type.updateValue((etype,), (prev_cnt + int(cnt),))
        self._profile.update((n, total, last_us))
        n_types = sum(1 for _ in self._by_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value_cents": [total],
                "last_seen": [pd.Timestamp(last_us, unit="us")],
                "n_event_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def user_profiles_tws(events_stream: DataFrame) -> DataFrame:
    """Per-user profile stream through transformWithStateInPandas.

    Input: streaming DataFrame with (user_id, ts, event_type, value).
    Emits the updated profile row for every user seen in each batch.
    """
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=TWS_PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
