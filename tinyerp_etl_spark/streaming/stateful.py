"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the engine's answer to operators Structured Streaming
lacks natively: arbitrary per-key state with Arrow-batched pandas
processing. The operator here is a streaming running profile per user
— event count, value sum, last-seen timestamp — i.e. the reference's
running-counter accumulation (ref tiny_api_v2_cliente.py:208) lifted
to per-key streaming state.

Scale notes: state is partitioned by user_id (shuffle on the key once),
each micro-batch touches only keys present in the batch, and the
pandas function receives Arrow batches — no per-row Python overhead.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_cents", T.LongType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_cents", T.LongType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # exact integer cents, mirroring functions.exact
        total += int(pdf["value"].mul(100).round().astype("int64").sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value_cents": [total],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_profiles_stateful(events_stream: DataFrame) -> DataFrame:
    """Per-user streaming profile with arbitrary state.

    Input must be a streaming DataFrame with (user_id, ts, value).
    Emits the updated profile row for every user seen in each batch.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=USER_PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
