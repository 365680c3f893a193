"""Custom stateful streaming operator via ``applyInPandasWithState``.

Tracks per-(table, key) CDC activity across micro-batches: how many
versions a key has received, its latest LSN/op, and first-seen time.
This is the "custom stateful operator" path the north rule calls for
when windows/aggregations can't express the semantics — state lives in
the streaming state store (checkpointed, partitioned by key), the
update function is an Arrow-batched pandas kernel, and idle keys are
reaped with a processing-time timeout so state stays bounded.

Operationally this powers hot-key detection (feeds the salting policy)
and replay monitoring (a key whose version count jumps after a resume
indicates duplicate delivery upstream of the ledger).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("table_name", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("versions_seen", LongType(), False),
        StructField("last_lsn", LongType(), True),
        StructField("last_op", StringType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("versions_seen", LongType(), True),
        StructField("last_lsn", LongType(), True),
        StructField("last_op", StringType(), True),
    ]
)


def _make_update(idle_timeout_ms: int | None):
    def _update(
        key: Tuple[str, str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        versions, last_lsn, last_op = (
            state.get if state.exists else (0, None, None)
        )
        for pdf in pdfs:
            versions += len(pdf)
            if len(pdf):
                i = pdf["lsn"].idxmax()
                lsn = int(pdf["lsn"].loc[i])
                if last_lsn is None or lsn > last_lsn:
                    last_lsn, last_op = lsn, str(pdf["op"].loc[i])
        state.update((versions, last_lsn, last_op))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "table_name": [key[0]],
                "doc_id": [key[1]],
                "versions_seen": [versions],
                "last_lsn": [last_lsn],
                "last_op": [last_op],
            }
        )

    return _update


def track_key_versions(
    stream: DataFrame, idle_timeout_ms: int | None = 10 * 60 * 1000
) -> DataFrame:
    """Per-key stateful version tracker over the change feed. Works on a
    streaming frame (state store) — each micro-batch emits the updated
    totals for the keys it touched. ``idle_timeout_ms`` reaps idle keys
    (bounded state); pass None for NoTimeout — note that processing-time
    timeouts make the engine schedule periodic empty batches, so
    ``processAllAvailable()`` only terminates with None."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.select("table_name", "doc_id", "lsn", "op")
        .groupBy("table_name", "doc_id")
        .applyInPandasWithState(
            _make_update(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
