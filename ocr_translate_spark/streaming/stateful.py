"""Custom stateful streaming operators (``applyInPandasWithState``).

Two operators the reference's request loop implies but never gets to
express (SURVEY.md §2.10-2.12): its in-flight dedup (ref views.py:236-247
`Run.objects.filter(...)` probe per request) and its timeout-batched queues
(ref messaging.py:260-273) are per-request Python; at stream scale they
become keyed state:

* ``dedup_stream`` — exactly-once emission per key ACROSS micro-batches:
  the first arrival of a key passes, every later arrival (same batch or a
  later one) is dropped.  This is C3/C1 as a streaming operator — the
  ledger anti-join's incremental twin.
* ``sessionize_stream`` — event-time gap sessionization with keyed state:
  a session closes when a gap > ``gap_minutes`` arrives; closed sessions
  are emitted with their bounds and event count.  The stateful twin of
  ``catalog.sessionize`` (same gap rule), asserted batch≡stream in tests.

Both keep state per key only (O(keys) not O(rows)); on a real cluster the
state store shards with the shuffle partitioning, so they scale with
executors like any keyed aggregation.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

_DEDUP_STATE = StructType([StructField("seen", LongType())])
_SESSION_STATE = StructType([
    StructField("session_start", LongType()),
    StructField("last_epoch", LongType()),
    StructField("n_events", LongType()),
])


def dedup_stream(df: DataFrame, key: str) -> DataFrame:
    """Emit exactly one row per ``key`` across ALL micro-batches.

    Keys seen in an earlier micro-batch emit nothing (the cross-batch
    guarantee carried by keyed state).  WITHIN a micro-batch, which of
    several duplicate rows represents the key is arbitrary — the groupBy
    shuffle does not preserve arrival order — exactly the semantics of
    Spark's own ``dropDuplicates``.  Works on both streaming and batch
    DataFrames (batch = a single micro-batch).
    """
    schema = df.schema

    def fn(
        key_tuple: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.iloc[:1]
                break
        if first is None:
            return
        state.update((1,))
        yield first

    return df.groupBy(key).applyInPandasWithState(
        fn, schema, _DEDUP_STATE, "append", GroupStateTimeout.NoTimeout
    )


def sessionize_stream(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Emit CLOSED sessions (user, session_start, session_end, n_events;
    epochs in seconds) as gaps > ``gap_minutes`` arrive.

    Events must arrive per-key in event-time order across batches (the
    reference's queues are FIFO; replaying a time-ordered log satisfies
    this).  The still-open session stays in state and is not emitted —
    batch≡stream equality over closed sessions is asserted in tests.
    """
    gap_s = gap_minutes * 60
    out_schema = StructType([
        StructField("user_id", df.schema[user_col].dataType),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ])
    epoch_df = df.select(
        user_col,
        df[ts_col].cast("timestamp").cast("long").alias("_epoch"),
    )

    def fn(
        key_tuple: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key_tuple
        if state.exists:
            session_start, last_epoch, n_events = state.get
        else:
            session_start = last_epoch = None
            n_events = 0
        closed: list[tuple] = []
        # a key's rows can arrive as SEVERAL Arrow chunks in arbitrary
        # relative order (shuffle + batch splitting): gather the whole
        # micro-batch for the key, then sort ONCE — per-chunk sorting
        # would mis-segment sessions whenever a key spans chunks
        chunks = [pdf["_epoch"].to_numpy() for pdf in pdfs if len(pdf)]
        if chunks:
            for epoch in np.sort(np.concatenate(chunks)):
                epoch = int(epoch)
                if last_epoch is None:
                    session_start, n_events = epoch, 1
                elif epoch - last_epoch > gap_s:
                    closed.append((user, session_start, last_epoch, n_events))
                    session_start, n_events = epoch, 1
                else:
                    n_events += 1
                last_epoch = epoch
        state.update((session_start, last_epoch, n_events))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return epoch_df.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, _SESSION_STATE, "append", GroupStateTimeout.NoTimeout
    )


def run_stateful_stream(
    spark,
    chunks_dir: str,
    op: str = "sessionize",
    **kwargs,
) -> DataFrame:
    """Drive a stateful operator over a directory of parquet chunk files,
    one micro-batch per file (``maxFilesPerTrigger=1``), memory sink."""
    schema = spark.read.parquet(chunks_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks_dir)
    )
    if op == "sessionize":
        out = sessionize_stream(stream, **kwargs)
    elif op == "dedup":
        out = dedup_stream(stream, **kwargs)
    else:  # pragma: no cover
        raise ValueError(op)
    name = f"stateful_{op}_smoke"
    query = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.sql(f"SELECT * FROM {name}")
