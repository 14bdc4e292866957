"""Custom stateful streaming operator: cross-batch sessionization.

The task-brief streaming surface names applyInPandasWithState for custom
stateful operators; this is the engine's instance — per-host crawl
sessions with an inactivity gap, where OPEN sessions live in the state
store across micro-batches (and across restarts, via the checkpoint) and
are emitted only once CLOSED. The blarify analog is the work-leasing
state machine (processing_status carried in the DB across batches,
documentation/queries/batch_processing_queries.py:39-399): mutable
per-key progress that outlives any single batch.

Keys are hosts (bounded cardinality); per-key state is three longs — the
state store stays O(active hosts) regardless of event volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 600  # 10 minutes of inactivity closes a session

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("session_start", T.LongType(), False),
        T.StructField("session_end", T.LongType(), False),
        T.StructField("n_pages", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_pages", T.LongType()),
    ]
)


def _sessionize_host(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    host = key[0]
    ts_all: list[int] = []
    for pdf in pdfs:
        ts_all.extend(int(v) for v in pdf["ts_sec"])

    # events can arrive out of event-time order ACROSS micro-batches (the
    # file source triggers in file order, not event order). Treat the open
    # state session and each new event as intervals and sweep-merge any
    # two within SESSION_GAP_SEC of each other. A late event more than a
    # gap BEFORE the open session's start therefore forms its own earlier
    # session instead of merging backwards (ADVICE r02: open [3600,3600] +
    # late ts=0 must NOT become one session [0,3600]); everything but the
    # latest interval is closed and emitted.
    atoms: list[list[int]] = [[ts, ts, 1] for ts in sorted(ts_all)]
    if state.exists:
        sess_start, last_ts, n_pages = state.get
        atoms.append([sess_start, last_ts, n_pages])
        atoms.sort(key=lambda a: (a[0], a[1]))

    if not atoms:  # no events and no prior state: nothing to do
        return

    merged: list[list[int]] = []
    for start, end, n in atoms:
        if merged and start - merged[-1][1] <= SESSION_GAP_SEC:
            merged[-1][1] = max(merged[-1][1], end)
            merged[-1][2] += n
        else:
            merged.append([start, end, n])

    closed: list[tuple[Any, ...]] = [
        (host, s, e, n) for s, e, n in merged[:-1]
    ]
    open_start, open_end, open_n = merged[-1]
    state.update((open_start, open_end, open_n))
    if closed:
        yield pd.DataFrame(
            closed, columns=["host", "session_start", "session_end", "n_pages"]
        )


def sessionize_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming pages -> closed per-host sessions (stateful)."""
    keyed = pages_stream.select(
        F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("host"),
        F.col("warc_ts").cast("timestamp").cast("long").alias("ts_sec"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _sessionize_host,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",  # closed sessions are emitted exactly once
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
