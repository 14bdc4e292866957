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


# ---------------------------------------------------------------------------
# transformWithStateInPandas burst detector (streaming twin of the batch
# error_burst_windows operator in operators/temporal.py)
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

BURST_WINDOW_US = 86_400 * 1_000_000  # == temporal.ERROR_BURST_WINDOW_S
BURST_THRESHOLD = 3
BURST_STATE_CAP = 4096  # explosion fence on per-key retained events

BURST_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("errs_24h", T.LongType(), False),
    ]
)


class BurstProcessor(StatefulProcessor):
    """Per-user trailing-24h error-burst detector on the NEW
    transformWithStateInPandas API (Spark 4 arbitrary stateful
    processing v2): per-key ListState retains error timestamps inside
    the trailing window of the furthest event seen; each incoming event
    is scored against merged state and emitted when its trailing count
    reaches BURST_THRESHOLD. Matches the batch RANGE-frame operator
    (operators/temporal.py:error_burst_windows) event-for-event on
    in-event-time-order feeds. Events older than the retained horizon
    (a late arrival beyond 24h behind the per-key max) would
    undercount — the same contract a watermark would enforce.
    State is O(errors in 24h) per key with a hard cap, not O(stream).

    ENVIRONMENT GATE: the TWS state-server protocol needs
    google.protobuf, which this sandbox lacks (probed: ImportError in
    transform_with_state_driver_worker; pip installs are not allowed) —
    so this processor is exercised only where protobuf exists
    (test_streaming.py skips via importorskip), and burst_stream_v1
    below carries the SAME semantics on applyInPandasWithState, which
    has no protobuf dependency and runs here (equality vs the batch
    operator pinned cross-checkpoint)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._recent = handle.getListState("recent_us", "us BIGINT")

    def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
        new: list[tuple[int, int]] = []
        for pdf in rows:
            new.extend(
                (int(u), int(e)) for u, e in zip(pdf["us"], pdf["event_id"])
            )
        if not new:
            return
        stored = [int(r[0]) for r in self._recent.get()] if self._recent.exists() else []
        new.sort()
        all_us = sorted(stored + [u for u, _ in new])
        out = []
        user = key[0]
        for us, eid in new:
            lo = us - BURST_WINDOW_US
            n = sum(1 for v in all_us if lo <= v <= us)
            if n >= BURST_THRESHOLD:
                out.append((int(user), eid, n))
        horizon = all_us[-1] - BURST_WINDOW_US
        keep = [(v,) for v in all_us if v > horizon][-BURST_STATE_CAP:]
        self._recent.clear()
        if keep:
            self._recent.put(keep)
        if out:
            yield pd.DataFrame(out, columns=["user_id", "event_id", "errs_24h"])

    def close(self) -> None:
        pass


def _burst_keyed(events_stream: DataFrame) -> DataFrame:
    return events_stream.filter(F.col("event_type") == "error").select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
        ).alias("us"),
    )


def burst_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming error events -> per-event trailing-24h burst emissions
    (transformWithStateInPandas; see BurstProcessor's environment gate)."""
    return _burst_keyed(events_stream).groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=BurstProcessor(),
        outputStructType=BURST_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


BURST_STATE_SCHEMA = T.StructType(
    [T.StructField("recent_us", T.ArrayType(T.LongType()))]
)


def _burst_user_v1(key, pdfs, state: GroupState):  # noqa: ANN001
    """applyInPandasWithState twin of BurstProcessor — identical
    emission semantics, state carried as one array<long> of retained
    in-window timestamps."""
    user = key[0]
    new: list[tuple[int, int]] = []
    for pdf in pdfs:
        new.extend((int(u), int(e)) for u, e in zip(pdf["us"], pdf["event_id"]))
    if not new:
        return
    stored = list(state.get[0]) if state.exists else []
    new.sort()
    all_us = sorted(stored + [u for u, _ in new])
    out = []
    for us, eid in new:
        lo = us - BURST_WINDOW_US
        n = sum(1 for v in all_us if lo <= v <= us)
        if n >= BURST_THRESHOLD:
            out.append((int(user), eid, n))
    horizon = all_us[-1] - BURST_WINDOW_US
    state.update(([v for v in all_us if v > horizon][-BURST_STATE_CAP:],))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "event_id", "errs_24h"])


def burst_stream_v1(events_stream: DataFrame) -> DataFrame:
    """Streaming error events -> burst emissions on the v1 stateful API
    (applyInPandasWithState) — the path that runs in this sandbox."""
    return _burst_keyed(events_stream).groupBy("user_id").applyInPandasWithState(
        _burst_user_v1,
        outputStructType=BURST_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
