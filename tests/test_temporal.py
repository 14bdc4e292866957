"""Semantics of the temporal operators (operators/temporal.py) beyond
the DuckDB parity gate: as-of bound correctness vs a pandas reference,
left-join null behavior, and timezone-independence of the string-encoded
timestamps (the driver may run these in a session whose timeZone is not
UTC — the output must not depend on it)."""

from __future__ import annotations

import pandas as pd

from blarify_spark.operators.temporal import (
    asof_join_purchase_click,
    tumbling_window_event_stats,
)
from tests.conftest import SF_DIR


def _events_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def test_asof_covers_every_purchase_once(spark):
    ev = _events_pdf()
    out = asof_join_purchase_click(spark, SF_DIR).toPandas()
    purchases = ev[ev.event_type == "purchase"]
    assert len(out) == len(purchases)
    assert sorted(out.event_id) == sorted(purchases.event_id)


def test_asof_matches_pandas_merge_asof_reference(spark):
    ev = _events_pdf()
    out = (
        asof_join_purchase_click(spark, SF_DIR)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    left = (
        ev[ev.event_type == "purchase"][["event_id", "user_id", "ts"]]
        .sort_values("ts")
        .reset_index(drop=True)
    )
    right = (
        ev[ev.event_type == "click"][["user_id", "ts", "value"]]
        .sort_values("ts")
        .reset_index(drop=True)
    )
    ref = (
        pd.merge_asof(
            left,
            right.rename(columns={"ts": "click_ts", "value": "click_value"}),
            left_on="ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got_ts = pd.to_datetime(out.last_click_ts_str).astype("datetime64[us]")
    assert got_ts.equals(
        ref.click_ts.astype("datetime64[us]")
    ), "as-of picked a different click ts"
    pd.testing.assert_series_equal(
        out.last_click_value,
        ref.click_value,
        check_names=False,
    )


def test_asof_no_prior_click_is_null(spark):
    ev = _events_pdf()
    out = asof_join_purchase_click(spark, SF_DIR).toPandas()
    first_click = (
        ev[ev.event_type == "click"].groupby("user_id").ts.min().rename("c0")
    )
    j = out.merge(first_click, on="user_id", how="left")
    ts = pd.to_datetime(j.ts_str)
    orphan = j.c0.isna() | (ts < j.c0)
    assert (j.last_click_ts_str.isna() == orphan).all()
    assert orphan.any(), "fixture should contain at least one orphan purchase"


def test_temporal_output_is_timezone_independent(spark):
    """String-encoded wall-clock output must be byte-identical whatever
    the consuming session's timeZone is (the parquet ts is NTZ; an epoch
    conversion would shift with the session zone)."""
    tz_key = "spark.sql.session.timeZone"
    before = spark.conf.get(tz_key)
    base_asof = asof_join_purchase_click(spark, SF_DIR).toPandas()
    base_win = tumbling_window_event_stats(spark, SF_DIR).toPandas()
    try:
        spark.conf.set(tz_key, "America/New_York")
        shifted_asof = asof_join_purchase_click(spark, SF_DIR).toPandas()
        shifted_win = tumbling_window_event_stats(spark, SF_DIR).toPandas()
    finally:
        spark.conf.set(tz_key, before)
    pd.testing.assert_frame_equal(base_asof, shifted_asof)
    pd.testing.assert_frame_equal(base_win, shifted_win)


def test_tumbling_windows_partition_the_event_set(spark):
    ev = _events_pdf()
    out = tumbling_window_event_stats(spark, SF_DIR).toPandas()
    assert int(out.n_events.sum()) == len(ev)
    starts = pd.to_datetime(out.window_start_str)
    assert (starts.dt.minute % 15 == 0).all()
    assert (starts.dt.second == 0).all()
