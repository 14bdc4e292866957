"""Accuracy contracts for the sketch operators (operators/sketches.py).

Approximate answers can't oracle against DuckDB (different sketch
implementations), so the bound IS the spec: HLL++ within 3*rsd of exact,
GK quantiles within rank error 1/accuracy (checked against the exact
percentiles the queries carry alongside)."""

from __future__ import annotations

from blarify_spark.operators.sketches import (
    HLL_RSD,
    sketch_hll_user_cardinality,
    sketch_quantile_order_values,
)
from tests.conftest import SF_DIR_MEDIUM


def test_hll_within_3_rsd_of_exact(spark):
    rows = sketch_hll_user_cardinality(spark, SF_DIR_MEDIUM).collect()
    assert rows, "expected one row per event type"
    for r in rows:
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err <= 3 * HLL_RSD, (
            f"{r.event_type}: approx {r.approx_users} vs exact "
            f"{r.exact_users} (rel_err {rel_err:.4f})"
        )


def test_quantile_sketch_brackets_exact(spark):
    rows = sketch_quantile_order_values(spark, SF_DIR_MEDIUM).collect()
    assert rows
    for r in rows:
        # GK guarantees rank error <= n/accuracy; on these group sizes the
        # returned element's VALUE should be within a tight band of the
        # exact percentile (values span ~[900, 480k], so 2% of the exact
        # value is a conservative check that still catches a broken knob)
        for p in ("p50", "p90", "p99"):
            exact = getattr(r, f"{p}_exact")
            approx = getattr(r, f"{p}_approx")
            assert abs(approx - exact) <= max(0.02 * exact, 1.0), (
                f"{r.o_orderstatus} {p}: approx {approx} vs exact {exact}"
            )


def test_sketch_queries_are_registered(spark):
    import __spark_entry__ as e

    q = e.queries()
    assert "sketch_hll_user_cardinality" in q
    assert "sketch_quantile_order_values" in q
    assert len(q["sketch_hll_user_cardinality"](spark, SF_DIR_MEDIUM).columns) == 4


def test_theta_sketch_set_algebra_accuracy(spark):
    from blarify_spark.operators.sketches import sketch_theta_event_overlap

    r = sketch_theta_event_overlap(spark, SF_DIR_MEDIUM).collect()[0]
    exact_both = r["exact_viewers"] + r["exact_buyers"] - r["exact_either"]
    for approx, exact in [
        (r["approx_viewers"], r["exact_viewers"]),
        (r["approx_buyers"], r["exact_buyers"]),
        (r["approx_either"], r["exact_either"]),
        (r["approx_both"], exact_both),
    ]:
        assert exact > 0
        assert abs(approx - exact) / exact <= 0.05


def test_cms_estimates_respect_bounds(spark):
    from blarify_spark.operators.sketches import (
        CMS_EPS,
        sketch_cms_part_frequency,
    )
    from blarify_spark.sources.tables import load_tables

    rows = sketch_cms_part_frequency(spark, SF_DIR_MEDIUM).collect()
    assert len(rows) == 10
    n_total = load_tables(spark, SF_DIR_MEDIUM, ["lineitem"])["lineitem"].count()
    overshoot_cap = CMS_EPS * n_total
    for r in rows:
        # CMS never underestimates; overestimate bounded by eps*N
        assert r["cms_n"] >= r["exact_n"]
        assert r["cms_n"] <= r["exact_n"] + overshoot_cap
