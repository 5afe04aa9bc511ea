"""As-of and range joins over the events table, oracled against DuckDB's
native ASOF JOIN / inequality joins."""

import pytest

from flink_dsl_spark.temporal import asof_join, range_join
from flink_dsl_spark.errors import PlanError

from .conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def ev(engine):
    return engine.catalog.get("events")


def _purchases(ev):
    return ev.filter("event_type = 'purchase'") \
             .selectExpr("user_id", "event_id as purchase_id", "ts")


def _views(ev):
    return ev.filter("event_type = 'view'") \
             .selectExpr("user_id", "event_id as view_id", "ts", "value")


def test_asof_backward_matches_duckdb(ev, duck):
    out = asof_join(_purchases(ev), _views(ev), by="user_id",
                    left_on="ts", right_on="ts")
    out = out.selectExpr("user_id", "purchase_id", "view_id",
                         "round(value, 2) as view_value")
    assert_matches_oracle(out, duck, """
        SELECT p.user_id AS user_id, p.event_id AS purchase_id,
               v.event_id AS view_id, round(v.value, 2) AS view_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts""",
        "asof_backward")


def test_asof_forward_matches_duckdb(ev, duck):
    out = asof_join(_purchases(ev), _views(ev), by="user_id",
                    left_on="ts", right_on="ts", direction="forward")
    out = out.selectExpr("user_id", "purchase_id", "view_id")
    assert_matches_oracle(out, duck, """
        SELECT p.user_id AS user_id, p.event_id AS purchase_id,
               v.event_id AS view_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts <= v.ts""",
        "asof_forward")


def test_asof_tolerance_nulls_far_matches(ev, duck):
    out = asof_join(_purchases(ev), _views(ev), by="user_id",
                    left_on="ts", right_on="ts", tolerance_sec=3600)
    out = out.selectExpr("user_id", "purchase_id", "view_id")
    # tolerance nulls the nearest match when it is too old; it does NOT
    # fall through to the next-nearest (pandas merge_asof semantics)
    assert_matches_oracle(out, duck, """
        SELECT p.user_id AS user_id, p.event_id AS purchase_id,
               CASE WHEN epoch(p.ts) - epoch(v.ts) <= 3600
                    THEN v.event_id END AS view_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts""",
        "asof_tolerance")


def test_asof_rejects_bad_direction(ev):
    with pytest.raises(PlanError):
        asof_join(_purchases(ev), _views(ev), by="user_id",
                  left_on="ts", right_on="ts", direction="sideways")


def test_range_join_matches_duckdb(ev, duck):
    clicks = ev.filter("event_type = 'click'") \
               .selectExpr("user_id", "event_id as click_id", "ts")
    purch = _purchases(ev)
    out = range_join(clicks, purch, by="user_id",
                     left_on="ts", right_on="ts",
                     lower_sec=0, upper_sec=1800)
    out = out.selectExpr("user_id", "click_id", "purchase_id")
    assert_matches_oracle(out, duck, """
        SELECT c.user_id AS user_id, c.event_id AS click_id,
               p.event_id AS purchase_id
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND epoch(p.ts) >= epoch(c.ts)
         AND epoch(p.ts) <= epoch(c.ts) + 1800
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'""",
        "range_join")


def test_range_join_no_duplicate_pairs(ev):
    clicks = ev.filter("event_type = 'click'") \
               .selectExpr("user_id", "event_id as click_id", "ts")
    purch = _purchases(ev)
    out = range_join(clicks, purch, by="user_id",
                     left_on="ts", right_on="ts",
                     lower_sec=-900, upper_sec=900)
    assert out.count() == out.select("click_id", "purchase_id") \
                             .distinct().count()


def test_range_join_is_equi_join_plan(ev):
    """The banding must surface as an equality join — a nested-loop here
    is the quadratic plan the operator exists to avoid."""
    import io
    from contextlib import redirect_stdout
    clicks = ev.filter("event_type = 'click'") \
               .selectExpr("user_id", "event_id as click_id", "ts")
    out = range_join(clicks, _purchases(ev), by="user_id",
                     left_on="ts", right_on="ts",
                     lower_sec=0, upper_sec=1800)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
