"""ANSI ordinal references — ``GROUP BY 1`` / ``ORDER BY 2`` name the
1-based select-list position (engine extension matching Spark SQL's
and DuckDB's own defaults, so the native and subquery paths agree)."""

import pytest

from flink_dsl_spark.errors import PlanError

from .conftest import assert_matches_oracle


def test_group_and_order_by_ordinal(engine, duck):
    q = ("select o_orderstatus, o_orderpriority, count(*) as n "
         "from orders group by 1, 2 order by 3 desc, 1, 2 limit 5")
    assert_matches_oracle(engine.sql(q), duck, q, "ordinals")


def test_order_by_ordinal_projection(engine, duck):
    q = "select n_regionkey, n_name from nation order by 1 desc, 2"
    assert_matches_oracle(engine.sql(q), duck, q, "ordinal_proj")


def test_order_by_ordinal_mixed_with_alias(engine, duck):
    q = ("select o_custkey, count(*) as n from orders "
         "group by o_custkey order by n desc, 1 limit 10")
    assert_matches_oracle(engine.sql(q), duck, q, "ordinal_mixed")


def test_setop_order_by_ordinal(engine, duck):
    q = ("select n_name as v from nation union all "
         "select r_name as v from region order by 1 limit 6")
    assert_matches_oracle(engine.sql(q), duck, q, "ordinal_setop")


def test_cube_by_ordinal(engine, duck):
    q = ("select o_orderstatus, o_orderpriority, count(*) as n "
         "from orders group by cube(1, 2) order by 3 desc, 1, 2")
    assert_matches_oracle(engine.sql(q), duck, q, "ordinal_cube")


def test_ordinal_window_item_orderable(engine, duck):
    """ORDER BY may target a deferred window item by position."""
    q = ("select o_orderstatus, count(*) as n, rank() over "
         "(order by count(*) desc) as rk from orders "
         "group by o_orderstatus order by 3")
    oracle = ("select o_orderstatus, count(*) as n, CAST(rank() over "
              "(order by count(*) desc) AS INT) as rk from orders "
              "group by o_orderstatus order by 3")
    assert_matches_oracle(engine.sql(q), duck, oracle, "ordinal_window")


def test_ordinal_out_of_range(engine):
    with pytest.raises(PlanError, match="position 5"):
        engine.sql("select o_orderstatus from orders order by 5")
    with pytest.raises(PlanError, match="position 2"):
        engine.sql("select o_orderstatus, count(*) as n from orders "
                   "group by 2")
    with pytest.raises(PlanError, match="position 9"):
        engine.sql("select n_name as v from nation union all "
                   "select r_name as v from region order by 9")


def test_ordinal_not_an_aggregate_target(engine):
    with pytest.raises(PlanError, match="aggregate"):
        engine.sql("select count(*) as n, o_orderstatus from orders "
                   "group by 1")
