"""CUBE and GROUPING SETS (engine extensions — the reference grammar
only has ``WITH ROLLUP``, SURVEY.md §2.4).  Function-style
ROLLUP()/CUBE() and GROUPING SETS compile to the same partial→final
hash aggregate through one Expand node; results pinned cell-exact
against DuckDB, including the grouping() indicator function."""

import pytest

from flink_dsl_spark import parse
from flink_dsl_spark.ast_nodes import Col
from flink_dsl_spark.errors import PlanError
from flink_dsl_spark.sqlgen import to_sql

from .conftest import assert_matches_oracle


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def test_cube_parses():
    sel = parse("select a, b, count(*) as n from t group by cube(a, b)")
    assert sel.cube is True and sel.rollup is False
    assert sel.group_by == [Col("a"), Col("b")]


def test_rollup_function_form_parses():
    sel = parse("select a, count(*) as n from t group by rollup(a)")
    assert sel.rollup is True and sel.cube is False


def test_grouping_sets_parses_to_index_lists():
    sel = parse("select a, b, count(*) as n from t "
                "group by grouping sets ((a, b), (a), ())")
    assert sel.group_by == [Col("a"), Col("b")]
    assert sel.grouping_sets == [[0, 1], [0], []]


def test_grouping_sets_bare_and_shared_keys():
    """Bare exprs are singleton sets; repeated keys reuse one union
    slot."""
    sel = parse("select a, b, count(*) as n from t "
                "group by grouping sets (a, (a, b))")
    assert sel.group_by == [Col("a"), Col("b")]
    assert sel.grouping_sets == [[0], [0, 1]]


def test_cube_is_contextual():
    """A column named cube still groups normally (no following paren)."""
    sel = parse("select cube, count(*) as n from t group by cube")
    assert sel.cube is False
    assert sel.group_by == [Col("cube")]


def test_grouping_sets_sqlgen_roundtrip():
    sel = parse("select a, count(*) as n from t "
                "group by grouping sets ((a), ())")
    assert "GROUP BY GROUPING SETS ((a), ())" in to_sql(sel)
    sel = parse("select a, b, count(*) as n from t group by cube(a, b)")
    assert "GROUP BY CUBE(a, b)" in to_sql(sel)


# ---------------------------------------------------------------------------
# execution vs DuckDB
# ---------------------------------------------------------------------------

def test_cube_two_keys(engine, duck):
    q = ("select o_orderstatus, o_orderpriority, count(*) as n "
         "from orders group by cube(o_orderstatus, o_orderpriority)")
    assert_matches_oracle(engine.sql(q), duck, q, "cube2")


def test_rollup_function_form(engine, duck):
    """ROLLUP(a, b) ≡ the reference's `a, b WITH ROLLUP`."""
    q = ("select o_orderstatus, o_orderpriority, count(*) as n "
         "from orders group by rollup(o_orderstatus, o_orderpriority)")
    assert_matches_oracle(engine.sql(q), duck, q, "rollup_fn")


def test_grouping_sets_execution(engine, duck):
    q = ("select o_orderstatus, o_orderpriority, count(*) as n "
         "from orders group by grouping sets "
         "((o_orderstatus, o_orderpriority), (o_orderpriority), ())")
    assert_matches_oracle(engine.sql(q), duck, q, "gsets")


def test_grouping_indicator_function(engine, duck):
    """grouping(col) distinguishes a rolled-up NULL from a data NULL;
    Spark returns tinyint where DuckDB returns BIGINT, so the oracle
    casts."""
    q = ("select o_orderstatus, grouping(o_orderstatus) as g, "
         "count(*) as n from orders group by cube(o_orderstatus)")
    oracle = q.replace("grouping(o_orderstatus) as g",
                       "CAST(grouping(o_orderstatus) AS TINYINT) as g")
    assert_matches_oracle(engine.sql(q), duck, oracle, "grouping_fn")


def test_cube_having_order(engine, duck):
    q = ("select o_orderstatus, o_orderpriority, count(*) as n "
         "from orders group by cube(o_orderstatus, o_orderpriority) "
         "having count(*) > 100")
    assert_matches_oracle(engine.sql(q), duck, q, "cube_having")


def test_grouping_sets_subquery_path(engine, duck):
    q = ("select o_orderstatus, count(*) as n, "
         "(select count(*) from customer) as c from orders "
         "group by grouping sets ((o_orderstatus), ())")
    assert_matches_oracle(engine.sql(q), duck, q, "gsets_subquery")


def test_cube_in_cte(engine, duck):
    q = ("with cu as (select o_orderstatus as st, o_orderpriority as pr, "
         "count(*) as n from orders group by cube(o_orderstatus, "
         "o_orderpriority)) select st, pr, n from cu where n > 50")
    assert_matches_oracle(engine.sql(q), duck, q, "cube_cte")


# ---------------------------------------------------------------------------
# guards
# ---------------------------------------------------------------------------

def test_cube_rejected_on_stream_window(spark):
    import os
    import tempfile

    from flink_dsl_spark import FsqlEngine

    from .conftest import SF_DIR
    from .test_hints_ddl import _ddl_type

    eng = FsqlEngine(spark)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    d = tempfile.mkdtemp(prefix="cube_stream_")
    os.symlink(f"{SF_DIR}/events.parquet",
               os.path.join(d, "events.parquet"))
    eng.sql("create stream cube_ev ("
            + ", ".join(f"{f.name} {_ddl_type(f.dataType)}"
                        for f in ev.schema.fields)
            + f") source file ('{d}', 'parquet')")
    try:
        with pytest.raises(PlanError, match="stream window"):
            eng.sql("select event_type, count(*) as n from cube_ev "
                    "[size 10 sec] group by cube(event_type)")
    finally:
        eng.sql("drop stream cube_ev")
