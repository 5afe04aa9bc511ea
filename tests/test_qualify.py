"""QUALIFY clause (engine extension — DuckDB/Snowflake-style filter on
window-function results; SURVEY.md §2.5 records that the reference has
no analytic clause at all).  Semantics pinned cell-exact against
DuckDB, whose QUALIFY is the de-facto reference behavior: windows are
computed over the full WHERE output, THEN the predicate filters, THEN
DISTINCT / ORDER BY / LIMIT apply."""

import pytest

from flink_dsl_spark import parse
from flink_dsl_spark.ast_nodes import BinOp, Col, WindowFunc
from flink_dsl_spark.errors import PlanError, UnsupportedError
from flink_dsl_spark.sqlgen import to_sql

from .conftest import assert_matches_oracle


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def test_qualify_parses_after_having():
    sel = parse("select g, count(*) as c from t group by g having "
                "count(*) > 1 qualify row_number() over (order by g) <= 2")
    assert isinstance(sel.qualify, BinOp)
    assert sel.having is not None


def test_qualify_without_group_by():
    sel = parse("select a from t qualify rn = 1")
    assert isinstance(sel.qualify, BinOp)
    assert sel.qualify.left == Col("rn")


def test_bare_qualify_is_not_an_implicit_alias():
    """``from t qualify ...`` starts the clause; it must NOT parse as a
    table alias named qualify (the contextual-keyword rule)."""
    sel = parse("select a from t qualify row_number() over (order by a) = 1")
    assert sel.from_.alias is None
    assert sel.qualify is not None
    # explicit aliases still allowed
    sel = parse('select a as qualify from t')
    assert sel.items[0].alias == "qualify"
    sel = parse('select a from t as qualify')
    assert sel.from_.alias == "qualify"


def test_qualify_before_order_and_limit():
    sel = parse("select a, row_number() over (order by a) as rn from t "
                "qualify rn <= 3 order by a desc limit 2")
    assert sel.qualify is not None
    assert len(sel.order_by) == 1
    assert sel.limit is not None


# ---------------------------------------------------------------------------
# native path: non-aggregating queries
# ---------------------------------------------------------------------------

def test_qualify_alias_reference(engine, duck):
    q = ("select o_custkey, o_totalprice, row_number() over "
         "(partition by o_custkey order by o_totalprice desc, o_orderkey) "
         "as rn from orders qualify rn <= 2")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_alias")


def test_qualify_direct_window_not_projected(engine, duck):
    q = ("select o_orderkey, o_totalprice from orders qualify "
         "row_number() over (partition by o_orderstatus "
         "order by o_totalprice desc, o_orderkey) <= 3")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_direct")


def test_qualify_compound_predicate(engine, duck):
    """Alias reference mixed with plain column predicates — the rank
    reflects the PRE-filter partition (rows keep their original rn)."""
    q = ("select o_custkey, o_totalprice, row_number() over "
         "(partition by o_custkey order by o_totalprice desc, o_orderkey) "
         "as rn from orders qualify rn <= 3 and o_totalprice > 100000")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_compound")


def test_qualify_star(engine, duck):
    q = ("select * from orders qualify row_number() over "
         "(partition by o_custkey order by o_orderkey) = 1")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_star")


def test_qualify_with_where_order_limit(engine, duck):
    q = ("select o_custkey, o_totalprice, rank() over (partition by "
         "o_custkey order by o_totalprice desc) as r from orders "
         "where o_orderstatus = 'F' qualify r = 1 "
         "order by o_totalprice desc, o_custkey limit 10")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_owl")


def test_qualify_alias_inside_window_spec(engine, duck):
    """Aliases resolve inside the QUALIFY predicate's own OVER clause."""
    q = ("select o_custkey as k, o_totalprice as p from orders qualify "
         "row_number() over (partition by k order by p desc) = 1")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_alias_in_over")


def test_qualify_then_distinct(engine, duck):
    """DISTINCT applies AFTER the qualify filter (DuckDB order)."""
    q = ("select distinct o_orderstatus from orders qualify row_number() "
         "over (partition by o_custkey order by o_orderkey) <= 5")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_distinct")


# ---------------------------------------------------------------------------
# native path: aggregating queries
# ---------------------------------------------------------------------------

def test_qualify_over_group_by(engine, duck):
    q = ("select o_orderstatus, o_orderpriority, "
         "sum(o_totalprice) as s, rank() over (partition by o_orderstatus "
         "order by sum(o_totalprice) desc) as r from orders "
         "group by o_orderstatus, o_orderpriority qualify r <= 2 "
         "order by o_orderstatus, r")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_group")


def test_qualify_group_direct_window(engine, duck):
    """Window lives only in QUALIFY; its aggregate argument is
    materialized as a hidden column of the aggregated frame."""
    q = ("select o_orderstatus, count(*) as cnt from orders "
         "group by o_orderstatus qualify "
         "row_number() over (order by count(*) desc) = 1")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_group_direct")


def test_qualify_group_mixed_aliases(engine, duck):
    """Both a window alias and a plain aggregate alias in the predicate."""
    q = ("select o_orderpriority, count(*) as c, row_number() over "
         "(order by count(*) desc, o_orderpriority) as rn from orders "
         "group by o_orderpriority qualify rn <= 3 and c > 1")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_group_mixed")


def test_qualify_after_having(engine, duck):
    q = ("select o_custkey, count(*) as c from orders group by o_custkey "
         "having count(*) >= 2 qualify row_number() over "
         "(order by count(*) desc, o_custkey) <= 5")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_having")


# ---------------------------------------------------------------------------
# SQL-compilation path (subqueries present)
# ---------------------------------------------------------------------------

def test_qualify_with_in_subquery(engine, duck):
    q = ("select o_custkey, o_totalprice, row_number() over "
         "(partition by o_custkey order by o_totalprice desc, o_orderkey) "
         "as rn from orders where o_custkey in (select c_custkey from "
         "customer where c_nationkey = 1) qualify rn = 1")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_subquery")


def test_qualify_subquery_order_by_nonoutput(engine, duck):
    """On the desugared path, ORDER BY expressions that are not
    select-list outputs ride along as hidden inner items."""
    q = ("select o_orderkey, row_number() over (partition by o_custkey "
         "order by o_orderkey) as rn from orders where o_custkey in "
         "(select c_custkey from customer where c_nationkey = 2) "
         "qualify rn <= 2 order by o_totalprice desc limit 5")
    assert_matches_oracle(engine.sql(q), duck, q, "qualify_sub_order")


def test_qualify_sqlgen_shape():
    """The desugared SQL: inner select computes items + __qual, outer
    filters — and alias references inline the item expression."""
    sel = parse("select a, row_number() over (order by a) as rn from t "
                "qualify rn <= 2")
    sql = to_sql(sel)
    assert "__qual" in sql and "WHERE __qual" in sql
    assert sql.index("row_number() OVER") < sql.index("WHERE __qual")


def test_qualify_sqlgen_star_rejected():
    sel = parse("select * from t qualify row_number() over (order by a) = 1")
    with pytest.raises(UnsupportedError):
        to_sql(sel)


# ---------------------------------------------------------------------------
# errors
# ---------------------------------------------------------------------------

def test_qualify_requires_window(engine):
    with pytest.raises(PlanError, match="QUALIFY requires a window"):
        engine.sql("select o_orderkey from orders "
                   "qualify o_totalprice > 100")


def test_qualify_requires_window_even_with_aliases(engine):
    with pytest.raises(PlanError, match="QUALIFY requires a window"):
        engine.sql("select o_orderkey as k from orders qualify k > 100")


def test_qualify_requires_window_sqlgen_path(engine):
    with pytest.raises(PlanError, match="QUALIFY requires a window"):
        engine.sql("select o_orderkey from orders where o_custkey in "
                   "(select c_custkey from customer) "
                   "qualify o_totalprice > 100")


def test_qualify_nonrunning_rejected_on_stream(spark):
    import os
    import tempfile

    from flink_dsl_spark import FsqlEngine

    from .conftest import SF_DIR
    from .test_hints_ddl import _ddl_type

    eng = FsqlEngine(spark, streaming=True)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    d = tempfile.mkdtemp(prefix="qualify_stream_")
    os.symlink(f"{SF_DIR}/events.parquet",
               os.path.join(d, "events.parquet"))
    eng.sql("create stream qualify_ev ("
            + ", ".join(f"{f.name} {_ddl_type(f.dataType)}"
                        for f in ev.schema.fields)
            + f") source file ('{d}', 'parquet')")
    try:
        # partition-size-dependent ranking stays rejected on streams
        # (r9: QUALIFY over RUNNING aggregates; r10: row_number
        # graduated; r11: rank/dense_rank graduated too —
        # tests/test_streaming_over.py)
        with pytest.raises(PlanError, match="running aggregates"):
            eng.sql("select event_id from qualify_ev qualify "
                    "ntile(2) over (order by event_id) = 1")
    finally:
        eng.sql("drop stream qualify_ev")
