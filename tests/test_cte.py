"""WITH common table expressions (engine extension — the reference
grammar has none).  Non-recursive CTEs desugared at parse time: each
reference inlines as a derived-table copy, so the resolver, both
planner paths, and sqlgen operate on ASTs they already support.
Results pinned cell-exact against DuckDB's native WITH."""

import pytest

from flink_dsl_spark import parse
from flink_dsl_spark.ast_nodes import DerivedTable, Select, TableRef
from flink_dsl_spark.errors import ParseError

from .conftest import assert_matches_oracle


# ---------------------------------------------------------------------------
# parsing / desugar
# ---------------------------------------------------------------------------

def test_cte_desugars_to_derived_table():
    sel = parse("with t as (select a from x) select a from t")
    assert isinstance(sel, Select)
    assert isinstance(sel.from_, DerivedTable)
    assert sel.from_.alias == "t"
    assert isinstance(sel.from_.query, Select)
    assert isinstance(sel.from_.query.from_, TableRef)
    assert sel.from_.query.from_.name == "x"


def test_cte_reference_alias_wins():
    sel = parse("with t as (select a from x) select b.a from t as b")
    assert sel.from_.alias == "b"


def test_cte_chain_inlines_earlier_into_later():
    sel = parse("with t as (select a from x), "
                "u as (select a from t) select a from u")
    u = sel.from_
    assert u.alias == "u"
    inner = u.query.from_
    assert isinstance(inner, DerivedTable) and inner.alias == "t"


def test_cte_double_reference_copies():
    sel = parse("with t as (select a from x) "
                "select l.a from t as l join t as r on l.a = r.a")
    left, right = sel.from_.left, sel.from_.right
    assert isinstance(left, DerivedTable) and isinstance(right, DerivedTable)
    assert left.query is not right.query      # independent copies


def test_cte_scoping_is_non_recursive():
    """An earlier CTE's reference to a name a LATER CTE takes must keep
    pointing at the base relation (standard WITH scoping)."""
    sel = parse("with a as (select c from b), "
                "b as (select c from a) select c from b")
    b = sel.from_
    assert b.alias == "b"
    a = b.query.from_
    assert isinstance(a, DerivedTable) and a.alias == "a"
    assert isinstance(a.query.from_, TableRef)     # base b, not CTE b
    assert a.query.from_.name == "b"


def test_cte_in_subquery_position():
    sel = parse("with t as (select a from x) "
                "select b from y where b in (select a from t)")
    sub = sel.where.query
    assert isinstance(sub.from_, DerivedTable) and sub.from_.alias == "t"


def test_cte_errors():
    # WITH RECURSIVE is now a supported statement-level form
    # (t:recursive_cte); in subquery position it still rejects
    with pytest.raises(ParseError, match="statement level"):
        parse("select * from (with recursive t(n) as (select 1) "
              "select n from t) d")
    # a PLAIN with that references itself stays an error (the
    # inliner cannot resolve it; spell it WITH RECURSIVE instead)
    with pytest.raises(ParseError, match="recursive"):
        parse("with t as (select a from t) select a from t")
    with pytest.raises(ParseError, match="duplicate"):
        parse("with t as (select 1 as x from d), "
              "t as (select 2 as y from d) select 1 as z from d")
    with pytest.raises(ParseError, match="column alias"):
        parse("with t (a, b) as (select 1 as x, 2 as y from d) "
              "select a from t")


# ---------------------------------------------------------------------------
# execution vs DuckDB
# ---------------------------------------------------------------------------

def test_cte_filter_aggregate(engine, duck):
    q = ("with big as (select o_custkey, o_totalprice from orders "
         "where o_totalprice > 200000) "
         "select o_custkey, count(*) as n from big group by o_custkey")
    assert_matches_oracle(engine.sql(q), duck, q, "cte_agg")


def test_cte_chain_join_base_table(engine, duck):
    q = ("with big as (select o_custkey, o_totalprice from orders "
         "where o_totalprice > 200000), "
         "agg as (select o_custkey, count(*) as n from big "
         "group by o_custkey) "
         "select c_nationkey, sum(n) as total from agg "
         "join customer on o_custkey = c_custkey group by c_nationkey")
    oracle = q.replace("sum(n) as total", "CAST(sum(n) AS BIGINT) AS total")
    assert_matches_oracle(engine.sql(q), duck, oracle, "cte_chain")


def test_cte_self_join(engine, duck):
    q = ("with t as (select o_orderstatus, count(*) as n from orders "
         "group by o_orderstatus) "
         "select a.o_orderstatus, a.n from t as a "
         "join t as b on a.o_orderstatus = b.o_orderstatus")
    assert_matches_oracle(engine.sql(q), duck, q, "cte_self_join")


def test_cte_with_subquery_path(engine, duck):
    q = ("with big as (select o_custkey from orders "
         "where o_totalprice > 300000) "
         "select c_custkey from customer where c_custkey in "
         "(select o_custkey from big)")
    assert_matches_oracle(engine.sql(q), duck, q, "cte_subquery")


def test_cte_union_body(engine, duck):
    q = ("with lo as (select o_orderkey from orders "
         "where o_totalprice < 1000), "
         "hi as (select o_orderkey from orders "
         "where o_totalprice > 400000) "
         "select o_orderkey from lo union all select o_orderkey from hi")
    assert_matches_oracle(engine.sql(q), duck, q, "cte_union")


def test_cte_nested_with(engine, duck):
    q = ("with x as (with y as (select o_orderstatus, o_totalprice "
         "from orders) select o_orderstatus, "
         "round(sum(o_totalprice), 2) as s from y group by o_orderstatus) "
         "select o_orderstatus, s from x")
    assert_matches_oracle(engine.sql(q), duck, q, "cte_nested")


def test_cte_with_qualify(engine, duck):
    q = ("with r as (select o_custkey, o_totalprice, row_number() over "
         "(partition by o_custkey order by o_totalprice desc, o_orderkey) "
         "as rn from orders) "
         "select o_custkey, o_totalprice from r where rn = 1")
    assert_matches_oracle(engine.sql(q), duck, q, "cte_window")
