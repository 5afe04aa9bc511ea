"""Quantified comparisons (cmp ALL/ANY/SOME (subquery)) and the ANSI
aggregate FILTER (WHERE ...) clause — engine extensions beyond the
reference grammar (flinkdsl/parser.scala:125-150 has only IN/EXISTS).

The ALL/ANY rewrite's 3VL premises (empty set, null elements, null
left operand, NOT duality) are each pinned against DuckDB's native
quantified comparison on identical text.
"""

import duckdb
import pytest

from flink_dsl_spark import ParseError, parse
from flink_dsl_spark.ast_nodes import (
    BinOp, Case, FuncCall, QuantifiedCmp, UnOp,
)
from flink_dsl_spark.errors import PlanError, UnsupportedError
from flink_dsl_spark.sqlgen import to_sql

from .conftest import normalize


def _cmp(engine_df, duck_rel):
    a = normalize(engine_df.toPandas())
    b = normalize(duck_rel.df())
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert (a[c].astype(str).values == b[c].astype(str).values).all(), c


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def test_parse_quantified_all():
    q = parse("select 1 from orders where o_totalprice > all "
              "(select l_extendedprice from lineitem)")
    node = q.where
    assert isinstance(node, QuantifiedCmp)
    assert node.op == ">" and node.quant == "all"


def test_parse_some_normalizes_to_any():
    q = parse("select 1 from orders where o_totalprice < some "
              "(select l_extendedprice from lineitem)")
    assert q.where.quant == "any"


def test_parse_any_function_still_a_call():
    # `any` followed by a non-subquery paren is NOT a quantifier
    q = parse("select 1 from t where x = any_value(y)")
    assert isinstance(q.where, BinOp)


def test_quantified_binds_tighter_than_and():
    q = parse("select 1 from t where a > all (select b from u) and c = 1")
    assert isinstance(q.where, BinOp) and q.where.op == "and"
    assert isinstance(q.where.left, QuantifiedCmp)


def test_parse_filter_desugars_to_case():
    q = parse("select count(*) filter (where x > 1) as n from t")
    call = q.items[0].expr
    assert isinstance(call, FuncCall) and call.name == "count"
    assert isinstance(call.args[0], Case)


def test_filter_rejects_scalar_function():
    with pytest.raises(ParseError, match="aggregate"):
        parse("select upper(x) filter (where y > 1) from t")


def test_filter_rejects_null_keeping_aggs():
    with pytest.raises(ParseError, match="first"):
        parse("select first(x) filter (where y > 1) from t")


def test_filter_as_alias_still_parses():
    # contextual keyword: a column aliased `filter` without a paren
    q = parse("select count(*) filter from t")
    assert q.items[0].alias == "filter"


# ---------------------------------------------------------------------------
# sqlgen rendering
# ---------------------------------------------------------------------------

def test_sqlgen_any_renders_exists():
    q = parse("select 1 from t where a > any (select b from u)")
    sql = to_sql(q)
    assert "EXISTS" in sql and "NOT EXISTS" not in sql


def test_sqlgen_all_renders_not_exists_with_null_arm():
    q = parse("select 1 from t where a > all (select b from u)")
    sql = to_sql(q)
    assert "NOT EXISTS" in sql and "IS NULL" in sql


def test_sqlgen_not_all_flips_to_any():
    q = parse("select 1 from t where not (a > all (select b from u))")
    sql = to_sql(q)
    # duality: NOT(> ALL) ≡ <= ANY — a plain EXISTS, no NOT
    assert "NOT EXISTS" not in sql and "EXISTS" in sql and "<=" in sql


def test_sqlgen_duckdb_dialect_native():
    q = parse("select 1 from t where a > all (select b from u)")
    sql = to_sql(q, dialect="duckdb")
    assert "ALL (" in sql and "EXISTS" not in sql


def test_projection_position_rejected():
    q = parse("select (a > all (select b from u)) as f from t")
    with pytest.raises(UnsupportedError, match="predicates"):
        to_sql(q)


def test_comparison_operand_rejected():
    q = parse("select 1 from t where (a > all (select b from u)) = false")
    with pytest.raises(UnsupportedError, match="predicates"):
        to_sql(q)


def test_case_condition_position_allowed():
    q = parse("select 1 from t where case when a > all (select b from u)"
              " then true else false end")
    assert "NOT EXISTS" in to_sql(q)


def test_multi_column_subquery_rejected():
    q = parse("select 1 from t where a > all (select b, c from u)")
    with pytest.raises(PlanError, match="exactly one column"):
        to_sql(q)


def test_not_over_composition_rejected():
    # review finding (r8): NOT is anti-monotone, so the NULL->FALSE
    # collapse inside a composition under an odd NOT would turn
    # UNKNOWN rows into TRUE — rejected, not silently wrong
    q = parse("select 1 from t where not "
              "(a > all (select b from u) and c = 1)")
    with pytest.raises(UnsupportedError, match="De Morgan"):
        to_sql(q)


def test_even_not_over_composition_allowed():
    q = parse("select 1 from t where not not "
              "(a > all (select b from u) and c = 1)")
    assert "NOT EXISTS" in to_sql(q)


def test_double_not_direct_folds_to_plain_rewrite():
    # NOT NOT Q folds before the duality, so the rendering is the
    # plain (non-negated) rewrite — exact even with NULL elements
    q = parse("select 1 from t where not not (a > any (select b from u))")
    sql = to_sql(q)
    assert "NOT EXISTS" not in sql and "EXISTS" in sql and " > " in sql


def test_setop_order_by_quantified_rejected():
    q = parse("select a from t union all select b from u "
              "order by a > all (select 1)")
    with pytest.raises(UnsupportedError, match="ORDER BY"):
        to_sql(q)


def test_double_paren_subquery_accepted():
    q = parse("select 1 from t where a = any ((select b from u))")
    assert isinstance(q.where, QuantifiedCmp)


def test_having_aggregate_left_rejected():
    q = parse("select k, count(*) as n from t group by k "
              "having count(*) >= all (select 3)")
    with pytest.raises(UnsupportedError, match="HAVING"):
        to_sql(q)


# ---------------------------------------------------------------------------
# semantics vs DuckDB (identical text both engines)
# ---------------------------------------------------------------------------

QUANT_CASES = {
    "all_correlated": """
        select o_orderpriority, count(*) as n from orders
        where o_totalprice > all (select l_extendedprice * 10
                                  from lineitem
                                  where l_orderkey = o_orderkey)
        group by o_orderpriority""",
    "any_correlated": """
        select count(*) as n from orders
        where o_totalprice < some (select l_extendedprice from lineitem
                                   where l_orderkey = o_orderkey)""",
    "not_all_duality": """
        select count(*) as n from orders
        where not (o_totalprice > all (select l_extendedprice * 10
                                       from lineitem
                                       where l_orderkey = o_orderkey))""",
    "all_with_null_elements": """
        select count(*) as n from orders
        where o_totalprice > all (select case when l_quantity > 49
                                              then null
                                              else l_extendedprice end
                                  from lineitem
                                  where l_orderkey = o_orderkey)""",
    "all_empty_set_true": """
        select count(*) as n from orders
        where o_totalprice > all (select l_extendedprice from lineitem
                                  where l_orderkey = o_orderkey
                                    and l_quantity > 9999)""",
    "any_empty_set_false": """
        select count(*) as n from orders
        where o_totalprice > any (select l_extendedprice from lineitem
                                  where l_orderkey = o_orderkey
                                    and l_quantity > 9999)""",
    "eq_any_is_in": """
        select count(*) as n from orders
        where o_orderkey = any (select l_orderkey from lineitem
                                where l_quantity > 45)""",
    "ne_all_is_not_in": """
        select count(*) as n from orders
        where o_orderkey <> all (select l_orderkey from lineitem
                                 where l_quantity > 45)""",
    "double_not": """
        select count(*) as n from orders
        where not not (o_totalprice > any (select l_extendedprice * 15
                                           from lineitem
                                           where l_orderkey = o_orderkey))""",
    "having_group_key_left": """
        select o_custkey, count(*) as n from orders group by o_custkey
        having o_custkey > all (select o_custkey - 1 from orders
                                where o_orderstatus = 'ZZZ')""",
    "in_join_condition": """
        select count(*) as n
        from orders join lineitem
          on l_orderkey = o_orderkey
         and l_extendedprice > all (select 90000)""",
}


@pytest.mark.parametrize("name", sorted(QUANT_CASES))
def test_quantified_matches_duckdb(name, engine, duck):
    sql = QUANT_CASES[name]
    _cmp(engine.sql(sql), duck.sql(sql))


ILIKE_CASES = {
    "ilike_native_path": """
        select count(*) as n from customer
        where c_mktsegment ilike 'build%'""",
    "not_ilike": """
        select count(*) as n from customer
        where c_mktsegment not ilike '%a%'""",
    "ilike_sql_path": """
        select count(*) as n from orders
        where o_orderpriority ilike '%urgent'
          and o_custkey in (select c_custkey from customer)""",
}


@pytest.mark.parametrize("name", sorted(ILIKE_CASES))
def test_ilike_matches_duckdb(name, engine, duck):
    sql = ILIKE_CASES[name]
    _cmp(engine.sql(sql), duck.sql(sql))


FILTER_CASES = {
    "count_star_and_sum": """
        select o_orderstatus, count(*) as n,
               count(*) filter (where o_totalprice > 200000) as big,
               round(sum(o_totalprice)
                     filter (where o_orderpriority = '1-URGENT'), 2)
                   as urgent_total
        from orders group by o_orderstatus""",
    "count_distinct": """
        select count(distinct o_custkey)
               filter (where o_orderstatus = 'F') as nc
        from orders""",
    "avg_all_filtered_is_null": """
        select o_orderstatus,
               round(avg(o_totalprice)
                     filter (where o_totalprice < 0), 2) as neg_avg
        from orders group by o_orderstatus""",
    "filter_under_over": """
        select o_orderkey,
               count(*) filter (where o_orderstatus = 'F')
                   over (partition by o_custkey) as f_cnt
        from orders order by o_orderkey limit 100""",
}


@pytest.mark.parametrize("name", sorted(FILTER_CASES))
def test_filter_matches_duckdb(name, engine, duck):
    sql = FILTER_CASES[name]
    _cmp(engine.sql(sql), duck.sql(sql))
