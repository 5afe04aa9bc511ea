"""Late-r8 scalar-surface extensions: 1-based array subscripting (the
embedding columns become dialect-reachable) and ANSI bare HAVING (a
standalone HAVING makes the query one global group)."""

import pytest

from flink_dsl_spark import parse
from flink_dsl_spark.ast_nodes import Col, Lit, Subscript
from flink_dsl_spark.sqlgen import to_sql

from .conftest import assert_matches_oracle


# ---------------------------------------------------------------------------
# array subscript
# ---------------------------------------------------------------------------

def test_subscript_parses_and_chains():
    sel = parse("select a[1] as x, a[b + 1][2] as y from t")
    assert sel.items[0].expr == Subscript(Col("a"), Lit(1, "long"))
    outer = sel.items[1].expr
    assert isinstance(outer, Subscript) and isinstance(outer.expr,
                                                      Subscript)


def test_subscript_sqlgen_per_dialect():
    sel = parse("select a[1] as x from t")
    assert "try_element_at(a, 1)" in to_sql(sel)
    assert "(a)[1]" in to_sql(sel, dialect="ansi")


def test_subscript_filter(engine, duck):
    q = "select vec_id, label from embeddings where embedding[1] > 0.5"
    assert_matches_oracle(engine.sql(q), duck, q, "subscript_filter")


def test_subscript_out_of_range_is_null(engine, duck):
    q = ("select count(*) as n from embeddings "
         "where embedding[9999] is null")
    assert_matches_oracle(engine.sql(q), duck, q, "subscript_oob")


def test_subscript_in_aggregate(engine, duck):
    """min/max are accumulation-free, and float32 widens to double
    exactly, so the cross-engine premise is exact."""
    q = ("select label, count(*) as n, "
         "round(cast(min(embedding[1]) as double), 6) as mn, "
         "round(cast(max(embedding[1]) as double), 6) as mx "
         "from embeddings where embedding[1] > 0.25 group by label")
    assert_matches_oracle(engine.sql(q), duck, q, "subscript_agg")


def test_subscript_subquery_path(engine, duck):
    q = ("select vec_id from embeddings where embedding[1] > 0.9 "
         "and vec_id in (select vec_id from embeddings where label = 1)")
    assert_matches_oracle(engine.sql(q), duck, q, "subscript_subquery")


# ---------------------------------------------------------------------------
# bare HAVING
# ---------------------------------------------------------------------------

def test_bare_having_global_group(engine, duck):
    q = "select count(*) as n from orders having count(*) > 5"
    assert_matches_oracle(engine.sql(q), duck, q, "bare_having")


def test_bare_having_filters_out(engine, duck):
    q = ("select count(*) as n, round(sum(o_totalprice), 2) as s "
         "from orders having count(*) > 99999999")
    assert_matches_oracle(engine.sql(q), duck, q, "bare_having_empty")


# ---------------------------------------------------------------------------
# IS [NOT] DISTINCT FROM + multiset set operations
# ---------------------------------------------------------------------------

def test_is_distinct_from_nullsafe(engine, duck):
    """Null-safe comparison over outer-join nulls: IS DISTINCT FROM
    keeps NULL rows that plain <> drops."""
    q = ("select count(*) as n from customer left join orders "
         "on c_custkey = o_custkey "
         "where o_orderstatus is distinct from 'F'")
    assert_matches_oracle(engine.sql(q), duck, q, "is_distinct")


def test_is_not_distinct_from_null(engine, duck):
    q = ("select count(*) as n from customer left join orders "
         "on c_custkey = o_custkey "
         "where o_orderstatus is not distinct from null")
    assert_matches_oracle(engine.sql(q), duck, q, "is_not_distinct")


def test_is_distinct_sqlgen_dialects():
    sel = parse("select 1 as x from t where a is not distinct from b")
    assert "<=>" in to_sql(sel)
    assert "IS NOT DISTINCT FROM" in to_sql(sel, dialect="ansi")


def test_intersect_all(engine, duck):
    q = ("select n_regionkey as k from nation intersect all "
         "select n_regionkey as k from nation where n_nationkey < 10")
    assert_matches_oracle(engine.sql(q), duck, q, "intersect_all")


def test_except_all(engine, duck):
    """Multiset difference keeps surplus duplicates (5 regions × 5
    nations each minus one copy per early nation)."""
    q = ("select n_regionkey as k from nation except all "
         "select n_regionkey as k from nation where n_nationkey < 5")
    assert_matches_oracle(engine.sql(q), duck, q, "except_all")
