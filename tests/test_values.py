"""VALUES inline relations (engine extension) — ``(values (…), (…))
as t(a, b)`` desugars at parse time to a UNION ALL chain of FROM-less
selects, the same reuse-existing-machinery treatment WITH gets.  Also
covers the derived-table-with-WITH lookahead fix that landed with it."""

import pytest

from flink_dsl_spark import parse
from flink_dsl_spark.ast_nodes import DerivedTable, Select, SetOp
from flink_dsl_spark.errors import ParseError
from flink_dsl_spark.sqlgen import to_sql

from .conftest import assert_matches_oracle


def test_values_desugars_to_union_chain():
    sel = parse("select a from (values (1), (2), (3)) as t(a)")
    dt = sel.from_
    assert isinstance(dt, DerivedTable) and dt.alias == "t"
    assert isinstance(dt.query, SetOp) and dt.query.op == "union_all"
    assert isinstance(dt.query.left, SetOp)          # left-deep chain
    assert isinstance(dt.query.right, Select)
    assert dt.query.right.items[0].alias == "a"
    assert dt.query.right.from_ is None              # FROM-less select


def test_values_default_column_names():
    sel = parse("select col1 from (values (1, 'x')) as t")
    inner = sel.from_.query
    assert [i.alias for i in inner.items] == ["col1", "col2"]


def test_values_projection(engine, duck):
    q = "select a, b from (values (1, 'x'), (2, 'y'), (3, 'z')) as t(a, b)"
    assert_matches_oracle(engine.sql(q), duck, q, "values_proj")


def test_values_lookup_join(engine, duck):
    """The canonical use: a tiny inline dimension joined (and
    broadcast) against a real table."""
    q = ("select n_name, r from nation join "
         "(values (0, 'AFRICA'), (1, 'AMERICA'), (2, 'ASIA')) "
         "as lk(k, r) on n_regionkey = k")
    assert_matches_oracle(engine.sql(q), duck, q, "values_join")


def test_values_subquery_path(engine, duck):
    q = ("select c_custkey from customer where c_nationkey in "
         "(select k from (values (1), (3)) as v(k))")
    assert_matches_oracle(engine.sql(q), duck, q, "values_subquery")


def test_values_sqlgen_carries_explicit_names():
    """The rendered SQL names every column, so the text is portable
    even though raw VALUES default naming differs across engines
    (Spark col1…, DuckDB col0…)."""
    sql = to_sql(parse("select a from (values (1), (2)) as t(a)"),
                 dialect="ansi")
    assert "SELECT 1 AS a UNION ALL SELECT 2 AS a" in sql


def test_derived_table_with_cte(engine, duck):
    """`from (with … select …) t` — the lookahead accepts WITH and
    VALUES starts, not just SELECT."""
    q = ("select m from (with x as (select n_regionkey as m "
         "from nation) select m from x) as t where m > 2")
    assert_matches_oracle(engine.sql(q), duck, q, "derived_with")


def test_values_errors():
    with pytest.raises(ParseError, match="expressions"):
        parse("select a from (values (1), (2, 3)) as t(a)")
    with pytest.raises(ParseError, match="aliases"):
        parse("select a from (values (1, 2)) as t(a)")
    with pytest.raises(ParseError, match="alias"):
        parse("select a from (values (1))")
