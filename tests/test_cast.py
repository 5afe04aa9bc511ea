"""CAST(expr AS type) — engine extension (the reference's only typing
is the DDL palette, fsql/parser.scala:355; it has no cast expression).

Cross-engine notes encoded here (and in DIALECT.md): Spark TRUNCATES
double→integer casts toward zero where DuckDB ROUNDS, so float→int
oracles wrap the input in trunc(); decimal casts round HALF_UP in
Spark vs HALF_EVEN in DuckDB, so decimal behavior is pinned by direct
assertions, not an oracle."""

import pytest

from flink_dsl_spark import parse
from flink_dsl_spark.ast_nodes import Cast, Col
from flink_dsl_spark.errors import ParseError, PlanError
from flink_dsl_spark.sqlgen import to_sql

from .conftest import assert_matches_oracle


# ---------------------------------------------------------------------------
# parsing / sqlgen
# ---------------------------------------------------------------------------

def test_cast_parses():
    sel = parse("select cast(a as long) as x from t")
    c = sel.items[0].expr
    assert c == Cast(Col("a"), "long")


def test_cast_decimal_params():
    sel = parse("select cast(a as decimal(12, 2)) as x from t")
    c = sel.items[0].expr
    assert (c.type_name, c.precision, c.scale) == ("decimal", 12, 2)
    sel = parse("select cast(a as decimal(9)) as x from t")
    assert (sel.items[0].expr.precision, sel.items[0].expr.scale) == (9, 0)


def test_cast_nested_and_composable():
    sel = parse("select cast(a + b as double) as x, "
                "sum(cast(a as long)) as s from t group by a, b")
    assert isinstance(sel.items[0].expr, Cast)


def test_cast_errors():
    with pytest.raises(ParseError, match="type name"):
        parse("select cast(a as varchar2) from t")
    with pytest.raises(ParseError, match="integer"):
        parse("select cast(a as decimal(x, 2)) from t")


def test_cast_sqlgen():
    assert "CAST(a AS BIGINT)" in to_sql(
        parse("select cast(a as long) as x from t"))
    assert "CAST(a AS DECIMAL(12, 2))" in to_sql(
        parse("select cast(a as decimal(12, 2)) as x from t"))
    # parameterless decimal renders its default explicitly
    assert "CAST(a AS DECIMAL(38, 18))" in to_sql(
        parse("select cast(a as decimal) as x from t"))


# ---------------------------------------------------------------------------
# execution vs DuckDB
# ---------------------------------------------------------------------------

def test_cast_double_to_long_truncates(engine, duck):
    """Spark truncates toward zero; the oracle replicates with trunc()."""
    q = ("select o_orderkey, cast(o_totalprice as long) as p "
         "from orders where o_orderkey < 100")
    oracle = ("select o_orderkey, CAST(trunc(o_totalprice) AS BIGINT) "
              "as p from orders where o_orderkey < 100")
    assert_matches_oracle(engine.sql(q), duck, oracle, "cast_trunc")


def test_cast_aggregate_result(engine, duck):
    q = "select cast(sum(o_totalprice) as long) as s from orders"
    oracle = ("select CAST(trunc(sum(o_totalprice)) AS BIGINT) "
              "as s from orders")
    assert_matches_oracle(engine.sql(q), duck, oracle, "cast_agg")


def test_cast_int_to_string(engine, duck):
    q = ("select cast(o_orderkey as string) as k from orders "
         "where o_orderkey between 10 and 20")
    assert_matches_oracle(engine.sql(q), duck, q, "cast_str")


def test_cast_in_group_by(engine, duck):
    q = ("select cast(o_totalprice as long) / 100000 as bucket, "
         "count(*) as n from orders "
         "group by cast(o_totalprice as long) / 100000")
    oracle = q.replace("cast(o_totalprice as long)",
                       "CAST(trunc(o_totalprice) AS BIGINT)")
    assert_matches_oracle(engine.sql(q), duck, oracle, "cast_group")


def test_cast_on_subquery_path(engine, duck):
    q = ("select cast(o_totalprice as long) as p from orders "
         "where o_custkey in (select c_custkey from customer "
         "where c_nationkey = 3)")
    oracle = q.replace("cast(o_totalprice as long)",
                       "CAST(trunc(o_totalprice) AS BIGINT)")
    assert_matches_oracle(engine.sql(q), duck, oracle, "cast_subquery")


def test_cast_string_to_int_and_back(engine, duck):
    q = ("select cast(cast(o_orderkey as string) as int) as k "
         "from orders where o_orderkey < 25")
    assert_matches_oracle(engine.sql(q), duck, q, "cast_roundtrip")


# ---------------------------------------------------------------------------
# typed date/timestamp literals (sugar for CAST)
# ---------------------------------------------------------------------------

def test_typed_literal_parses_to_cast():
    sel = parse("select 1 as x from t where d >= date '1995-01-01'")
    c = sel.where.right
    assert isinstance(c, Cast) and c.type_name == "date"
    assert c.expr.value == "1995-01-01"
    # contextual: a column named date still parses as a column
    sel = parse("select date from t")
    assert isinstance(sel.items[0].expr, Col)


def test_date_literal_filter(engine, duck):
    """DATE vs TIMESTAMP comparison coerces identically on both
    engines under the UTC session premise."""
    q = ("select count(*) as n from orders "
         "where o_orderdate >= date '1995-01-01' "
         "and o_orderdate < date '1996-01-01'")
    assert_matches_oracle(engine.sql(q), duck, q, "date_lit")


def test_timestamp_literal_between(engine, duck):
    q = ("select count(*) as n from orders where o_orderdate between "
         "timestamp '1994-01-01 00:00:00' and "
         "timestamp '1996-12-31 23:59:59'")
    assert_matches_oracle(engine.sql(q), duck, q, "ts_lit")


# ---------------------------------------------------------------------------
# interval literals + EXTRACT
# ---------------------------------------------------------------------------

def test_interval_parses():
    from flink_dsl_spark.ast_nodes import IntervalLit
    sel = parse("select 1 as x from t where d > e - interval 90 day")
    assert sel.where.right.right == IntervalLit(90, "DAY")
    # plural + quoted-value forms normalize
    sel = parse("select 1 as x from t where d > e - interval '3' months")
    assert sel.where.right.right == IntervalLit(3, "MONTH")
    with pytest.raises(ParseError, match="integer"):
        parse("select interval 1.5 day from dual")
    with pytest.raises(ParseError, match="interval unit"):
        parse("select interval 3 fortnights from dual")


def test_extract_desugars_to_funccall():
    from flink_dsl_spark.ast_nodes import FuncCall
    sel = parse("select extract(year from d) as y from t")
    e = sel.items[0].expr
    assert isinstance(e, FuncCall) and e.name == "year"
    with pytest.raises(ParseError, match="extract field"):
        parse("select extract(dow from d) from t")


def test_interval_date_arithmetic(engine, duck):
    """TPC-H Q1's shipdate cutoff idiom."""
    q = ("select count(*) as n from lineitem "
         "where l_shipdate <= date '1998-12-01' - interval 90 day")
    assert_matches_oracle(engine.sql(q), duck, q, "interval_arith")


def test_interval_month_year_units(engine, duck):
    q = ("select count(*) as n from orders "
         "where o_orderdate >= timestamp '1995-06-01 00:00:00' "
         "- interval '3' months "
         "and o_orderdate < date '1994-01-01' + interval 2 years")
    assert_matches_oracle(engine.sql(q), duck, q, "interval_units")


def test_extract_group_by(engine, duck):
    q = ("select extract(year from o_orderdate) as y, count(*) as n "
         "from orders group by extract(year from o_orderdate)")
    oracle = ("select CAST(extract(year from o_orderdate) AS INT) as y, "
              "count(*) as n from orders "
              "group by extract(year from o_orderdate)")
    assert_matches_oracle(engine.sql(q), duck, oracle, "extract_group")


# ---------------------------------------------------------------------------
# decimal semantics pinned directly (HALF_UP — diverges from DuckDB)
# ---------------------------------------------------------------------------

def test_cast_decimal_rounds_half_up(engine):
    from decimal import Decimal
    row = engine.sql(
        "select cast(1.25 as decimal(3, 1)) as a, "
        "cast(-1.25 as decimal(3, 1)) as b from dual").collect()[0]
    assert row.a == Decimal("1.3") and row.b == Decimal("-1.3")


def test_cast_decimal_schema(engine):
    df = engine.sql("select cast(o_totalprice as decimal(12, 2)) as d "
                    "from orders")
    assert df.schema["d"].dataType.simpleString() == "decimal(12,2)"


def test_cast_overflow_and_bad_decimal(engine):
    with pytest.raises(PlanError, match="precision"):
        engine.sql("select cast(o_totalprice as decimal(50, 2)) as d "
                   "from orders")
