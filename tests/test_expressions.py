"""X-surface tests: expression-string parser + fluent Table API.

Covers every row of SURVEY.md §2.8-X (ExpressionParser.scala:34-203).
"""

import pytest
from pyspark.sql import Row

from flink_dsl_spark import (ParseError, parse_expression,
                             parse_expression_list)
from flink_dsl_spark.expressions import XTable


@pytest.fixture(scope="module")
def tbl(spark):
    df = spark.createDataFrame([
        Row(a=1, b=10, s="hello", f=1.5, ok=True, n=None),
        Row(a=2, b=20, s="world", f=2.5, ok=False, n=None),
        Row(a=3, b=30, s="spark", f=3.5, ok=True, n=7),
        Row(a=4, b=40, s="hello", f=4.5, ok=False, n=8),
    ], schema="a int, b int, s string, f double, ok boolean, n int")
    return XTable(df)


def _vals(xt, col=None):
    rows = xt.to_df().collect()
    if col is None:
        return rows
    return [r[col] for r in rows]


# --------------------------------------------------------------------------
# literals (ExpressionParser.scala:34-64)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("text,expected", [
    ("1", 1), ("42L", 42), ("7l", 7),
    ("1.5", 1.5), ("2.5f", 2.5), ("1.5F", 1.5),
    ("'abc'", "abc"), ('"abc"', "abc"),
    ("true", True), ("false", False),
    (r"'a\nb'", "a\nb"), (r'"qA"', "qA"),
])
def test_literals(spark, text, expected):
    got = spark.range(1).select(
        parse_expression(text).to_column().alias("v")).first()["v"]
    assert got == expected


# --------------------------------------------------------------------------
# field refs, suffix ops (:66-99)
# --------------------------------------------------------------------------

def test_field_ref_and_select(tbl):
    assert _vals(tbl.select("a"), "a") == [1, 2, 3, 4]


def test_is_null_suffix(tbl):
    assert _vals(tbl.select("n.isNull as x"), "x") == \
        [True, True, False, False]
    assert _vals(tbl.select("n.isNotNull as x"), "x") == \
        [False, False, True, True]


def test_abs_suffix(tbl):
    assert _vals(tbl.select("(0 - a).abs as x"), "x") == [1, 2, 3, 4]


def test_agg_suffixes(tbl):
    row = tbl.select(
        "a.sum as s, a.min as mn, a.max as mx, a.count as c, a.avg as av"
    ).to_df().first()
    assert (row["s"], row["mn"], row["mx"], row["c"], row["av"]) == \
        (10, 1, 4, 4, 2.5)


def test_as_suffix_form(tbl):
    # .as(name) defined at :85-87 (see module docstring on suffix set)
    assert _vals(tbl.select("a.as(renamed)"), "renamed") == [1, 2, 3, 4]


def test_substring_two_arg(tbl):
    # 1-based, inclusive end: 'hello'.substring(2,4) -> 'ell'
    assert _vals(tbl.select("s.substring(2, 4) as x"), "x") == \
        ["ell", "orl", "par", "ell"]


def test_substring_one_arg(tbl):
    # missing end = MAX_INT -> to end of string (:94-99)
    assert _vals(tbl.select("s.substring(3) as x"), "x") == \
        ["llo", "rld", "ark", "llo"]


def test_suffix_chaining_superset(tbl):
    # superset: reference allows one suffix per atom; we allow chains
    assert _vals(tbl.select("(0-a).abs.sum as x"), "x") == [10]


# --------------------------------------------------------------------------
# unary ops (:109-115)
# --------------------------------------------------------------------------

def test_unary_not(tbl):
    assert _vals(tbl.filter("!ok").select("a"), "a") == [2, 4]


def test_unary_minus(tbl):
    assert _vals(tbl.select("-a as x"), "x") == [-1, -2, -3, -4]


def test_unary_bitwise_not(tbl):
    assert _vals(tbl.select("~a as x"), "x") == [-2, -3, -4, -5]


# --------------------------------------------------------------------------
# precedence: bitwise TIGHTER than arithmetic (:119-133)
# --------------------------------------------------------------------------

def test_bitwise_binds_tighter_than_arithmetic(tbl):
    # a & 7 + 1  ==  (a & 7) + 1   (reference quirk, kept)
    assert _vals(tbl.select("a & 7 + 1 as x"), "x") == [2, 3, 4, 5]
    # a ^ 1 * 2  ==  (a ^ 1) * 2
    assert _vals(tbl.select("a ^ 1 * 2 as x"), "x") == [0, 6, 4, 10]


def test_arith_precedence(tbl):
    # * binds tighter than +
    assert _vals(tbl.select("1 + a * 10 as x"), "x") == [11, 21, 31, 41]


def test_div_mod(tbl):
    assert _vals(tbl.select("b / a as x"), "x") == [10.0, 10.0, 10.0, 10.0]
    assert _vals(tbl.select("a % 2 as x"), "x") == [1, 0, 1, 0]


# --------------------------------------------------------------------------
# comparisons (:137-168) and logic (:172-174)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("expr,expected", [
    ("a === 2", [2]),
    ("a = 2", [2]),
    ("a !== 2", [1, 3, 4]),
    ("a > 2", [3, 4]),
    ("a >= 2", [2, 3, 4]),
    ("a < 2", [1]),
    ("a <= 2", [1, 2]),
])
def test_comparisons(tbl, expr, expected):
    assert _vals(tbl.filter(expr).select("a"), "a") == expected


def test_logic_and_or(tbl):
    assert _vals(tbl.filter("a > 1 && a < 4").select("a"), "a") == [2, 3]
    assert _vals(tbl.filter("a === 1 || a === 4").select("a"), "a") == [1, 4]


def test_string_comparison(tbl):
    assert _vals(tbl.filter("s === 'hello'").select("a"), "a") == [1, 4]


# --------------------------------------------------------------------------
# alias, expression lists (:178-203)
# --------------------------------------------------------------------------

def test_trailing_as_alias(tbl):
    xt = tbl.select("a + b as total")
    assert xt.to_df().columns == ["total"]
    assert _vals(xt, "total") == [11, 22, 33, 44]


def test_expression_list(tbl):
    exprs = parse_expression_list("a, b as bb, a + 1")
    assert len(exprs) == 3
    df = tbl.select("a, b as bb, a + 1 as a1").to_df()
    assert df.columns == ["a", "bb", "a1"]


# --------------------------------------------------------------------------
# fluent API: group_by, join, set ops, order/limit
# --------------------------------------------------------------------------

def test_group_by_select(tbl):
    xt = tbl.group_by("s").select("s, b.sum as total, a.count as n")
    rows = {r["s"]: (r["total"], r["n"])
            for r in xt.to_df().collect()}
    assert rows == {"hello": (50, 2), "world": (20, 1), "spark": (30, 1)}


def test_group_by_rejects_non_key(tbl):
    with pytest.raises(ParseError):
        tbl.group_by("s").select("b, a.sum as t")


def test_global_agg_via_select(tbl):
    assert _vals(tbl.select("b.sum as t"), "t") == [100]


def test_join(tbl, spark):
    dim = XTable(spark.createDataFrame(
        [Row(k="hello", tag="H"), Row(k="world", tag="W")],
        schema="k string, tag string"))
    out = tbl.join(dim, on="s === k").select("a, tag")
    rows = sorted((r["a"], r["tag"]) for r in out.to_df().collect())
    assert rows == [(1, "H"), (2, "W"), (4, "H")]


def test_union_all_distinct(tbl):
    two = tbl.select("a").union_all(tbl.select("a"))
    assert len(_vals(two)) == 8
    assert sorted(_vals(two.distinct(), "a")) == [1, 2, 3, 4]


def test_order_by_limit(tbl):
    xt = tbl.order_by("a as desc").limit(2).select("a")
    assert _vals(xt, "a") == [4, 3]


# --------------------------------------------------------------------------
# errors
# --------------------------------------------------------------------------

@pytest.mark.parametrize("bad", [
    "a +", "(a", "a..b", "a.unknownSuffix", "1 2", "a as", "",
])
def test_parse_errors(bad):
    with pytest.raises(ParseError):
        parse_expression(bad)


def test_engine_table_handle(engine):
    xt = engine.table("events").filter("value > 100.0") \
                .group_by("event_type") \
                .select("event_type, value.count as n")
    assert xt.to_df().count() > 0
