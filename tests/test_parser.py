"""Parser tests: reference corpus, AST shape, error positions, and
property-based round-trips.

Mirrors-and-strengthens the reference's test strategy (SURVEY.md §5):
its ScalaCheck suite only asserts "parses successfully" over a fixed
corpus (test/parserTest.scala:47-81); we additionally assert AST shape,
faithful error positions, and a sqlgen fixed-point property.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_dsl_spark import ParseError, parse, parse_many
from flink_dsl_spark.ast_nodes import (
    CreateSchema, CreateStream, Delete, DerivedSource, DerivedTable,
    FileSource, HostSource, Insert, Join, Select, SetOp, TableRef, Update,
)
from flink_dsl_spark.sqlgen import to_sql

# --------------------------------------------------------------------------
# the reference's own embedded corpus (SURVEY.md §5) must parse
# --------------------------------------------------------------------------

REFERENCE_CORPUS = [
    # test/parserTest.scala:47-56
    "select * from stream [size 3 min on time every 1 partitioned on time]",
    "select id from stream [size 3] as s1 left join suoi [size 3] as s2 "
    "on s1.time = s2.thoigian",
    "select count(id) as i, 1+3 *2 as NUM from stream group by item "
    "having item > 3",
    "select id, s.speed, stream.time from stream as s",
    # fsql/parser.scala:405-431
    "select (age + p.hight) * 2 from person p "
    "where age >3 and hight <1 or weight = 2",
    "select p.age, j.type from person p join job j on p.job = j.id",
    "select p.age, j.type from person p join job j on p.job = j.id "
    "where p.age = 100",
    "select id from (select p.id from oldStream as p) as q",
    "create stream myStream(time long) as (select p.id from oldStream as p)",
    "create schema name1 (a boolean) extends parents",
    "create stream name1 name2 source file ('path')",
    # flinkdsl/parser.scala:324-364
    "select * from person where age = 10 and name = ?",
]


@pytest.mark.parametrize("sql", REFERENCE_CORPUS)
def test_reference_corpus_parses(sql):
    assert parse(sql) is not None


# --------------------------------------------------------------------------
# AST shape spot-checks
# --------------------------------------------------------------------------

def test_window_spec_fields():
    stmt = parse("select * from s [size 3 min on t every 1 "
                 "partitioned on k]")
    ref = stmt.from_
    assert isinstance(ref, TableRef)
    w = ref.window
    assert (w.size.value, w.size.unit, w.size.on_col.name) == (3, "min", "t")
    assert (w.every.value, w.every.unit) == (1, None)
    assert w.partition.name == "k"


def test_session_window_spec_fields():
    stmt = parse("select * from s [session 30 min on t "
                 "partitioned on k]")
    w = stmt.from_.window
    assert w.kind == "session"
    assert (w.size.value, w.size.unit, w.size.on_col.name) == \
        (30, "min", "t")
    assert w.every is None and w.partition.name == "k"
    # plain size specs keep the default kind
    w2 = parse("select * from s [size 5]").from_.window
    assert w2.kind == "size"


def test_windowed_join_shape():
    stmt = parse("select id from a [size 3] as s1 "
                 "left join b [size 3] as s2 on s1.x = s2.y")
    j = stmt.from_
    assert isinstance(j, Join) and j.kind == "left"
    assert j.left.window.size.value == 3 and j.left.alias == "s1"
    assert j.right.window.size.value == 3 and j.right.alias == "s2"


def test_join_chain_is_left_deep():
    stmt = parse("select * from a join b on a.x = b.x "
                 "join c on b.y = c.y cross join d")
    top = stmt.from_
    assert isinstance(top, Join) and top.kind == "cross"
    mid = top.left
    assert mid.kind == "inner" and mid.right.name == "c"
    assert mid.left.kind == "inner" and mid.left.left.name == "a"


def test_using_join_multi_col():
    stmt = parse("select * from a join b using (x, y)")
    assert stmt.from_.using == ["x", "y"]


def test_arithmetic_standard_precedence():
    # deliberate divergence from the reference's flat precedence
    # (SURVEY.md §7.0(1)): 1+3*2 must be 7, not 8
    stmt = parse("select 1 + 3 * 2 as n from t")
    e = stmt.items[0].expr
    assert e.op == "+" and e.right.op == "*"


def test_union_all_preserved():
    stmt = parse("select a from t union all select a from u")
    assert isinstance(stmt, SetOp) and stmt.op == "union_all"
    stmt2 = parse("select a from t union select a from u")
    assert stmt2.op == "union"


def test_create_schema_extends():
    stmt = parse("create schema child (a int, b string) extends parent")
    assert isinstance(stmt, CreateSchema)
    assert stmt.extends == "parent"
    assert [(c.name, c.type_name) for c in stmt.columns] == \
        [("a", "int"), ("b", "string")]


def test_create_stream_sources():
    f = parse("create stream s (a int) source file ('/tmp/x.csv')")
    assert isinstance(f.source, FileSource) and f.source.path == "/tmp/x.csv"
    h = parse("create stream s (a int) source host ('localhost', 9999)")
    assert isinstance(h.source, HostSource) and h.source.port == 9999
    d = parse("create stream s as (select a from t)")
    assert isinstance(d.source, DerivedSource)
    n = parse("create stream s named_schema source file ('p')")
    assert n.schema == "named_schema"


def test_insert_forms():
    v = parse("insert into t (a, b) values (1, 'x'), (2, 'y')")
    assert isinstance(v, Insert) and len(v.values) == 2
    q = parse("insert into t select a, b from u")
    assert isinstance(q, Insert) and isinstance(q.query, Select)


def test_update_delete_parse():
    u = parse("update t set a = 1, b = 'x' where c > 2 limit 5")
    assert isinstance(u, Update) and len(u.assignments) == 2
    d = parse("delete from t where a = 1")
    assert isinstance(d, Delete)


def test_params_are_positional():
    stmt = parse("select * from t where a = ? and b > ?")
    found = []
    from flink_dsl_spark.ast_nodes import Param, walk_expr
    for item in [stmt.where]:
        for e in walk_expr(item):
            if isinstance(e, Param):
                found.append(e.index)
    assert found == [0, 1]


def test_parse_many_script():
    stmts = parse_many("create schema s1 (a int); select 1 as x")
    assert len(stmts) == 2


def test_quoted_identifiers():
    stmt = parse('select "select" from "from"')
    assert stmt.items[0].expr.name == "select"
    assert stmt.from_.name == "from"


def test_derived_table_requires_alias_ok():
    stmt = parse("select q.a from (select a from t) as q")
    assert isinstance(stmt.from_, DerivedTable) and stmt.from_.alias == "q"


def test_for_update_parsed_and_discarded():
    """Trailing FOR UPDATE is a parse-and-discard no-op, parity with
    flinkdsl/parser.scala:27 (``<~ opt("for".i ~ "update".i)``)."""
    stmt = parse("select a from t where b > 1 for update")
    plain = parse("select a from t where b > 1")
    assert isinstance(stmt, Select)
    assert to_sql(stmt) == to_sql(plain)
    # composes with ORDER BY / LIMIT, set operations, and subselects
    # (the reference hangs the suffix on every selectStmt production)
    parse("select a from t order by a limit 3 for update")
    parse("select a from t union select a from u for update")
    sub = parse("select x.a from (select a from t for update) x")
    assert isinstance(sub.from_, DerivedTable)
    # FOR not followed by UPDATE keeps its pre-existing meaning: an
    # implicit relation alias ('for' is not reserved) — and anything
    # after that alias is still trailing input
    aliased = parse("select a from t for")
    assert aliased.from_.alias == "for"
    with pytest.raises(ParseError, match="trailing"):
        parse("select a from t for share")


def test_select_all_per_item_discarded():
    """Per-item ALL prefix is a parse-and-discard no-op, parity with
    the reference projection grammar (flinkdsl/parser.scala:30
    ``repsep((opt("all".i) ~> named), ",")``)."""
    stmt = parse("select all a, all b + 1 as c from t")
    plain = parse("select a, b + 1 as c from t")
    assert to_sql(stmt) == to_sql(plain)
    # ALL alone is not a projection
    with pytest.raises(ParseError):
        parse("select all from t")
    # agg(ALL x) stays the ANSI aggregate quantifier path, unchanged
    parse("select all count(a) from t group by b")


def test_delete_pre_from_target_list_discarded():
    """MySQL-style ``DELETE t1, t2 FROM …`` target list is parsed
    and discarded, parity with flinkdsl/parser.scala:64 (the
    reference's Delete AST drops the list)."""
    d = parse("delete t from t where a = 1")
    plain = parse("delete from t where a = 1")
    assert isinstance(d, Delete)
    assert d == plain          # dataclass equality: list discarded
    parse("delete t1, t2 from t1, t2 where a = 1")
    with pytest.raises(ParseError):
        parse("delete where a = 1")


def test_trailing_dot_numeric_literal():
    """``5.`` is a double literal, parity with the reference's
    numericLit ``\\d+(\\.\\d*)?`` (flinkdsl/parser.scala:319)."""
    stmt = parse("select 5. as x from t")
    assert stmt.items[0].expr.value == 5.0
    assert stmt.items[0].expr.type_name == "double"
    # integer contexts still reject it
    with pytest.raises(ParseError):
        parse("select a from t limit 5.")


def test_group_by_per_item_collate():
    """collate is per GROUP BY item, parity with
    flinkdsl/parser.scala:258 ``rep1sep(term <~ opt(collate), ",")``
    — parsed and discarded on any item, WITH ROLLUP still follows."""
    a = parse("select a, b, count(*) as n from t "
              "group by a collate c1, b")
    plain = parse("select a, b, count(*) as n from t group by a, b")
    assert to_sql(a) == to_sql(plain)
    parse("select a, b from t group by a, b collate c1 with rollup")
    parse("select a, b from t group by a collate c1, b collate c2")


def test_dash_identifiers_stay_arithmetic():
    """DELIBERATE divergence (SURVEY §7.0(6)): the reference's
    identValue regex allows '-' INSIDE identifiers, so its lexer
    reads unspaced ``a-b`` as ONE column named 'a-b' (and its own
    corpus spaces every subtraction).  Standard SQL lexing wins
    here: '-' is an operator; quote "a-b" to name such a column."""
    stmt = parse("select a-b from t")
    from flink_dsl_spark.ast_nodes import BinOp
    assert isinstance(stmt.items[0].expr, BinOp)
    assert stmt.items[0].expr.op == "-"
    q = parse('select "a-b" from t')
    assert q.items[0].expr.name == "a-b"


def test_tablesample_on_parenthesized_join_named_rejection():
    """r13 advice: the suffix after ``(a join b)`` must fail with a
    rejection that NAMES the clause, not generic trailing input."""
    with pytest.raises(ParseError, match="TABLESAMPLE.*parenthesized"):
        parse("select * from (a join b on a.id = b.id) "
              "tablesample(id, 100)")


# --------------------------------------------------------------------------
# error positions (parity with Failure(msg, column, line),
# fsql/package.scala:75)
# --------------------------------------------------------------------------

def test_error_has_position():
    with pytest.raises(ParseError) as ei:
        parse("select from t")
    assert ei.value.line == 1 and ei.value.column >= 8


def test_error_position_second_line():
    with pytest.raises(ParseError) as ei:
        parse("select a\nfrom t where")
    assert ei.value.line == 2


@pytest.mark.parametrize("bad", [
    "", "select", "select * from", "select * from t where",
    "select * from t group by", "create stream", "create schema x (",
    "select * from t [size]", "insert into t values",
    "select * from t order", "select a from t limit 'x'",
])
def test_bad_inputs_raise(bad):
    with pytest.raises(ParseError):
        parse(bad)


# --------------------------------------------------------------------------
# property-based tests (hypothesis; reference used ScalaCheck with
# minSuccessfulTests=3 — we run far more)
# --------------------------------------------------------------------------

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,9}", fullmatch=True).filter(
    lambda s: s not in {
        "select", "distinct", "from", "where", "as", "and", "or", "not",
        "join", "inner", "outer", "left", "right", "full", "cross", "on",
        "using", "group", "by", "having", "order", "asc", "desc", "limit",
        "offset", "union", "except", "intersect", "all", "insert", "into",
        "values", "update", "set", "delete", "create", "between", "like",
        "in", "exists", "is", "null", "case", "when", "then", "else",
        "end", "true", "false", "with", "size", "every", "partitioned",
    })

_literal = st.one_of(
    st.integers(min_value=0, max_value=10**9).map(str),
    st.floats(min_value=0, max_value=1e6, allow_nan=False,
              allow_infinity=False).map(lambda f: f"{f:.3f}"),
    st.sampled_from(["'abc'", "'it''s'", "true", "false", "null"]),
)


@st.composite
def _expr(draw, depth=0):
    if depth >= 3:
        return draw(st.one_of(_ident, _literal))
    branch = draw(st.integers(0, 5))
    if branch <= 1:
        return draw(st.one_of(_ident, _literal))
    if branch == 2:
        op = draw(st.sampled_from(["+", "-", "*", "/", "%"]))
        return (f"({draw(_expr(depth + 1))} {op} "
                f"{draw(_expr(depth + 1))})")
    if branch == 3:
        fn = draw(st.sampled_from(["sum", "avg", "count", "min", "max",
                                   "abs", "upper", "lower"]))
        return f"{fn}({draw(_expr(depth + 1))})"
    if branch == 4:
        return (f"case when {draw(_expr(depth + 1))} > 0 then "
                f"{draw(_expr(depth + 1))} else "
                f"{draw(_expr(depth + 1))} end")
    return f"({draw(_expr(depth + 1))})"


@st.composite
def _select_sql(draw):
    n = draw(st.integers(1, 4))
    # r14: the reference's per-item ALL prefix (parse-and-discard,
    # flinkdsl/parser.scala:30) may precede any projection item
    items = ", ".join(
        f"{'all ' if draw(st.booleans()) else ''}{draw(_expr())} as c{i}"
        for i in range(n))
    sql = f"select {items} from {draw(_ident)}"
    if draw(st.booleans()):
        sql += f" where {draw(_expr())} > {draw(_expr())}"
    if draw(st.booleans()):
        sql += f" group by {draw(_ident)}"
    if draw(st.booleans()):
        sql += f" order by c0 desc limit {draw(st.integers(1, 100))}"
    if draw(st.booleans()):
        # r14: trailing FOR UPDATE (parse-and-discard,
        # flinkdsl/parser.scala:27)
        sql += " for update"
    return sql


@settings(max_examples=200, deadline=None)
@given(_select_sql())
def test_generated_selects_parse(sql):
    assert isinstance(parse(sql), Select)


@settings(max_examples=100, deadline=None)
@given(_select_sql(), st.data())
def test_block_comments_are_whitespace(sql, data):
    """Inserting /* ... */ block comments (r6 tokenizer addition) at
    whitespace positions never changes the parse: the commented query
    must render to the same SQL as the original.  Also covers comment
    bodies containing newlines, dashes, and stray stars."""
    body = data.draw(st.sampled_from(
        ["note", "multi\nline", "-- inner dash", "a * b", "x**y", ""]))
    parts = sql.split(" ")
    if len(parts) > 1:
        pos = data.draw(st.integers(1, len(parts) - 1))
        parts.insert(pos, f"/* {body} */")
    commented = " ".join(parts)
    assert to_sql(parse(commented)) == to_sql(parse(sql))


@settings(max_examples=200, deadline=None)
@given(_select_sql())
def test_sqlgen_fixed_point(sql):
    """parse -> to_sql -> parse -> to_sql reaches a fixed point: the
    second generation equals the first (catches precedence/quoting bugs
    in both parser and generator)."""
    ast1 = parse(sql)
    sql1 = to_sql(ast1)
    ast2 = parse(sql1)
    assert to_sql(ast2) == sql1


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 999), st.sampled_from(["", " sec", " min", " h"]),
       st.integers(1, 999))
def test_window_spec_roundtrip(size, unit, every):
    sql = f"select count(a) as c from s [size {size}{unit} every {every}{unit}]"
    stmt = parse(sql)
    w = stmt.from_.window
    assert w.size.value == size
    assert w.every.value == every
    assert w.size.unit == (unit.strip() or None)


@settings(max_examples=100, deadline=None)
@given(_ident, _ident)
def test_identifier_resolution_shape(t, c):
    stmt = parse(f"select {t}.{c} from {t}")
    col = stmt.items[0].expr
    assert col.qualifier == t and col.name == c


def test_exponent_literals():
    """1e5 must parse as the double 100000.0, not literal 1 aliased e5
    (the number token accepts exponents without a decimal point)."""
    for sql, want in [("select 1e5 from s", 1e5),
                      ("select 2E-3 from s", 2e-3),
                      ("select 1.5e2 from s", 150.0),
                      ("select .5e1 from s", 5.0),
                      ("select 3e+4 from s", 3e4)]:
        item = parse(sql).items[0]
        assert item.alias is None, sql
        assert item.expr.type_name == "double", sql
        assert item.expr.value == want, sql
    # plain integers stay long, and a real alias still works
    item = parse("select 15 as e5 from s").items[0]
    assert item.expr.value == 15 and item.expr.type_name == "long"
    assert item.alias == "e5"
