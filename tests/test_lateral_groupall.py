"""LATERAL subqueries and GROUP BY ALL / ORDER BY ALL — late-r8 engine
extensions beyond the reference grammar (flinkdsl/parser.scala:151-185
has only plain derived tables; its GROUP BY takes explicit keys only).

Both surfaces are native DuckDB, so every semantic case runs identical
text on both engines.  GROUP BY ALL desugars at parse time to ordinals
(the r8 ordinal machinery carries it on both planner paths); LATERAL
always routes to the SQL path and resolves against the in-progress
FROM scope.
"""

import pytest

from flink_dsl_spark import ParseError, parse
from flink_dsl_spark.ast_nodes import DerivedTable, Lit

from .conftest import normalize


def _cmp(engine_df, duck_rel):
    a = normalize(engine_df.toPandas())
    b = normalize(duck_rel.df())
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert (a[c].astype(str).values == b[c].astype(str).values).all(), c


# ---------------------------------------------------------------------------
# parsing / desugar
# ---------------------------------------------------------------------------

def test_group_by_all_desugars_to_ordinals():
    q = parse("select n_regionkey, n_nationkey % 3 as m, count(*) as c "
              "from nation group by all")
    assert [g.value for g in q.group_by] == [1, 2]
    assert all(isinstance(g, Lit) for g in q.group_by)


def test_group_by_all_skips_nested_aggregates():
    q = parse("select n_regionkey, sum(n_nationkey) + 1 as s "
              "from nation group by all")
    assert [g.value for g in q.group_by] == [1]


def test_group_by_all_all_aggregates_is_global():
    q = parse("select count(*) as c, sum(x) as s from t group by all")
    assert q.group_by == []


def test_group_by_all_rejects_star():
    with pytest.raises(ParseError, match="ALL cannot expand"):
        parse("select * from t group by all")


def test_order_by_all_expands_every_item():
    q = parse("select a, b, c from t order by all desc")
    assert [o.expr.value for o in q.order_by] == [1, 2, 3]
    assert all(not o.ascending for o in q.order_by)


def test_order_by_all_rejects_star():
    # review finding (r8): a star's expansion width is unknown at
    # parse time, so the ordinal desugar would misalign
    with pytest.raises(ParseError, match="cannot expand"):
        parse("select * from t order by all")


def test_lateral_parses_and_requires_alias():
    q = parse("select 1 from t, lateral (select u.x from u) as d")
    leaves = list(q.from_.left for _ in [0])  # just check the tree
    assert any(isinstance(leaf, DerivedTable) and leaf.lateral
               for leaf in [q.from_.right])
    with pytest.raises(ParseError, match="alias"):
        parse("select 1 from t, lateral (select u.x from u)")


def test_lateral_as_table_name_still_parses():
    # contextual: a relation named `lateral` without a following paren
    q = parse("select 1 from lateral")
    assert q.from_.name == "lateral"


# ---------------------------------------------------------------------------
# semantics vs DuckDB (identical text)
# ---------------------------------------------------------------------------

def test_distinct_on_desugars_to_qualify():
    q = parse("""select distinct on (k) k, v from t
                 order by k, v desc""")
    assert q.qualify is not None and not q.distinct


def test_distinct_on_requires_order_by():
    with pytest.raises(ParseError, match="requires ORDER BY"):
        parse("select distinct on (k) k, v from t")


def test_plain_distinct_unaffected():
    q = parse("select distinct k from t")
    assert q.distinct and q.qualify is None


def test_distinct_on_setop_arm_requires_parens():
    # second-review finding: the arm's ORDER BY would hoist to the
    # whole set operation under standard scoping, diverging from the
    # desugar's per-group pick
    with pytest.raises(ParseError, match="parenthes"):
        parse("select k from t union all "
              "select distinct on (k) k from u order by k")
    with pytest.raises(ParseError, match="parenthes"):
        parse("select distinct on (k) k from u order by k "
              "union all select k from t")


CASES = {
    "distinct_on_best_per_group": """
        select distinct on (c_nationkey) c_nationkey, c_custkey,
               c_acctbal
        from customer
        order by c_nationkey, c_acctbal desc, c_custkey""",
    "distinct_on_nullable_key_asc": """
        select distinct on (k) k, v from
        (select c_nationkey % 3 as k,
                case when c_custkey % 7 = 0 then null
                     else c_acctbal end as v
         from customer) t
        order by k, v, 1""",
    "distinct_on_nullable_key_desc": """
        select distinct on (k) k, v from
        (select c_nationkey % 3 as k,
                case when c_custkey % 7 = 0 then null
                     else c_acctbal end as v
         from customer) t
        order by k, v desc, 1""",
    "distinct_on_alias_order": """
        select distinct on (o_custkey) o_custkey,
               o_totalprice as price, o_orderkey
        from orders where o_custkey < 40
        order by o_custkey, price desc, o_orderkey""",
    "gba_two_keys": """
        select n_regionkey, n_nationkey % 3 as m, count(*) as c
        from nation group by all order by all""",
    "gba_key_between_aggs": """
        select o_orderstatus, round(sum(o_totalprice), 2) as s,
               o_orderpriority, count(*) as c
        from orders group by all""",
    "gba_global": """
        select count(*) as c, round(sum(o_totalprice), 2) as s
        from orders group by all""",
    "gba_on_subquery_path": """
        select n_regionkey, count(*) as c from nation
        where n_nationkey in (select c_nationkey from customer)
        group by all""",
    "oba_desc_limit": """
        select n_regionkey, count(*) as c from nation
        group by all order by all desc limit 3""",
    "lateral_scalar_agg": """
        select o_orderkey, t.mx from orders,
        lateral (select round(max(l_extendedprice), 2) as mx
                 from lineitem
                 where l_orderkey = o_orderkey) as t
        order by o_orderkey limit 50""",
    "lateral_join_on_true": """
        select o_orderkey, t.mx from orders join
        lateral (select round(max(l_extendedprice), 2) as mx
                 from lineitem
                 where l_orderkey = o_orderkey) t on true
        where t.mx > 50000 order by o_orderkey limit 50""",
    "lateral_topk_per_group": """
        select n_nationkey, t.c_custkey from nation,
        lateral (select c_custkey from customer
                 where c_nationkey = n_nationkey
                 order by c_acctbal desc, c_custkey limit 2) as t
        order by n_nationkey, t.c_custkey""",
    "lateral_chained_after_join": """
        select n_name, r_name, t.c from nation
        join region on n_regionkey = r_regionkey,
        lateral (select count(*) as c from customer
                 where c_nationkey = n_nationkey) as t
        order by n_name""",
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_duckdb(name, engine, duck):
    sql = CASES[name]
    _cmp(engine.sql(sql), duck.sql(sql))
