"""PIVOT (engine extension, late r8) — desugared at parse time to a
CASE-aggregation derived table, so both planner paths run ordinary
grouped SQL.  Naming rule matches Spark's and DuckDB's native PIVOT:
one unaliased aggregate -> the value label, otherwise
``label_aggalias``.  Values verified against DuckDB's NATIVE PIVOT
(same data, engine-independent evaluation).
"""

import pytest

from flink_dsl_spark import ParseError, parse
from flink_dsl_spark.ast_nodes import DerivedTable, Select

from .conftest import normalize


def _cmp(engine_df, duck_rel):
    a = normalize(engine_df.toPandas())
    b = normalize(duck_rel.df())
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert (a[c].astype(str).values == b[c].astype(str).values).all(), c


def test_desugars_to_grouped_derived_table():
    q = parse("""select * from (select a, k, v from t) s
                 pivot (sum(v) as s1 for k in (1 as one, 2 as two))""")
    dt = q.from_
    assert isinstance(dt, DerivedTable)
    inner = dt.query
    assert isinstance(inner, Select)
    names = [i.alias or i.expr.name for i in inner.items]
    assert names == ["a", "one_s1", "two_s1"]
    assert len(inner.group_by) == 1


def test_single_unaliased_agg_names_by_value():
    q = parse("""select * from (select k, v from t) s
                 pivot (sum(v) for k in ('X' as x, 'Y' as y))""")
    names = [i.alias for i in q.from_.query.items]
    assert names == ["x", "y"]       # v consumed by the agg; no group col


def test_bare_table_source_rejected():
    with pytest.raises(ParseError, match="subquery source"):
        parse("select * from t pivot (sum(v) for k in (1 as a))")


def test_multi_agg_requires_aliases():
    with pytest.raises(ParseError, match="alias on each"):
        parse("""select * from (select k, v from t) s
                 pivot (sum(v), count(*) for k in (1 as a))""")


def test_non_identifier_value_requires_label():
    with pytest.raises(ParseError, match="AS name"):
        parse("""select * from (select k, v from t) s
                 pivot (sum(v) for k in ('1-URGENT'))""")


def test_pivot_as_table_name_still_parses():
    q = parse("select 1 from pivot")
    assert q.from_.name == "pivot"


def test_values_match_duckdb_native_pivot(engine, duck):
    sdf = engine.sql("""
        select * from (select o_orderstatus, o_orderpriority,
                              o_totalprice from orders) src
        pivot (round(sum(o_totalprice), 2) as s, count(*) as n
               for o_orderstatus in ('F' as f, 'O' as o, 'P' as p))
        order by o_orderpriority""")
    duck_rel = duck.sql("""
        select o_orderpriority, round(f_s, 2) as f_s, f_n,
               round(o_s, 2) as o_s, o_n, round(p_s, 2) as p_s, p_n
        from (select * from (select o_orderstatus, o_orderpriority,
                                    o_totalprice from orders)
              pivot (sum(o_totalprice) as s, count(*) as n
                     for o_orderstatus in ('F' as f, 'O' as o,
                                           'P' as p)))""")
    _cmp(sdf, duck_rel)


def test_pivot_composes_with_where_and_subquery_path(engine, duck):
    # IN-subquery forces the SQL-compilation path through the desugar
    sdf = engine.sql("""
        select * from (select o_orderstatus, o_orderpriority
                       from orders
                       where o_custkey in (select c_custkey
                                           from customer)) src
        pivot (count(*) for o_orderstatus in ('F' as f, 'O' as o))
        order by o_orderpriority""")
    duck_rel = duck.sql("""
        select o_orderpriority,
               count(case when o_orderstatus = 'F' then 1 end) as f,
               count(case when o_orderstatus = 'O' then 1 end) as o
        from orders
        where o_custkey in (select c_custkey from customer)
        group by o_orderpriority""")
    _cmp(sdf, duck_rel)


def test_aliasless_source_with_pivot_tail(engine, duck):
    """`(subquery) PIVOT (...)` with no alias on the derived table is
    valid (DuckDB/Spark both accept it — the rotation output is the
    thing that gets named); the parser synthesizes a source alias so
    the desugar proceeds (r9: previously errored 'derived table
    requires an alias')."""
    sdf = engine.sql("""
        select * from (select n_regionkey, n_nationkey % 3 as m,
                              n_nationkey as v from nation)
        pivot (sum(v) as s, count(v) as c
               for m in (0 as m0, 1 as m1, 2 as m2))
        order by n_regionkey""")
    duck_rel = duck.sql("""
        select n_regionkey,
               cast(sum(case when n_nationkey % 3 = 0 then n_nationkey end) as bigint) as m0_s,
               count(case when n_nationkey % 3 = 0 then n_nationkey end) as m0_c,
               cast(sum(case when n_nationkey % 3 = 1 then n_nationkey end) as bigint) as m1_s,
               count(case when n_nationkey % 3 = 1 then n_nationkey end) as m1_c,
               cast(sum(case when n_nationkey % 3 = 2 then n_nationkey end) as bigint) as m2_s,
               count(case when n_nationkey % 3 = 2 then n_nationkey end) as m2_c
        from nation group by n_regionkey order by n_regionkey""")
    _cmp(sdf, duck_rel)


def test_aliasless_pivot_trailing_alias_scopes(engine):
    """A trailing alias AFTER the pivot tail names the rotated relation
    and is usable for qualified references."""
    df = engine.sql("""
        select p.n_regionkey, p.m0 from
        (select n_regionkey, n_nationkey % 3 as m, n_nationkey as v
         from nation)
        pivot (sum(v) for m in (0 as m0)) p
        order by p.n_regionkey""")
    assert df.columns == ["n_regionkey", "m0"]
    assert df.count() == 5


def test_two_aliasless_pivots_join_without_collision(engine):
    """r9 review: two aliasless rotated sources in one FROM get UNIQUE
    synthesized bindings (a fixed name would make the resolver reject
    a query DuckDB accepts, naming an identifier the user never
    wrote)."""
    df = engine.sql("""
        select * from
        (select n_regionkey, n_nationkey % 2 as m, n_nationkey as v
         from nation)
        pivot (sum(v) as s for m in (0 as a0, 1 as a1))
        join
        (select n_regionkey % 5 as rk, n_nationkey % 2 as m,
                n_nationkey as v from nation)
        pivot (count(v) as c for m in (0 as b0, 1 as b1))
        on n_regionkey = rk
        order by n_regionkey""")
    assert df.count() == 5
    assert set(df.columns) == {"n_regionkey", "a0_s", "a1_s",
                               "rk", "b0_c", "b1_c"}
