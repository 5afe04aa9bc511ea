"""UNPIVOT (engine extension, late r8) — columns-to-rows rotation,
desugared at parse time to a UNION ALL chain (one column-pruned leg
per IN column; ANSI default EXCLUDEs NULL measures, INCLUDE NULLS
keeps them).  DuckDB runs its native UNPIVOT on the same syntax, so
semantic cases compare identical text.
"""

import pytest

from flink_dsl_spark import ParseError, parse
from flink_dsl_spark.ast_nodes import DerivedTable, SetOp

from .conftest import normalize


def _cmp(engine_df, duck_rel):
    a = normalize(engine_df.toPandas())
    b = normalize(duck_rel.df())
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert (a[c].astype(str).values == b[c].astype(str).values).all(), c


def test_desugars_to_union_all():
    q = parse("""select * from (select k, a, b from t) s
                 unpivot (v for m in (a, b))""")
    dt = q.from_
    assert isinstance(dt, DerivedTable)
    assert isinstance(dt.query, SetOp) and dt.query.op == "union_all"
    left = dt.query.left
    names = [i.alias or i.expr.name for i in left.items]
    assert names == ["k", "m", "v"]
    assert left.where is not None          # NULL measures excluded


def test_include_nulls_drops_filter():
    q = parse("""select * from (select k, a, b from t) s
                 unpivot include nulls (v for m in (a, b))""")
    assert q.from_.query.left.where is None


def test_unknown_column_rejected():
    with pytest.raises(ParseError, match="not projected"):
        parse("""select * from (select k, a from t) s
                 unpivot (v for m in (zz))""")


def test_bare_table_source_rejected():
    with pytest.raises(ParseError, match="subquery source"):
        parse("select * from t unpivot (v for m in (a))")


def test_unpivot_as_table_name_still_parses():
    q = parse("select 1 from unpivot")
    assert q.from_.name == "unpivot"


CASES = {
    "basic_with_labels": """
        select * from (select p_partkey, cast(p_size as double)
                              as p_size, p_retailprice from part
                       where p_partkey < 20) src
        unpivot (val for measure in (p_size as 'size',
                                     p_retailprice as 'price'))
        order by p_partkey, measure""",
    "grouped_after": """
        select measure, count(*) as n, round(sum(val), 2) as total
        from (select p_partkey, cast(p_size as double) as p_size,
                     p_retailprice from part) src
        unpivot (val for measure in (p_size as 'size',
                                     p_retailprice as 'price'))
        group by measure order by measure""",
    "default_labels": """
        select measure, count(*) as n
        from (select c_custkey, c_acctbal, cast(c_nationkey as double)
                     as c_nationkey from customer) src
        unpivot (val for measure in (c_acctbal, c_nationkey))
        group by measure order by measure""",
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_duckdb_native(name, engine, duck):
    sql = CASES[name]
    _cmp(engine.sql(sql), duck.sql(sql))


def test_include_nulls_semantics(engine, duck):
    # craft NULLs via an outer-join-free case projection
    sql = """
        select measure, count(*) as n
        from (select o_orderkey,
                     case when o_totalprice > 200000
                          then o_totalprice end as big,
                     o_totalprice as price from orders) src
        unpivot include nulls (val for measure in (big as 'b',
                                                   price as 'p'))
        group by measure order by measure"""
    _cmp(engine.sql(sql), duck.sql(sql))
    sql_excl = sql.replace(" include nulls", "")
    _cmp(engine.sql(sql_excl), duck.sql(sql_excl))


def test_aliasless_source_with_unpivot_tail(engine, duck):
    """`(subquery) UNPIVOT (...)` with no source alias parses (r9) and
    matches the UNION ALL desugar DuckDB evaluates."""
    sdf = engine.sql("""
        select * from (select n_nationkey, n_regionkey as a,
                              n_nationkey % 3 as b from nation)
        unpivot (v for k in (a, b))
        order by n_nationkey, k""")
    duck_rel = duck.sql("""
        select n_nationkey, 'a' as k, n_regionkey as v from nation
        union all
        select n_nationkey, 'b' as k, n_nationkey % 3 as v from nation
        order by n_nationkey, k""")
    a = normalize(sdf.toPandas()); b = normalize(duck_rel.df())
    assert list(a.columns) == list(b.columns)
    assert a.values.tolist() == b.values.tolist()
