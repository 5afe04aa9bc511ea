"""LEFT SEMI / LEFT ANTI joins — engine extension (the reference
grammar has inner/left/right/full/cross only, flinkdsl/parser.scala:
96-104).  Semi/anti are THE distributed existence-filter shape: the
probe side never materializes in the output, so star expansion and
output schemas must exclude it (ast_nodes.visible_leaves).

DuckDB spells them bare (``SEMI JOIN``); Spark ``LEFT SEMI JOIN`` —
SqlGen renders per dialect, and every semantic case below compares
the engine against DuckDB's native form.
"""

import pytest

from flink_dsl_spark import parse
from flink_dsl_spark.sqlgen import to_sql

from .conftest import normalize


def _cmp(engine_df, duck_rel):
    a = normalize(engine_df.toPandas())
    b = normalize(duck_rel.df())
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert (a[c].astype(str).values == b[c].astype(str).values).all(), c


def test_parse_kinds():
    assert parse("select 1 from a left semi join b on x = y").from_.kind \
        == "semi"
    assert parse("select 1 from a left anti join b on x = y").from_.kind \
        == "anti"


def test_probe_column_rejected_at_resolution(engine):
    # review finding (r8): probe-side columns are ON-only — selecting
    # one fails with the engine's own resolution error, not a raw
    # Spark exception
    from flink_dsl_spark.errors import ResolutionError
    with pytest.raises(ResolutionError):
        engine.sql("select l_quantity from orders left semi join "
                   "lineitem on l_orderkey = o_orderkey")


def test_sqlgen_dialects():
    q = parse("select 1 from a left semi join b on x = y")
    assert "LEFT SEMI JOIN" in to_sql(q)
    assert "SEMI JOIN" in to_sql(q, dialect="duckdb")
    assert "LEFT SEMI" not in to_sql(q, dialect="duckdb")


# engine text -> duckdb text (bare SEMI/ANTI spelling)
CASES = {
    "semi_on_extra_pred": (
        """select n_name from nation left semi join customer
           on n_nationkey = c_nationkey and c_acctbal > 9000
           order by n_name""",
        """select n_name from nation semi join customer
           on n_nationkey = c_nationkey and c_acctbal > 9000
           order by n_name"""),
    "anti_on_extra_pred": (
        """select n_name from nation left anti join customer
           on n_nationkey = c_nationkey and c_acctbal > 9000
           order by n_name""",
        """select n_name from nation anti join customer
           on n_nationkey = c_nationkey and c_acctbal > 9000
           order by n_name"""),
    "semi_star_excludes_probe": (
        """select * from nation left semi join customer
           on n_nationkey = c_nationkey and c_acctbal > 9000""",
        """select * from nation semi join customer
           on n_nationkey = c_nationkey and c_acctbal > 9000"""),
    "semi_grouped": (
        """select o_orderpriority, count(*) as n
           from orders left semi join lineitem
           on l_orderkey = o_orderkey and l_quantity > 45
           group by o_orderpriority""",
        """select o_orderpriority, count(*) as n
           from orders semi join lineitem
           on l_orderkey = o_orderkey and l_quantity > 45
           group by o_orderpriority"""),
    "semi_on_sql_path": (
        # the IN-subquery forces the SQL-compilation path, so the
        # Spark LEFT SEMI rendering executes end-to-end
        """select count(*) as n
           from orders left semi join lineitem
           on l_orderkey = o_orderkey and l_quantity > 45
           where o_custkey in (select c_custkey from customer
                               where c_acctbal > 0)""",
        """select count(*) as n
           from orders semi join lineitem
           on l_orderkey = o_orderkey and l_quantity > 45
           where o_custkey in (select c_custkey from customer
                               where c_acctbal > 0)"""),
    "semi_derived_probe": (
        """select count(*) as n from orders left semi join
           (select o_custkey as k from orders
            group by o_custkey having count(*) > 5) t
           on o_custkey = t.k""",
        """select count(*) as n from orders semi join
           (select o_custkey as k from orders
            group by o_custkey having count(*) > 5) t
           on o_custkey = t.k"""),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_duckdb(name, engine, duck):
    sq, dq = CASES[name]
    _cmp(engine.sql(sq), duck.sql(dq))
