"""WITH RECURSIVE (engine extension, late r8) — unlike plain WITH
(parse-time inlining), the tree renders as native WITH RECURSIVE SQL:
Spark >=4.0 and DuckDB both evaluate the fixpoint themselves.
Statement-level only; semantic cases run identical text on both
engines.
"""

import pytest

from flink_dsl_spark import ParseError, parse
from flink_dsl_spark.ast_nodes import RecursiveWith
from flink_dsl_spark.sqlgen import to_sql

from .conftest import normalize


def _cmp(engine_df, duck_rel):
    a = normalize(engine_df.toPandas())
    b = normalize(duck_rel.df())
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert (a[c].astype(str).values == b[c].astype(str).values).all(), c


def test_parses_to_recursive_with():
    q = parse("""with recursive r(n) as (select 1 union all
                 select n + 1 from r where n < 5) select n from r""")
    assert isinstance(q, RecursiveWith)
    assert q.ctes[0][0] == "r" and q.ctes[0][1] == ["n"]


def test_renders_native_sql():
    q = parse("""with recursive r(n) as (select 1 union all
                 select n + 1 from r where n < 5) select n from r""")
    sql = to_sql(q)
    assert sql.startswith("WITH RECURSIVE r (n) AS (")


def test_rejected_in_subquery_position():
    with pytest.raises(ParseError, match="statement level"):
        parse("""select * from (with recursive r(n) as (select 1)
                 select * from r) t""")


def test_explain_over_recursive(engine):
    df = engine.sql("explain with recursive r(n) as (select 1 "
                    "union all select n + 1 from r where n < 3) "
                    "select n from r")
    assert df.count() > 0


def test_duplicate_cte_name_rejected():
    with pytest.raises(ParseError, match="duplicate"):
        parse("""with recursive r as (select 1), r as (select 2)
                 select 1 from r""")


def test_hints_rejected_not_silently_dropped(engine):
    """r14 probe: WITH RECURSIVE renders through sqlgen, which never
    renders hints — a row hint buried in a CTE or the body must
    reject loudly (the _plan_via_sql rule), not run UNSAMPLED (a
    sample hint inside a recursive CTE silently kept all rows)."""
    from flink_dsl_spark.errors import PlanError
    with pytest.raises(PlanError, match="WITH RECURSIVE"):
        engine.sql("""with recursive r(doc_id) as (
                        select /*+ sample(doc_id, 100) */ doc_id
                        from documents)
                      select count(*) as n from r""")
    with pytest.raises(PlanError, match="WITH RECURSIVE"):
        engine.sql("""with recursive r(n) as (select 1)
                      select /*+ sample(n, 100) */ n from r""")


CASES = {
    "series_sum": """
        with recursive seq(n) as (
            select 1
            union all
            select n + 1 from seq where n < 100)
        select count(*) as c, cast(sum(n) as bigint) as s from seq""",
    "series_join_table": """
        with recursive seq(n) as (
            select 1
            union all
            select n + 1 from seq where n < 25)
        select s.n, count(*) as cnt
        from seq s join nation on n_nationkey = s.n - 1
        group by s.n order by s.n""",
    "transitive_closure": """
        with recursive paths(src, dst) as (
            select * from (values (1, 2), (2, 3), (3, 4), (10, 11))
                as e(src, dst)
            union all
            select p.src, e.dst
            from paths p
            join (values (1, 2), (2, 3), (3, 4), (10, 11))
                as e(src, dst)
              on p.dst = e.src)
        select src, dst from paths order by src, dst""",
    "second_nonrecursive_cte": """
        with recursive seq(n) as (
            select 0
            union all
            select n + 5 from seq where n < 20),
        caps as (select n_nationkey, n_name from nation)
        select seq.n, count(*) as c
        from seq join caps on n_nationkey >= seq.n
        group by seq.n order by seq.n""",
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_duckdb(name, engine, duck):
    sql = CASES[name]
    _cmp(engine.sql(sql), duck.sql(sql))
