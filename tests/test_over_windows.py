"""Analytic OVER windows (engine extension — SURVEY.md §2.5 records
that the reference has NO ranking/analytic clause; its "windows" are
stream policies).  Ranking, offset (lag/lead), value (first/last), and
aggregate-over-partition functions with optional ROWS/RANGE frames,
verified cell-exact against DuckDB."""

import pytest

from flink_dsl_spark import ParseError, parse
from flink_dsl_spark.ast_nodes import (
    Col, FuncCall, Lit, OrderItem, WindowFrame, WindowFunc,
)
from flink_dsl_spark.errors import PlanError

from .conftest import assert_matches_oracle


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def test_over_parses_to_window_func():
    sel = parse("select row_number() over (partition by a, b "
                "order by c desc, d) as rn from t")
    wf = sel.items[0].expr
    assert isinstance(wf, WindowFunc)
    assert wf.func == FuncCall("row_number", [])
    assert wf.partition_by == [Col("a"), Col("b")]
    assert wf.order_by == [OrderItem(Col("c"), False), OrderItem(Col("d"))]
    assert wf.frame is None


def test_over_frame_forms():
    sel = parse("select sum(x) over (order by y "
                "rows between 2 preceding and current row) as s from t")
    assert sel.items[0].expr.frame == WindowFrame(
        "rows", ("preceding", 2), ("current",))
    sel = parse("select sum(x) over (order by y "
                "rows unbounded preceding) as s from t")
    assert sel.items[0].expr.frame == WindowFrame(
        "rows", ("unbounded_preceding",), ("current",))
    sel = parse("select sum(x) over (order by y range between "
                "current row and unbounded following) as s from t")
    assert sel.items[0].expr.frame == WindowFrame(
        "range", ("current",), ("unbounded_following",))


def test_over_empty_and_nested():
    sel = parse("select count(*) over () as c, "
                "round(avg(x) over (partition by g), 2) as a from t")
    assert sel.items[0].expr == WindowFunc(FuncCall("count", [
        sel.items[0].expr.func.args[0]]), [], [], None)
    outer = sel.items[1].expr
    assert isinstance(outer, FuncCall) and outer.name == "round"
    assert isinstance(outer.args[0], WindowFunc)


def test_over_as_alias_still_parses():
    """`over` stays contextual: only consumed when followed by `(`."""
    sel = parse("select n_name over from nation")
    assert sel.items[0].alias == "over"


# ---------------------------------------------------------------------------
# semantics vs DuckDB
# ---------------------------------------------------------------------------

def test_ranking_functions_match_duckdb(engine, duck):
    q = """select o_custkey, o_orderkey,
                  row_number() over (partition by o_custkey
                      order by o_totalprice desc, o_orderkey) as rn,
                  rank() over (partition by o_custkey
                      order by o_orderstatus) as rk,
                  dense_rank() over (partition by o_custkey
                      order by o_orderstatus) as drk,
                  ntile(4) over (partition by o_custkey
                      order by o_orderkey) as quartile
           from orders where o_custkey < 200"""
    oracle = q.replace("as rn,", "as rn,") \
        .replace("row_number() over", "CAST(row_number() over", 1)
    # simpler: rebuild the oracle with int casts for the rank columns
    oracle = """select o_custkey, o_orderkey,
                  CAST(row_number() over (partition by o_custkey
                      order by o_totalprice desc, o_orderkey) AS INT) as rn,
                  CAST(rank() over (partition by o_custkey
                      order by o_orderstatus) AS INT) as rk,
                  CAST(dense_rank() over (partition by o_custkey
                      order by o_orderstatus) AS INT) as drk,
                  CAST(ntile(4) over (partition by o_custkey
                      order by o_orderkey) AS INT) as quartile
           from orders where o_custkey < 200"""
    assert_matches_oracle(engine.sql(q), duck, oracle, "ranking")


def test_fractional_ranks_match_duckdb(engine, duck):
    q = """select o_orderkey,
                  percent_rank() over (order by o_orderkey) as pr,
                  cume_dist() over (order by o_orderkey) as cd
           from orders where o_custkey < 50"""
    assert_matches_oracle(engine.sql(q), duck, q, "fractional")


def test_lag_lead_first_last_match_duckdb(engine, duck):
    q = """select o_custkey, o_orderkey,
                  lag(o_orderkey, 1, -1) over (partition by o_custkey
                      order by o_orderkey) as prev,
                  lead(o_orderkey) over (partition by o_custkey
                      order by o_orderkey) as next,
                  first_value(o_orderkey) over (partition by o_custkey
                      order by o_orderkey) as first_k,
                  last_value(o_orderkey) over (partition by o_custkey
                      order by o_orderkey
                      rows between unbounded preceding
                               and unbounded following) as last_k
           from orders where o_custkey < 200"""
    assert_matches_oracle(engine.sql(q), duck, q, "offset/value")


def test_nth_value_matches_duckdb(engine, duck):
    """nth_value (r10): frame-sensitive pick of the n-th frame row —
    NULL until the n-th row enters the running frame; explicit frames
    compose like first/last_value."""
    q = """select o_custkey, o_orderkey,
                  nth_value(o_orderkey, 2) over (partition by o_custkey
                      order by o_orderkey) as second_k,
                  nth_value(o_totalprice, 3) over (partition by o_custkey
                      order by o_orderkey
                      rows between unbounded preceding
                               and unbounded following) as third_price
           from orders where o_custkey < 200"""
    assert_matches_oracle(engine.sql(q), duck, q, "nth_value")


def test_nth_value_validates_args(engine):
    import pytest

    from flink_dsl_spark import PlanError
    with pytest.raises(PlanError, match="two arguments"):
        engine.sql("select nth_value(o_orderkey) over (order by "
                   "o_orderkey) as x from orders")
    with pytest.raises(PlanError, match="positive integer"):
        engine.sql("select nth_value(o_orderkey, 0) over (order by "
                   "o_orderkey) as x from orders")
    with pytest.raises(PlanError, match="positive integer"):
        engine.sql("select nth_value(o_orderkey, o_custkey) over "
                   "(order by o_orderkey) as x from orders")
    with pytest.raises(PlanError, match="requires ORDER BY"):
        engine.sql("select nth_value(o_orderkey, 2) over "
                   "(partition by o_custkey) as x from orders")


def test_agg_over_partition_and_frames_match_duckdb(engine, duck):
    q = """select o_custkey, o_orderkey,
                  sum(o_orderkey) over (partition by o_custkey) as tot,
                  count(*) over (partition by o_custkey
                      order by o_orderkey) as running_n,
                  min(o_orderkey) over (partition by o_custkey
                      order by o_orderkey
                      rows between 2 preceding and current row) as m3
           from orders where o_custkey < 200"""
    # DuckDB sum(BIGINT) promotes to HUGEINT — cast back
    oracle = q.replace("sum(o_orderkey) over (partition by o_custkey)",
                       "CAST(sum(o_orderkey) over (partition by "
                       "o_custkey) AS BIGINT)")
    assert_matches_oracle(engine.sql(q), duck, oracle, "agg-over")


def test_global_window_matches_duckdb(engine, duck):
    q = """select r_name,
                  count(*) over () as n,
                  sum(r_regionkey) over (order by r_name) as run
           from region"""
    oracle = q.replace(
        "sum(r_regionkey) over (order by r_name)",
        "CAST(sum(r_regionkey) over (order by r_name) AS BIGINT)")
    assert_matches_oracle(engine.sql(q), duck, oracle, "global")


def test_window_in_derived_table_top_k(engine, duck):
    """The top-k-per-group idiom: rank in a derived table, filter
    outside — and the plan collapses to WindowGroupLimit (per-task
    k-row heap, the 100 TB-safe shape)."""
    q = """select o_custkey, o_orderkey, rn
           from (select o_custkey, o_orderkey,
                        row_number() over (partition by o_custkey
                            order by o_totalprice desc, o_orderkey) as rn
                 from orders) as t
           where rn <= 3"""
    oracle = """select o_custkey, o_orderkey, CAST(rn AS INT) as rn
           from (select o_custkey, o_orderkey,
                        row_number() over (partition by o_custkey
                            order by o_totalprice desc, o_orderkey) as rn
                 from orders) as t
           where rn <= 3"""
    df = engine.sql(q)
    assert_matches_oracle(df, duck, oracle, "topk")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_window_on_sqlgen_path(engine, duck):
    """A subquery routes the statement to the SQL-compilation path —
    sqlgen must render the OVER clause (not reject it)."""
    q = """select o_orderkey,
                  row_number() over (partition by o_custkey
                      order by o_orderkey) as rn
           from orders
           where o_totalprice > (select avg(o_totalprice) from orders)
             and o_custkey < 50"""
    oracle = """select o_orderkey,
                  CAST(row_number() over (partition by o_custkey
                      order by o_orderkey) AS INT) as rn
           from orders
           where o_totalprice > (select avg(o_totalprice) from orders)
             and o_custkey < 50"""
    assert_matches_oracle(engine.sql(q), duck, oracle, "sqlgen")


# ---------------------------------------------------------------------------
# position / argument errors
# ---------------------------------------------------------------------------

def test_window_func_position_errors(engine):
    with pytest.raises(PlanError, match="not allowed in WHERE"):
        engine.sql("select o_custkey from orders "
                   "where row_number() over (order by o_orderkey) = 1")
    with pytest.raises(PlanError, match="not allowed in HAVING"):
        engine.sql("select o_custkey, count(*) as c from orders "
                   "group by o_custkey "
                   "having sum(o_orderkey) over () > 0")
    with pytest.raises(PlanError, match="not allowed in ORDER BY"):
        engine.sql("select o_custkey from orders "
                   "order by row_number() over (order by o_orderkey)")
    # GROUP BY + window in one SELECT is SUPPORTED (ANSI order; see
    # test_window_over_group_by_matches_duckdb) — sanity-check here
    df = engine.sql("select o_custkey, count(*) as c, "
                    "row_number() over (order by o_custkey) as rn "
                    "from orders group by o_custkey")
    assert set(df.columns) == {"o_custkey", "c", "rn"}


def test_window_func_argument_errors(engine):
    with pytest.raises(PlanError, match="requires ORDER BY"):
        engine.sql("select row_number() over (partition by o_custkey) "
                   "as rn from orders")
    with pytest.raises(PlanError, match="positive integer"):
        engine.sql("select ntile(0) over (order by o_orderkey) as n "
                   "from orders")
    with pytest.raises(PlanError, match="frame"):
        engine.sql("select rank() over (order by o_orderkey "
                   "rows between 1 preceding and current row) as r "
                   "from orders")
    with pytest.raises(PlanError, match="DISTINCT"):
        engine.sql("select count(distinct o_custkey) over () as c "
                   "from orders")
    with pytest.raises(PlanError, match="takes no arguments"):
        engine.sql("select rank(o_custkey) over (order by o_orderkey) "
                   "as r from orders")
    with pytest.raises(PlanError, match="not a supported window"):
        engine.sql("select upper(o_orderstatus) over "
                   "(order by o_orderkey) as u from orders")
    with pytest.raises(PlanError, match="default must be a literal"):
        engine.sql("select lag(o_orderkey, 1, o_custkey) over "
                   "(order by o_orderkey) as p from orders")


def test_nonrunning_window_func_rejected_on_stream(spark):
    from flink_dsl_spark import FsqlEngine
    eng = FsqlEngine(spark, streaming=True)
    import os
    import tempfile
    from .conftest import SF_DIR
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    d = tempfile.mkdtemp(prefix="over_stream_")
    os.symlink(f"{SF_DIR}/events.parquet",
               os.path.join(d, "events.parquet"))
    from tests.test_hints_ddl import _ddl_type
    eng.sql("create stream over_ev ("
            + ", ".join(f"{f.name} {_ddl_type(f.dataType)}"
                        for f in ev.schema.fields)
            + f") source file ('{d}', 'parquet')")
    try:
        # percent_rank stays rejected — it needs the partition SIZE,
        # which an unbounded stream never has (r9: running aggregates
        # streamed; r10: row_number/lag/first/last/nth_value
        # graduated; r11: rank/dense_rank graduated too —
        # tests/test_streaming_over.py)
        with pytest.raises(PlanError, match="running aggregates"):
            eng.sql("select percent_rank() over (order by event_id) "
                    "as rn from over_ev")
    finally:
        eng.sql("drop stream over_ev")


# ---------------------------------------------------------------------------
# window functions over GROUP BY (ANSI evaluation order)
# ---------------------------------------------------------------------------

def test_window_over_group_by_matches_duckdb(engine, duck):
    """`rank() over (order by sum(x))` beside GROUP BY: aggregates
    materialize first, the window evaluates over the aggregated rows
    (ANSI order) — including the share-of-total idiom."""
    q = """select o_custkey, count(*) as n, sum(o_orderkey) as s,
                  rank() over (order by sum(o_orderkey) desc,
                               o_custkey) as rk,
                  round(sum(o_orderkey) * 100.0
                        / sum(sum(o_orderkey)) over (), 3) as share
           from orders where o_custkey < 30 group by o_custkey"""
    oracle = """select o_custkey, count(*) as n,
                  CAST(sum(o_orderkey) AS BIGINT) as s,
                  CAST(rank() over (order by sum(o_orderkey) desc,
                               o_custkey) AS INT) as rk,
                  round(sum(o_orderkey) * 100.0
                        / CAST(sum(sum(o_orderkey)) over ()
                               AS BIGINT), 3) as share
           from orders where o_custkey < 30 group by o_custkey"""
    assert_matches_oracle(engine.sql(q), duck, oracle, "group-window")


def test_window_evaluates_after_having(engine, duck):
    q = """select o_custkey, count(*) as n,
                  row_number() over (order by count(*) desc,
                                     o_custkey) as rn
           from orders group by o_custkey having count(*) >= 12"""
    oracle = q.replace(
        "row_number() over (order by count(*) desc,\n"
        "                                     o_custkey)",
        "CAST(row_number() over (order by count(*) desc,\n"
        "                                     o_custkey) AS INT)")
    assert_matches_oracle(engine.sql(q), duck, oracle, "having-window")


def test_order_by_window_alias_in_agg_query(engine):
    q = """select o_custkey,
                  rank() over (order by sum(o_totalprice) desc) as rk
           from orders where o_custkey < 20 group by o_custkey
           order by rk"""
    assert [r["rk"] for r in engine.sql(q).collect()][:5] == \
        [1, 2, 3, 4, 5]


def test_window_over_rollup(engine):
    q = """select o_orderstatus, count(*) as n,
                  rank() over (order by count(*) desc) as rk
           from orders group by o_orderstatus with rollup"""
    rows = {r["o_orderstatus"]: r for r in engine.sql(q).collect()}
    # the rollup total row (NULL status) counts everything -> rank 1
    assert rows[None]["rk"] == 1


def test_non_grouped_column_in_window_errors(engine):
    with pytest.raises(PlanError, match="must appear in GROUP BY"):
        engine.sql("select o_custkey, "
                   "rank() over (order by o_totalprice) as r "
                   "from orders group by o_custkey")


def test_window_func_in_join_condition_errors(engine):
    with pytest.raises(PlanError, match="JOIN condition"):
        engine.sql(
            "select n_name from nation join region "
            "on row_number() over (order by r_regionkey) = n_regionkey")


# ---------------------------------------------------------------------------
# round-8 review findings (each was a confirmed live repro)
# ---------------------------------------------------------------------------

def test_duplicate_unaliased_window_items_in_agg_query(engine):
    """Two unaliased same-named window items beside GROUP BY must keep
    DISTINCT values (pre-fix the second withColumn overwrote the
    first, silently duplicating the DESC rank into both columns)."""
    df = engine.sql(
        "select o_orderstatus, "
        "rank() over (order by count(*), o_orderstatus) as r_asc, "
        "rank() over (order by count(*) desc, o_orderstatus desc) "
        "as r_desc "
        "from orders group by o_orderstatus")
    rows = df.collect()
    asc = {r["o_orderstatus"]: r["r_asc"] for r in rows}
    desc = {r["o_orderstatus"]: r["r_desc"] for r in rows}
    assert asc != desc          # opposite orders -> different ranks
    n = len(rows)
    assert all(asc[k] + desc[k] == n + 1 for k in asc)
    # truly unaliased duplicates keep both distinct value sets too
    df2 = engine.sql(
        "select o_orderstatus, "
        "rank() over (order by count(*)), "
        "rank() over (order by count(*) desc) "
        "from orders group by o_orderstatus")
    vals = [tuple(r) for r in df2.collect()]
    assert any(r[1] != r[2] for r in vals)


def test_lone_following_frame_bound_rejected(engine):
    """ANSI: only UNBOUNDED PRECEDING / n PRECEDING / CURRENT ROW may
    stand alone (a lone FOLLOWING implies an empty inverted frame that
    Spark would evaluate to all NULLs while DuckDB errors)."""
    with pytest.raises(ParseError, match="lone frame bound"):
        parse("select sum(x) over (order by y rows 2 following) as s "
              "from t")
    with pytest.raises(ParseError, match="lone frame bound"):
        parse("select sum(x) over (order by y rows unbounded following)"
              " as s from t")


def test_inverted_frame_rejected(engine):
    with pytest.raises(PlanError, match="inverted window frame"):
        engine.sql("select sum(o_orderkey) over (order by o_orderkey "
                   "rows between 2 following and 1 preceding) as s "
                   "from orders")
    with pytest.raises(PlanError, match="inverted window frame"):
        engine.sql("select sum(o_orderkey) over (order by o_orderkey "
                   "rows between current row and 1 preceding) as s "
                   "from orders")


def test_ntile_rejects_boolean_literal(engine):
    with pytest.raises(PlanError, match="positive integer"):
        engine.sql("select ntile(true) over (order by o_orderkey) as n "
                   "from orders")


# ---------------------------------------------------------------------------
# named WINDOW clause (late-r8 engine extension)
# ---------------------------------------------------------------------------

def test_named_window_shared_by_two_functions(engine, duck):
    """One declared window, two analytic functions over it — the spec
    is copied per reference at parse time, so downstream stages only
    ever see inline OVER specs."""
    q = ("select o_orderkey, row_number() over w as rn, "
         "sum(o_totalprice) over w as s from orders "
         "where o_orderkey < 100 "
         "window w as (partition by o_custkey order by o_orderkey)")
    oracle = q.replace("row_number() over w",
                       "CAST(row_number() over w AS INT)")
    assert_matches_oracle(engine.sql(q), duck, oracle, "named_window")


def test_named_window_with_qualify_either_order(engine, duck):
    oracle = ("select o_custkey, o_totalprice, "
              "CAST(row_number() over w AS INT) as rn from orders "
              "window w as (partition by o_custkey "
              "order by o_totalprice desc, o_orderkey) qualify rn = 1")
    for q in [
        ("select o_custkey, o_totalprice, row_number() over w as rn "
         "from orders window w as (partition by o_custkey "
         "order by o_totalprice desc, o_orderkey) qualify rn = 1"),
        ("select o_custkey, o_totalprice, row_number() over w as rn "
         "from orders qualify rn = 1 window w as (partition by "
         "o_custkey order by o_totalprice desc, o_orderkey)"),
    ]:
        assert_matches_oracle(engine.sql(q), duck, oracle,
                              "named_window_qualify")


def test_multiple_named_windows_with_frame(engine, duck):
    q = ("select o_orderkey, min(o_totalprice) over w3 as m3, "
         "count(*) over wc as c from orders where o_orderkey < 60 "
         "window w3 as (partition by o_custkey order by o_orderkey "
         "rows between 2 preceding and current row), "
         "wc as (partition by o_custkey)")
    assert_matches_oracle(engine.sql(q), duck, q, "named_windows_multi")


def test_named_window_errors_and_alias_compat():
    from flink_dsl_spark import parse
    with pytest.raises(ParseError, match="undefined window"):
        parse("select row_number() over w as r from orders")
    with pytest.raises(ParseError, match="duplicate window"):
        parse("select row_number() over w as r from orders "
              "window w as (order by a), w as (order by b)")
    # `over` alone is still an implicit alias; `window` works quoted
    assert parse("select o_orderkey over from orders").items[0] \
        .alias == "over"
    assert parse('select 1 as x from orders as "window"') \
        .from_.alias == "window"


# ---------------------------------------------------------------------------
# IGNORE NULLS (r11)
# ---------------------------------------------------------------------------

_NULLY = "case when value < 2.0 then null else value end"


def test_ignore_nulls_parses_and_respect_is_noop():
    sel = parse("select lag(x, 2) ignore nulls over (order by y) as a, "
                "lead(x) respect nulls over (order by y) as b from t")
    assert sel.items[0].expr.ignore_nulls is True
    assert sel.items[1].expr.ignore_nulls is False
    # contextual: columns named ignore/respect still parse
    sel = parse("select ignore, respect from t")
    assert sel.items[0].expr == Col("ignore")
    with pytest.raises(ParseError, match="OVER"):
        parse("select lag(x, 2) ignore nulls from t")
    # `over` present but malformed (followed by a reserved word, so
    # the contextual OVER block does not consume it): the treatment
    # must error, never silently drop with `over` re-parsed as an
    # alias (review finding, r11)
    with pytest.raises(ParseError, match="OVER"):
        parse("select lag(x, 1) ignore nulls over from t")
    with pytest.raises(ParseError, match="OVER"):
        parse("select lag(x, 1) respect nulls over from t")


def test_ignore_nulls_offset_functions_match_duckdb(engine, duck):
    """lag/lead IGNORE NULLS compile to the iterated last/first
    rewrite (PySpark lacks the native overload) — cell-exact against
    DuckDB's native null treatment, including the default fill."""
    q = f"""select event_id,
                   lag({_NULLY}, 2) ignore nulls over (partition by
                       user_id order by ts, event_id) as l2,
                   lag({_NULLY}, 1, -1.0) ignore nulls over (partition
                       by user_id order by ts, event_id) as l1d,
                   lead({_NULLY}, 3) ignore nulls over (partition by
                       user_id order by ts, event_id) as f3
            from events"""
    oracle = f"""select event_id,
                   lag({_NULLY}, 2 ignore nulls) over (partition by
                       user_id order by ts, event_id) as l2,
                   lag({_NULLY}, 1, -1.0 ignore nulls) over (partition
                       by user_id order by ts, event_id) as l1d,
                   lead({_NULLY}, 3 ignore nulls) over (partition by
                       user_id order by ts, event_id) as f3
            from events"""
    assert_matches_oracle(engine.sql(q), duck, oracle, "ignore_lag")


def test_ignore_nulls_value_functions_match_duckdb(engine, duck):
    frame = ("over (partition by user_id order by ts, event_id rows "
             "between unbounded preceding and current row)")
    q = f"""select event_id,
                   first_value({_NULLY}) ignore nulls {frame} as fv,
                   last_value({_NULLY}) ignore nulls {frame} as lv,
                   nth_value({_NULLY}, 2) ignore nulls {frame} as nv
            from events"""
    oracle = f"""select event_id,
                   first_value({_NULLY} ignore nulls) {frame} as fv,
                   last_value({_NULLY} ignore nulls) {frame} as lv,
                   nth_value({_NULLY}, 2 ignore nulls) {frame} as nv
            from events"""
    assert_matches_oracle(engine.sql(q), duck, oracle, "ignore_value")


def test_ignore_nulls_offset_zero_is_current_row(engine, duck):
    """Offset 0 is the current row on both engines even under IGNORE
    NULLS (null treatment skips prior rows only)."""
    q = f"""select event_id, lag({_NULLY}, 0) ignore nulls over (
                partition by user_id order by ts, event_id) as l0
            from events"""
    oracle = f"""select event_id, lag({_NULLY}, 0 ignore nulls) over (
                partition by user_id order by ts, event_id) as l0
            from events"""
    assert_matches_oracle(engine.sql(q), duck, oracle, "ignore_lag0")


def test_ignore_nulls_sql_path_renders(engine, duck):
    """The subquery (sqlgen) planner path renders the Spark post-paren
    spelling; semantics stay cell-exact vs DuckDB."""
    q = f"""select event_id,
                   lag({_NULLY}, 2) ignore nulls over (partition by
                       user_id order by ts, event_id) as l2
            from events
            where user_id in (select user_id from events
                              where event_type = 'click')"""
    oracle = f"""select event_id,
                   lag({_NULLY}, 2 ignore nulls) over (partition by
                       user_id order by ts, event_id) as l2
            from events
            where user_id in (select user_id from events
                              where event_type = 'click')"""
    assert_matches_oracle(engine.sql(q), duck, oracle, "ignore_sqlgen")


def test_ignore_nulls_rejections(engine):
    with pytest.raises(PlanError, match="IGNORE NULLS applies to"):
        engine.sql("select sum(value) ignore nulls over (order by ts) "
                   "as s from events")
    with pytest.raises(PlanError, match="IGNORE NULLS applies to"):
        engine.sql("select row_number() ignore nulls over (order by "
                   "ts) as rn from events")


def test_ignore_nulls_negative_offset_flips_direction(engine, duck):
    """lag(x, -k) IGNORE NULLS == lead(x, k) IGNORE NULLS on both
    engines; the rewrite gate must not silently drop the treatment
    for negative offsets (review finding, r11)."""
    q = f"""select event_id,
                   lag({_NULLY}, -2) ignore nulls over (partition by
                       user_id order by ts, event_id) as ln,
                   lead({_NULLY}, -1) ignore nulls over (partition by
                       user_id order by ts, event_id) as lp
            from events"""
    oracle = f"""select event_id,
                   lead({_NULLY}, 2 ignore nulls) over (partition by
                       user_id order by ts, event_id) as ln,
                   lag({_NULLY}, 1 ignore nulls) over (partition by
                       user_id order by ts, event_id) as lp
            from events"""
    assert_matches_oracle(engine.sql(q), duck, oracle, "ignore_neg")


def test_ignore_nulls_sql_path_rejects_unsupported(engine):
    """The sqlgen path mirrors the DataFrame path's applicability
    check — same clean scope message, never Spark's raw
    AnalysisException (review finding, r11)."""
    with pytest.raises(PlanError, match="IGNORE NULLS applies to"):
        engine.sql("""select sum(value) ignore nulls over (order by
            ts) as s from events
            where user_id in (select user_id from events)""")
