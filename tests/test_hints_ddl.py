"""The dialect-level scale surfaces (engine extensions beyond the
reference grammar): the ``/*+ salt(key, n) */`` join hint that routes
an equi-join through the salted physical plan (skew.py), and the
``CREATE TABLE ... BUCKETED BY ... AS select`` DDL that pre-pays a
join/agg shuffle at write time (bucketing.py).

Result-equality is the contract for both: salting and bucketing change
ONLY the physical distribution, never the row set.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_dsl_spark import FsqlEngine, ParseError, parse
from flink_dsl_spark.ast_nodes import CreateBucketedTable, Hint, Select
from flink_dsl_spark.errors import PlanError

from .conftest import SF_DIR


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def test_hint_parses_onto_select():
    sel = parse("select /*+ salt(n_nationkey, 8) */ n_name "
                "from nation join region on n_regionkey = r_regionkey")
    assert isinstance(sel, Select)
    assert sel.hints == [Hint("salt", ["n_nationkey", 8])]


def test_multiple_hints_and_comma_separation():
    sel = parse("select /*+ salt(a, 4), salt(b, 2) */ x from t")
    assert sel.hints == [Hint("salt", ["a", 4]), Hint("salt", ["b", 2])]
    sel = parse("select /*+ salt(a, 4) */ /*+ salt(b, 2) */ x from t")
    assert [h.name for h in sel.hints] == ["salt", "salt"]


def test_plain_block_comment_is_skipped():
    sel = parse("select /* just a note */ n_name from nation")
    assert sel.hints == []
    # mid-expression and multi-line block comments are whitespace
    sel = parse("select n_name /* a\n b */ from nation /* tail */")
    assert isinstance(sel, Select)


def test_malformed_hint_errors_with_position():
    with pytest.raises(ParseError):
        parse("select /*+ salt(a, */ x from t")
    with pytest.raises(ParseError):
        parse("select /*+ 42(a) */ x from t")


def test_create_table_parses():
    stmt = parse("create table fat_orders bucketed by (o_custkey) "
                 "into 8 buckets sorted by (o_orderkey) as "
                 "select * from orders")
    assert isinstance(stmt, CreateBucketedTable)
    assert stmt.name == "fat_orders"
    assert stmt.bucket_cols == ["o_custkey"]
    assert stmt.num_buckets == 8
    assert stmt.sort_cols == ["o_orderkey"]


def test_create_table_rejects_fractional_bucket_count():
    with pytest.raises(ParseError):
        parse("create table t bucketed by (k) into 2.5 buckets "
              "as select * from orders")
    # exponent forms tokenize as 'number' but aren't integers either
    with pytest.raises(ParseError):
        parse("create table t bucketed by (k) into 2e1 buckets "
              "as select * from orders")
    with pytest.raises(ParseError, match=">= 1"):
        parse("create table t bucketed by (k) into 0 buckets "
              "as select * from orders")


def test_unclosed_hint_reports_unclosed():
    with pytest.raises(ParseError, match="unclosed hint"):
        parse("select /*+ salt(a, 4 */ x from t")


# ---------------------------------------------------------------------------
# salt hint planning
# ---------------------------------------------------------------------------

def test_salted_on_join_matches_unsalted(engine):
    base = ("select n_name, count(*) as cnt "
            "from nation join customer on n_nationkey = c_nationkey "
            "group by n_name")
    hinted = base.replace("select ",
                          "select /*+ salt(c_nationkey, 4) */ ", 1)
    assert _rows(engine.sql(hinted)) == _rows(engine.sql(base))


def test_salted_using_join_matches_unsalted(engine, spark):
    # same-named key both sides: project customer's nationkey to match
    engine.register(
        "cust_n",
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
             .selectExpr("c_custkey", "c_nationkey as n_nationkey"))
    base = ("select n_name, count(*) as cnt "
            "from nation join cust_n using (n_nationkey) group by n_name")
    hinted = base.replace("select ",
                          "select /*+ salt(n_nationkey, 4) */ ", 1)
    assert _rows(engine.sql(hinted)) == _rows(engine.sql(base))


def test_salt_hint_changes_the_physical_plan(engine):
    hinted = engine.sql(
        "select /*+ salt(c_nationkey, 4) */ n_name, c_custkey "
        "from nation join customer on n_nationkey = c_nationkey")
    assert "__salt" in _plan(hinted)
    unhinted = engine.sql(
        "select n_name, c_custkey "
        "from nation join customer on n_nationkey = c_nationkey")
    assert "__salt" not in _plan(unhinted)


def test_salt_left_join_preserves_unmatched_left(engine):
    base = ("select n_name, c_custkey from nation "
            "left join customer on n_nationkey = c_nationkey "
            "and c_acctbal > 9999998")
    hinted = base.replace("select ",
                          "select /*+ salt(c_nationkey, 4) */ ", 1)
    b, h = _rows(engine.sql(base)), _rows(engine.sql(hinted))
    assert h == b and any(c is None for _n, c in b)


def test_salt_rejects_outer_semantics(engine):
    with pytest.raises(PlanError, match="inner/left"):
        engine.sql("select /*+ salt(c_nationkey, 4) */ n_name "
                   "from nation right join customer "
                   "on n_nationkey = c_nationkey")


def test_salt_unmatched_key_errors(engine):
    with pytest.raises(PlanError, match="matched no equi-join"):
        engine.sql("select /*+ salt(no_such_col, 4) */ n_name "
                   "from nation join region on n_regionkey = r_regionkey")


def test_unknown_hint_name_errors(engine):
    with pytest.raises(PlanError, match="unknown hint"):
        engine.sql("select /*+ broadcast(nation) */ n_name from nation")


def test_bad_salt_args_error(engine):
    with pytest.raises(PlanError, match="salt hint takes"):
        engine.sql("select /*+ salt(c_nationkey) */ n_name "
                   "from nation join customer "
                   "on n_nationkey = c_nationkey")
    with pytest.raises(PlanError, match="salt hint takes"):
        engine.sql("select /*+ salt(c_nationkey, 0) */ n_name "
                   "from nation join customer "
                   "on n_nationkey = c_nationkey")


def test_salt_hint_rejected_on_sqlgen_path(engine):
    with pytest.raises(PlanError, match="subqueries"):
        engine.sql(
            "select /*+ salt(c_nationkey, 4) */ n_name from nation "
            "join customer on n_nationkey = c_nationkey "
            "where c_acctbal > (select avg(c_acctbal) from customer)")


def test_salt_hint_rejected_on_sqlgen_path_in_setop_branch(engine):
    """A hint buried in ONE branch of a set operation whose OTHER
    branch forces the SQL-compilation path must still be rejected —
    sqlgen never renders hints, so dropping it would be the silent
    no-op the hint contract forbids."""
    with pytest.raises(PlanError, match="subqueries"):
        engine.sql(
            "select /*+ salt(c_nationkey, 4) */ n_name as v "
            "from nation join customer on n_nationkey = c_nationkey "
            "union all "
            "select n_name as v from nation where n_nationkey in "
            "(select c_nationkey from customer)")


def test_salt_hint_collision_guard_is_two_sided(engine, spark):
    """drop(sl, sr) after the salted join removes EVERY column with
    those names, so a user column named __salt_l on the RIGHT side
    must be rejected, not silently dropped from the result."""
    engine.register(
        "cust_saltcol",
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
             .selectExpr("c_custkey", "c_nationkey",
                         "c_acctbal as __salt_l"))
    with pytest.raises(PlanError, match="__salt"):
        engine.sql("select /*+ salt(c_nationkey, 4) */ n_name "
                   "from nation join cust_saltcol "
                   "on n_nationkey = c_nationkey")


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.sampled_from(["join", "left join"]),
       st.integers(1, 9),
       st.sampled_from(["", " where n_nationkey % 3 = 0",
                        " where c_acctbal > 0 and n_regionkey < 3",
                        " where c_mktsegment like 'B%'"]))
def test_salted_join_always_equals_unsalted(engine, how, n, where):
    """Property: for any join kind the hint supports, any salt factor,
    and any predicate, the salted plan's row set equals the unsalted
    one — salting is physical-only (the q42 oracle's premise)."""
    base = (f"select n_name, c_custkey from nation {how} customer "
            f"on n_nationkey = c_nationkey{where}")
    hinted = base.replace(
        "select ", f"select /*+ salt(c_nationkey, {n}) */ ", 1)
    assert _rows(engine.sql(hinted)) == _rows(engine.sql(base))


# ---------------------------------------------------------------------------
# CREATE TABLE ... BUCKETED BY ... AS
# ---------------------------------------------------------------------------

@pytest.fixture()
def no_broadcast(spark):
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_create_bucketed_table_roundtrip(engine, spark, no_broadcast):
    try:
        engine.sql("create table orders_by_cust bucketed by (o_custkey) "
                   "into 8 buckets sorted by (o_custkey) as "
                   "select o_orderkey, o_custkey, o_totalprice "
                   "from orders")
        # catalog table carries the bucket spec (qualified name: the
        # FSQL registration also creates a temp view that would shadow
        # the catalog table in an unqualified DESCRIBE)
        from flink_dsl_spark.bucketing import bucket_spec
        spec = bucket_spec(spark, "default.orders_by_cust")
        assert spec["num_buckets"] == 8
        assert spec["bucket_cols"] == ["o_custkey"]
        # an aggregation on the bucket key scans pre-partitioned data:
        # no exchange before the final agg
        agg = engine.sql("select o_custkey, count(*) as cnt "
                         "from orders_by_cust group by o_custkey")
        assert "Exchange hashpartitioning" not in _plan(agg)
        # and the rows equal the unbucketed computation
        base = engine.sql("select o_custkey, count(*) as cnt "
                          "from orders group by o_custkey")
        assert _rows(agg) == _rows(base)
    finally:
        # the FSQL registration ALSO made a temp view with this name;
        # an unqualified DROP would hit the view and leave the managed
        # table's location behind (LOCATION_ALREADY_EXISTS on rerun)
        spark.catalog.dropTempView("orders_by_cust")
        spark.sql("DROP TABLE IF EXISTS default.orders_by_cust")


def test_create_bucketed_table_overwrites_cleanly(engine, spark):
    """Re-running the same CREATE must overwrite and stay readable —
    without the post-overwrite refreshTable, Spark's cached file
    listing points at the DELETED previous files and the second read
    fails with FAILED_READ_FILE.FILE_NOT_EXIST."""
    ddl = ("create table t_rerun_b bucketed by (r_regionkey) into 2 "
           "buckets as select r_regionkey, r_name from region")
    try:
        engine.sql(ddl)
        first = _rows(engine.sql("select r_regionkey from t_rerun_b"))
        engine.sql(ddl)
        assert _rows(engine.sql(
            "select r_regionkey from t_rerun_b")) == first
    finally:
        spark.catalog.dropTempView("t_rerun_b")
        spark.sql("DROP TABLE IF EXISTS default.t_rerun_b")


def test_create_bucketed_table_self_heals_stale_location(engine, spark):
    """A leftover warehouse directory with NO catalog entry (the
    fresh-session case: the in-memory catalog forgets, the filesystem
    doesn't) must not fail the CREATE with LOCATION_ALREADY_EXISTS —
    the engine removes the orphaned location first."""
    import os
    import shutil
    from urllib.parse import urlparse
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    stale = os.path.join(wh, "t_selfheal_b")
    spark.sql("DROP TABLE IF EXISTS default.t_selfheal_b")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("stale")
    try:
        engine.sql("create table t_selfheal_b bucketed by (r_regionkey) "
                   "into 2 buckets as select r_regionkey from region")
        assert len(_rows(engine.sql(
            "select r_regionkey from t_selfheal_b"))) == 5
    finally:
        spark.catalog.dropTempView("t_selfheal_b")
        spark.sql("DROP TABLE IF EXISTS default.t_selfheal_b")
        shutil.rmtree(stale, ignore_errors=True)


def test_drop_stream_and_table_lifecycle(engine, spark):
    """DROP closes the CREATE lifecycle: DROP STREAM unregisters a
    derived/file relation; DROP TABLE removes a bucketed table AND its
    data; a typo'd kind can never silently delete data."""
    import os
    from urllib.parse import urlparse
    from flink_dsl_spark.ast_nodes import DropRelation
    stmt = parse("drop table if exists t0")
    assert stmt == DropRelation("t0", "table", True)
    assert parse("drop stream s1") == DropRelation("s1", "stream", False)

    eng = engine
    eng.sql("create stream tmp_drop as (select r_regionkey from region)")
    assert eng.catalog.has("tmp_drop")
    eng.sql("drop stream tmp_drop")
    assert not eng.catalog.has("tmp_drop")
    with pytest.raises(PlanError, match="unknown stream"):
        eng.sql("drop stream tmp_drop")
    eng.sql("drop stream if exists tmp_drop")          # no error

    eng.sql("create table tmp_drop_b bucketed by (r_regionkey) into 2 "
            "buckets as select r_regionkey from region")
    with pytest.raises(PlanError, match="use DROP TABLE"):
        eng.sql("drop stream tmp_drop_b")              # kind guard
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    assert os.path.isdir(os.path.join(wh, "tmp_drop_b"))
    eng.sql("drop table tmp_drop_b")
    assert not eng.catalog.has("tmp_drop_b")
    assert not spark.catalog.tableExists("default.tmp_drop_b")
    assert not os.path.isdir(os.path.join(wh, "tmp_drop_b"))


def test_drop_table_guards_and_cross_session_orphan(engine, spark):
    import os
    from urllib.parse import urlparse
    eng = engine
    # reverse kind guard: DROP TABLE must refuse a streaming relation
    stream_eng = FsqlEngine(spark, streaming=True)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    import tempfile
    d = tempfile.mkdtemp(prefix="drop_guard_")
    os.symlink(f"{SF_DIR}/events.parquet",
               os.path.join(d, "events.parquet"))
    stream_eng.sql(
        "create stream live_ev ("
        + ", ".join(f"{f.name} {_ddl_type(f.dataType)}"
                    for f in ev.schema.fields)
        + f") source file ('{d}', 'parquet')")
    assert stream_eng.catalog.get("live_ev").isStreaming
    with pytest.raises(PlanError, match="use DROP STREAM"):
        stream_eng.sql("drop table live_ev")
    stream_eng.sql("drop stream live_ev")

    # quoted name with a dash must not crash the existence check
    eng.sql('drop table if exists "no-such-table"')

    # cross-session orphan: a leftover warehouse dir the (in-memory)
    # catalog no longer owns is removed by DROP TABLE
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    orphan = os.path.join(wh, "tmp_orphan_b")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("stale")
    eng.sql("drop table if exists tmp_orphan_b")
    assert not os.path.isdir(orphan)


def _ddl_type(dt):
    from pyspark.sql import types as T
    return {T.LongType(): "long", T.IntegerType(): "int",
            T.DoubleType(): "double", T.StringType(): "string",
            T.TimestampType(): "timestamp",
            T.TimestampNTZType(): "timestamp"}.get(dt, "string")


def test_create_bucketed_table_validates_columns(engine, spark):
    with pytest.raises(PlanError, match="not in"):
        engine.sql("create table t_bad bucketed by (nope) into 4 "
                   "buckets as select o_orderkey from orders")


# ---------------------------------------------------------------------------
# round-7 ADVICE hardening: path containment, kind metadata, hint guard
# ---------------------------------------------------------------------------


def test_drop_quoted_name_cannot_escape_warehouse(engine, spark):
    """A quoted identifier containing '/' or '..' reaches the engine
    verbatim; the orphan-cleanup rmtree must refuse any path that is
    not a DIRECT child of the warehouse root."""
    import os
    import tempfile
    from urllib.parse import urlparse
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    victim = tempfile.mkdtemp(prefix="victim_outside_wh_")
    marker = os.path.join(victim, "keep.txt")
    with open(marker, "w") as f:
        f.write("do not delete")
    rel = os.path.relpath(victim, wh)          # e.g. ../../tmp/victim...
    # traversal name: resolves outside the warehouse -> not an orphan,
    # not known, not a catalog table => "unknown table", nothing deleted
    with pytest.raises(PlanError, match="unknown table"):
        engine.sql(f'drop table "{rel}"')
    assert os.path.isfile(marker)
    engine.sql(f'drop table if exists "{rel}"')   # silent no-op
    assert os.path.isfile(marker)
    # a nested name (contains '/') inside the warehouse is ALSO refused:
    # only direct children are candidate orphans
    nested = os.path.join(wh, "nest_a", "nest_b")
    os.makedirs(nested, exist_ok=True)
    try:
        engine.sql('drop table if exists "nest_a/nest_b"')
        assert os.path.isdir(nested)
    finally:
        import shutil
        shutil.rmtree(os.path.join(wh, "nest_a"), ignore_errors=True)


def test_create_bucketed_self_heal_is_contained(engine, spark):
    """_create_bucketed_table's stale-location rmtree gets the same
    containment guard as DROP: a traversal name must never delete a
    directory outside the warehouse, whatever else fails."""
    import os
    import tempfile
    from urllib.parse import urlparse
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    victim = tempfile.mkdtemp(prefix="victim_bkt_")
    marker = os.path.join(victim, "keep.txt")
    with open(marker, "w") as f:
        f.write("do not delete")
    rel = os.path.relpath(victim, wh)
    try:
        engine.sql(f'create table "{rel}" bucketed by (r_regionkey) '
                   "into 2 buckets as select r_regionkey from region")
    except Exception:
        pass            # the weird name may fail later in saveAsTable
    assert os.path.isfile(marker)


def test_drop_table_refuses_batch_mode_stream(engine, spark):
    """Kind guard on DECLARED kind: in batch mode a file/derived CREATE
    STREAM registers a non-streaming DataFrame, so isStreaming alone
    would let DROP TABLE silently unregister (and potentially delete a
    same-named stale dir for) a stream."""
    import os
    from urllib.parse import urlparse
    eng = engine
    eng.sql("create stream tmp_kindguard as "
            "(select r_regionkey from region)")
    assert not eng.catalog.get("tmp_kindguard").isStreaming  # batch mode
    # plant a same-named stale warehouse dir: the old guard would have
    # deleted it via the orphan path
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    stale = os.path.join(wh, "tmp_kindguard")
    os.makedirs(stale, exist_ok=True)
    try:
        with pytest.raises(PlanError, match="use DROP STREAM"):
            eng.sql("drop table tmp_kindguard")
        assert eng.catalog.has("tmp_kindguard")
        assert os.path.isdir(stale)
        # INSERT re-registers the relation; declared kind must survive
        eng.sql("insert into tmp_kindguard values (99)")
        with pytest.raises(PlanError, match="use DROP STREAM"):
            eng.sql("drop table tmp_kindguard")
        eng.sql("drop stream tmp_kindguard")
        assert not eng.catalog.has("tmp_kindguard")
    finally:
        import shutil
        shutil.rmtree(stale, ignore_errors=True)


def test_hint_in_expression_subquery_is_rejected(engine):
    """A hint buried in an EXISTS / IN / scalar subquery routes the
    query to the SQL-compilation path, which cannot render hints — it
    must reject, not silently drop (round-7 ADVICE, low)."""
    for q in [
        "select r_name from region where exists "
        "(select /*+ salt(n_regionkey, 4) */ 1 from nation "
        "where n_regionkey = r_regionkey)",
        "select r_name from region where r_regionkey in "
        "(select /*+ salt(n_regionkey, 4) */ n_regionkey from nation)",
        "select r_name, (select /*+ salt(n_regionkey, 4) */ count(*) "
        "from nation) as c from region",
    ]:
        with pytest.raises(PlanError, match="hints are not supported"):
            engine.sql(q)


def test_shadowing_stream_stays_droppable(engine, spark):
    """Round-7 ADVICE (medium): a CREATE STREAM that shadows a
    same-named session-catalog table must not deadlock DROP.  DROP
    STREAM honors the DECLARED kind (unregisters the stream, re-exposes
    the catalog table); DROP TABLE then removes the table and its
    data."""
    import os
    from urllib.parse import urlparse
    eng = engine
    eng.sql("create table tmp_shadow bucketed by (r_regionkey) into 2 "
            "buckets as select r_regionkey from region")
    # shadow it with a same-named declared stream
    eng.sql("create stream tmp_shadow as "
            "(select n_nationkey from nation)")
    assert eng.catalog.meta("tmp_shadow").kind == "stream"
    # pre-fix both forms raised; now the declared kind wins
    eng.sql("drop stream tmp_shadow")
    assert not eng.catalog.has("tmp_shadow")
    assert spark.catalog.tableExists("default.tmp_shadow")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    eng.sql("drop table tmp_shadow")
    assert not spark.catalog.tableExists("default.tmp_shadow")
    assert not os.path.isdir(os.path.join(wh, "tmp_shadow"))


def test_api_reregister_inherits_declared_kind(engine, spark):
    """Round-7 ADVICE (low): FsqlEngine.register with kind=None on an
    already-registered relation inherits the prior declared kind
    instead of wiping it, so DROP's kind guard keeps working after an
    API-level re-registration."""
    eng = engine
    eng.sql("create stream tmp_api_kind as "
            "(select r_regionkey from region)")
    assert eng.catalog.meta("tmp_api_kind").kind == "stream"
    # API re-registration (e.g. a user swapping the backing frame)
    eng.register("tmp_api_kind",
                 spark.createDataFrame([(1,)], "r_regionkey long"))
    assert eng.catalog.meta("tmp_api_kind").kind == "stream"
    with pytest.raises(PlanError, match="use DROP STREAM"):
        eng.sql("drop table tmp_api_kind")
    eng.sql("drop stream tmp_api_kind")
    assert not eng.catalog.has("tmp_api_kind")


# ---------------------------------------------------------------------------
# cap(group, id, k) hint — the curation layer reachable from the dialect
# ---------------------------------------------------------------------------


def test_cap_hint_equals_python_api(engine, spark):
    """/*+ cap(g, id, k) */ is the declarative form of
    llm_ops.assemble.cap_per_group with the cross-engine md5 id hash
    and the dialect's fixed seed 42 — identical row sets."""
    from flink_dsl_spark.llm_ops.assemble import cap_per_group, \
        md5_id_hash
    got = engine.sql(
        "select /*+ cap(source, doc_id, 5) */ doc_id, source "
        "from documents")
    want = cap_per_group(
        engine.catalog.get("documents"), "source", "doc_id", k=5,
        seed=42, id_hash=md5_id_hash).select("doc_id", "source")
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0


def test_cap_hint_applies_after_where(engine):
    """The cap operates on the FILTERED rows: a doc excluded by WHERE
    never occupies one of the k slots."""
    capped = engine.sql(
        "select /*+ cap(source, doc_id, 3) */ source, "
        "count(*) as cnt from documents where n_chars > 100 "
        "group by source")
    for _, cnt in _rows(capped):
        assert cnt <= 3
    # every kept doc satisfies the filter
    rows = _rows(engine.sql(
        "select /*+ cap(source, doc_id, 3) */ n_chars from documents "
        "where n_chars > 100"))
    assert rows and all(n > 100 for (n,) in rows)


def test_cap_hint_plan_is_window_group_limit(engine):
    """Scale gate: the rank<=k filter must compile to WindowGroupLimit
    (per-task k-row heap), not a full per-group sort buffer."""
    df = engine.sql(
        "select /*+ cap(source, doc_id, 5) */ doc_id, source "
        "from documents")
    assert "WindowGroupLimit" in _plan(df)


def test_cap_hint_on_join_result(engine):
    """Columns resolve in the JOINed frame; an ambiguous name errors
    instead of silently picking a side."""
    got = engine.sql(
        "select /*+ cap(r_name, n_nationkey, 2) */ r_name, n_name "
        "from nation join region on n_regionkey = r_regionkey")
    counts = {}
    for r_name, _ in _rows(got):
        counts[r_name] = counts.get(r_name, 0) + 1
    assert counts and all(c <= 2 for c in counts.values())
    with pytest.raises(PlanError, match="ambiguous"):
        engine.sql(
            "select /*+ cap(rk, rk, 2) */ a.n_name "
            "from (select n_name, n_regionkey as rk from nation) as a "
            "join (select r_regionkey as rk from region) as b "
            "on a.rk = b.rk")


def test_cap_hint_bad_args_error(engine):
    for bad in ["cap(source, doc_id)",          # missing k
                "cap(source, doc_id, 0)",       # k < 1
                "cap(source, 3, 5)",            # id not a column
                "cap(source, doc_id, k)"]:      # k not an int
        with pytest.raises(PlanError, match="cap hint takes"):
            engine.sql(f"select /*+ {bad} */ doc_id from documents")
    with pytest.raises(PlanError, match="not in select input"):
        engine.sql("select /*+ cap(nope, doc_id, 5) */ doc_id "
                   "from documents")


def test_cap_hint_rejected_on_sqlgen_path(engine):
    """Subqueries route to the SQL-compilation path, which cannot
    render hints — reject, never silently drop the cap."""
    with pytest.raises(PlanError, match="subqueries"):
        engine.sql(
            "select /*+ cap(source, doc_id, 5) */ doc_id from documents "
            "where n_chars > (select avg(n_chars) from documents)")


def test_cap_hint_is_batch_only(engine, spark):
    """row_number over an unbounded stream is unsupported — the hint
    must reject a streaming input, not fail deep in planning."""
    import os
    import tempfile
    eng = FsqlEngine(spark, streaming=True)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    d = tempfile.mkdtemp(prefix="cap_stream_")
    os.symlink(f"{SF_DIR}/events.parquet",
               os.path.join(d, "events.parquet"))
    eng.sql("create stream cap_ev ("
            + ", ".join(f"{f.name} {_ddl_type(f.dataType)}"
                        for f in ev.schema.fields)
            + f") source file ('{d}', 'parquet')")
    try:
        with pytest.raises(PlanError, match="batch-only"):
            eng.sql("select /*+ cap(user_id, event_id, 3) */ user_id "
                    "from cap_ev")
    finally:
        eng.sql("drop stream cap_ev")


# ---------------------------------------------------------------------------
# token_budget(id, tokens, budget) hint — the assemble layer's corpus
# cut reachable from the dialect (r9)
# ---------------------------------------------------------------------------


def test_token_budget_hint_equals_python_api(engine):
    """/*+ token_budget(id, tok, B) */ is the declarative form of
    llm_ops.assemble.token_budget_filter with the cross-engine md5 id
    hash and the dialect's fixed seed 42 — identical row sets."""
    from flink_dsl_spark.llm_ops.assemble import md5_id_hash, \
        token_budget_filter
    got = engine.sql(
        "select /*+ token_budget(doc_id, n_chars, 40000) */ "
        "doc_id, source from documents")
    want = token_budget_filter(
        engine.catalog.get("documents"), "doc_id", "n_chars",
        budget=40000, seed=42,
        id_hash=md5_id_hash).select("doc_id", "source")
    assert _rows(got) == _rows(want)
    assert 0 < len(_rows(got)) < 500          # the budget bites


def test_token_budget_hint_prefix_property(engine):
    """The kept set is a hash-ordered PREFIX: every kept doc's running
    total is within budget, and growing the budget only ADDS rows
    (stability under budget growth)."""
    small = {r[0] for r in _rows(engine.sql(
        "select /*+ token_budget(doc_id, n_chars, 20000) */ doc_id "
        "from documents"))}
    large = {r[0] for r in _rows(engine.sql(
        "select /*+ token_budget(doc_id, n_chars, 60000) */ doc_id "
        "from documents"))}
    assert small and small < large
    total = _rows(engine.sql(
        "select /*+ token_budget(doc_id, n_chars, 20000) */ "
        "sum(n_chars) as s from documents"))[0][0]
    assert total <= 20000


def test_token_budget_hint_applies_after_where(engine):
    """The budget meters the FILTERED rows: a doc excluded by WHERE
    never consumes budget."""
    rows = _rows(engine.sql(
        "select /*+ token_budget(doc_id, n_chars, 30000) */ n_chars "
        "from documents where n_chars > 200"))
    assert rows and all(n > 200 for (n,) in rows)
    assert sum(n for (n,) in rows) <= 30000


def test_token_budget_hint_tiny_budget_empty(engine):
    """A budget smaller than the first-pick document keeps nothing —
    empty result, not an error."""
    assert _rows(engine.sql(
        "select /*+ token_budget(doc_id, n_chars, 1) */ doc_id "
        "from documents")) == []


def test_token_budget_hint_bad_args_error(engine):
    for bad in ["token_budget(doc_id, n_chars)",      # missing budget
                "token_budget(doc_id, n_chars, 0)",   # budget < 1
                "token_budget(doc_id, 3, 5)",         # tokens not a column
                "token_budget(doc_id, n_chars, b)"]:  # budget not an int
        with pytest.raises(PlanError, match="token_budget hint takes"):
            engine.sql(f"select /*+ {bad} */ doc_id from documents")
    with pytest.raises(PlanError, match="not in select input"):
        engine.sql("select /*+ token_budget(nope, n_chars, 100) */ "
                   "doc_id from documents")
    with pytest.raises(PlanError, match="ambiguous"):
        engine.sql(
            "select /*+ token_budget(rk, rk, 100) */ a.n_name "
            "from (select n_name, n_regionkey as rk from nation) as a "
            "join (select r_regionkey as rk from region) as b "
            "on a.rk = b.rk")


def test_token_budget_hint_rejected_on_sqlgen_path(engine):
    with pytest.raises(PlanError, match="subqueries"):
        engine.sql(
            "select /*+ token_budget(doc_id, n_chars, 1000) */ doc_id "
            "from documents "
            "where n_chars > (select avg(n_chars) from documents)")


def test_token_budget_hint_is_batch_only(engine, spark):
    import os
    import tempfile
    eng = FsqlEngine(spark, streaming=True)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    d = tempfile.mkdtemp(prefix="tb_stream_")
    os.symlink(f"{SF_DIR}/events.parquet",
               os.path.join(d, "events.parquet"))
    eng.sql("create stream tb_ev ("
            + ", ".join(f"{f.name} {_ddl_type(f.dataType)}"
                        for f in ev.schema.fields)
            + f") source file ('{d}', 'parquet')")
    try:
        with pytest.raises(PlanError, match="batch-only"):
            eng.sql("select /*+ token_budget(event_id, amount, 100) */ "
                    "event_id from tb_ev")
    finally:
        eng.sql("drop stream tb_ev")


def test_mixture_hint_equals_python_api(engine):
    """/*+ mixture(...) */ is the declarative form of
    llm_ops.assemble.domain_mixture_filter with the cross-engine md5
    hash and seed 42 — identical row sets, all input columns kept."""
    from flink_dsl_spark.llm_ops.assemble import domain_mixture_filter, \
        md5_id_hash
    got = engine.sql(
        "select /*+ mixture(source, doc_id, n_chars, "
        "'src0=0.4, src1=0.3, src2=0.2, src3=0.1') */ "
        "doc_id, source, n_chars from documents")
    want = domain_mixture_filter(
        engine.catalog.get("documents"), "source", "doc_id", "n_chars",
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        seed=42, id_hash=md5_id_hash).select("doc_id", "source",
                                             "n_chars")
    assert sorted(_rows(got)) == sorted(_rows(want))
    assert 0 < len(_rows(got)) < 500         # downsampling bites


def test_mixture_hint_drops_unlisted_domains(engine):
    """Domains missing from the weight string are dropped (the
    domain_mixture contract), not kept whole."""
    rows = _rows(engine.sql(
        "select /*+ mixture(source, doc_id, n_chars, 'src0=1.0') */ "
        "source from documents"))
    assert rows and {s for (s,) in rows} == {"src0"}


def test_mixture_hint_bad_args_error(engine):
    for bad in ["mixture(source, doc_id, n_chars)",        # no weights
                "mixture(source, doc_id, n_chars, 3)"]:    # not a string
        with pytest.raises(PlanError, match="mixture hint takes"):
            engine.sql(f"select /*+ {bad} */ doc_id from documents")
    for w in ["src0=0.4,src0=0.1",    # duplicate domain
              "src0=",                # missing weight
              "=0.3",                 # missing domain
              "src0=-1",              # non-positive
              "src0=abc",             # not a number
              "src0=nan,src1=1",      # float() parses nan — NaN would
                                      # silently corrupt the algebra
              "src0=inf"]:            # inf collapses the total to 0
        with pytest.raises(PlanError, match="mixture hint weight"):
            engine.sql("select /*+ mixture(source, doc_id, n_chars, "
                       f"'{w}') */ doc_id from documents")
    with pytest.raises(PlanError, match="at least one"):
        engine.sql("select /*+ mixture(source, doc_id, n_chars, '') */"
                   " doc_id from documents")
    with pytest.raises(PlanError, match="not in select input"):
        engine.sql("select /*+ mixture(nope, doc_id, n_chars, "
                   "'a=1') */ doc_id from documents")


def test_mixture_hint_table_form_equals_string_form(engine, spark):
    """A bare identifier as the 4th mixture argument names a
    registered (domain, weight) relation; the cut equals the literal
    string form with the same shares (r10)."""
    engine.register("wts_t", spark.createDataFrame(
        [("src0", 0.4), ("src1", 0.3), ("src2", 0.2), ("src3", 0.1)],
        "domain string, w double"))
    got = _rows(engine.sql(
        "select /*+ mixture(source, doc_id, n_chars, wts_t) */ "
        "doc_id, source from documents"))
    want = _rows(engine.sql(
        "select /*+ mixture(source, doc_id, n_chars, "
        "'src0=0.4,src1=0.3,src2=0.2,src3=0.1') */ "
        "doc_id, source from documents"))
    assert sorted(got) == sorted(want) and got


def test_mixture_hint_table_form_errors(engine, spark):
    with pytest.raises(PlanError, match="neither"):
        engine.sql("select /*+ mixture(source, doc_id, n_chars, "
                   "no_such_rel) */ doc_id from documents")
    engine.register("wts_bad1", spark.createDataFrame(
        [("src0", float("nan"))], "domain string, w double"))
    with pytest.raises(PlanError, match="positive_finite_weight"):
        engine.sql("select /*+ mixture(source, doc_id, n_chars, "
                   "wts_bad1) */ doc_id from documents")
    engine.register("wts_bad2", spark.createDataFrame(
        [("src0", 0.4), ("src0", 0.1)], "domain string, w double"))
    with pytest.raises(PlanError, match="unique"):
        engine.sql("select /*+ mixture(source, doc_id, n_chars, "
                   "wts_bad2) */ doc_id from documents")
    engine.register("wts_bad3", spark.createDataFrame(
        [("src0",)], "domain string"))
    with pytest.raises(PlanError, match=r"needs \(domain, weight\)"):
        engine.sql("select /*+ mixture(source, doc_id, n_chars, "
                   "wts_bad3) */ doc_id from documents")
    engine.register("wts_bad4", spark.createDataFrame(
        [], "domain string, w double"))
    with pytest.raises(PlanError, match="empty"):
        engine.sql("select /*+ mixture(source, doc_id, n_chars, "
                   "wts_bad4) */ doc_id from documents")


def test_mixture_hint_table_form_duplicate_nonstring_domain(engine,
                                                            spark):
    """Dict keys are str(dom), so the uniqueness probe must be too —
    a duplicate INT domain previously slipped past `dom in weights`
    and silently overwrote (review finding, r10)."""
    engine.register("wts_int_dup", spark.createDataFrame(
        [(1, 0.4), (1, 0.6), (2, 0.4)], "domain int, w double"))
    with pytest.raises(PlanError, match="unique"):
        engine.sql("select /*+ mixture(n_regionkey, n_nationkey, "
                   "n_nationkey, wts_int_dup) */ n_nationkey "
                   "from nation")


def test_mixture_hint_table_form_guards(engine, spark):
    """The streaming-weights rejection and the >10k-row misuse guard
    (review finding, r10: previously untested)."""
    import os
    import tempfile
    # streaming weights relation
    eng = FsqlEngine(spark, streaming=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d = tempfile.mkdtemp(prefix="mxw_stream_")
    os.symlink(f"{SF_DIR}/documents.parquet",
               os.path.join(d, "documents.parquet"))
    eng.sql("create stream mxw_docs ("
            + ", ".join(f"{f.name} {_ddl_type(f.dataType)}"
                        for f in docs.schema.fields)
            + f") source file ('{d}', 'parquet')")
    eng.register("mxw_batch", docs)
    try:
        with pytest.raises(PlanError, match="batch relation"):
            eng.sql("select /*+ mixture(source, doc_id, n_chars, "
                    "mxw_docs) */ doc_id from mxw_batch")
    finally:
        eng.sql("drop stream mxw_docs")
    # >10k rows is a misuse, rejected before any further work
    engine.register("wts_huge", spark.range(10_001).selectExpr(
        "cast(id as string) as domain", "1.0 as w"))
    with pytest.raises(PlanError, match="more than"):
        engine.sql("select /*+ mixture(source, doc_id, n_chars, "
                   "wts_huge) */ doc_id from documents")


def test_mixture_hint_table_form_uses_first_two_columns(engine, spark):
    """Extra columns after (domain, weight) are ignored — the
    contract is positional on the first two."""
    engine.register("wts_wide", spark.createDataFrame(
        [("src0", 1.0, "note")], "domain string, w double, x string"))
    rows = _rows(engine.sql(
        "select /*+ mixture(source, doc_id, n_chars, wts_wide) */ "
        "source from documents"))
    assert rows and {s for (s,) in rows} == {"src0"}


def test_mixture_hint_is_batch_only(engine, spark):
    import os
    import tempfile
    eng = FsqlEngine(spark, streaming=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d = tempfile.mkdtemp(prefix="mx_stream_")
    os.symlink(f"{SF_DIR}/documents.parquet",
               os.path.join(d, "documents.parquet"))
    eng.sql("create stream mx_docs ("
            + ", ".join(f"{f.name} {_ddl_type(f.dataType)}"
                        for f in docs.schema.fields)
            + f") source file ('{d}', 'parquet')")
    try:
        with pytest.raises(PlanError, match="batch-only"):
            eng.sql("select /*+ mixture(source, doc_id, n_chars, "
                    "'src0=1.0') */ doc_id from mx_docs")
    finally:
        eng.sql("drop stream mx_docs")


def test_salt_then_token_budget_compose(engine):
    """r10 fuzz target: the skew-salt join hint and the token budget
    compose — the salted join's row set is identical to the unsalted
    one, so the budget cut over it must equal the Python API applied
    to the plain join."""
    from flink_dsl_spark.llm_ops.assemble import md5_id_hash, \
        token_budget_filter
    got = engine.sql(
        "select /*+ salt(c_nationkey, 4) "
        "token_budget(c_custkey, c_nationkey, 500) */ c_custkey "
        "from customer join nation on c_nationkey = n_nationkey")
    plain = engine.sql(
        "select c_custkey, c_nationkey "
        "from customer join nation on c_nationkey = n_nationkey")
    want = token_budget_filter(plain, "c_custkey", "c_nationkey", 500,
                               seed=42, id_hash=md5_id_hash) \
        .select("c_custkey")
    assert sorted(_rows(got)) == sorted(_rows(want))
    assert 0 < len(_rows(got)) < plain.count()    # the budget bites


def test_token_budget_hint_on_aliasless_pivot_source(engine):
    """r10 fuzz target: the budget hint over an ALIASLESS PIVOT source
    (the r9 parser extension) — the hint resolves the rotated output
    columns and the cut equals the Python API over the unhinted
    rotation (NULL pivot cells consume no budget on either path)."""
    from flink_dsl_spark.llm_ops.assemble import md5_id_hash, \
        token_budget_filter
    base = ("from (select doc_id, lang, n_chars from documents) "
            "pivot (sum(n_chars) as s for lang in ('en' as en, "
            "'de' as de))")
    got = engine.sql(
        f"select /*+ token_budget(doc_id, en_s, 20000) */ "
        f"doc_id, en_s {base}")
    unhinted = engine.sql(f"select doc_id, en_s, de_s {base}")
    want = token_budget_filter(unhinted, "doc_id", "en_s", 20000,
                               seed=42, id_hash=md5_id_hash) \
        .select("doc_id", "en_s")
    assert sorted(_rows(got), key=str) == sorted(_rows(want), key=str)
    assert len(_rows(got)) > 0


def test_cap_then_token_budget_compose_in_order(engine):
    """Hints apply in written order: cap first bounds each source to
    k docs, then the budget meters the capped corpus."""
    from flink_dsl_spark.llm_ops.assemble import md5_id_hash, \
        cap_per_group, token_budget_filter
    got = engine.sql(
        "select /*+ cap(source, doc_id, 5) "
        "token_budget(doc_id, n_chars, 10000) */ doc_id "
        "from documents")
    docs = engine.catalog.get("documents")
    capped_ids = cap_per_group(docs, "source", "doc_id", k=5, seed=42,
                               id_hash=md5_id_hash).select("doc_id")
    capped = docs.join(capped_ids, "doc_id")
    want = token_budget_filter(capped, "doc_id", "n_chars", 10000,
                               seed=42, id_hash=md5_id_hash) \
        .select("doc_id")
    assert sorted(_rows(got)) == sorted(_rows(want))
    assert len(_rows(got)) > 0


def test_mixture_temperature_hint_equals_scaled_weights(engine, spark):
    """/*+ mixture_temperature(...) */ temperature-flattens the
    resolved weights (w' = w^(1/T)) at plan time, then runs the same
    rate algebra — so it equals a plain mixture hint whose string
    carries the pre-scaled weights, in both the table and string
    forms (r11)."""
    engine.register("wts_temp", spark.createDataFrame(
        [("src0", 0.16), ("src1", 0.09), ("src2", 0.04),
         ("src3", 0.01)], "domain string, w double"))
    got = _rows(engine.sql(
        "select /*+ mixture_temperature(source, doc_id, n_chars, "
        "wts_temp, 2) */ doc_id, source from documents"))
    want = _rows(engine.sql(
        "select /*+ mixture(source, doc_id, n_chars, "
        "'src0=0.4,src1=0.3,src2=0.2,src3=0.1') */ "
        "doc_id, source from documents"))
    assert sorted(got) == sorted(want) and got
    # string-form weights work too, and T=1 is the identity
    same = _rows(engine.sql(
        "select /*+ mixture_temperature(source, doc_id, n_chars, "
        "'src0=0.4,src1=0.3,src2=0.2,src3=0.1', 1) */ "
        "doc_id, source from documents"))
    assert sorted(same) == sorted(want)


def test_mixture_temperature_api_parity(engine):
    """domain_mixture_temperature_weights == domain_mixture over
    temperature_scaled_weights (the API form of the hint)."""
    import math
    from flink_dsl_spark.llm_ops.assemble import (
        domain_mixture, domain_mixture_temperature_weights,
        temperature_scaled_weights)
    pri = {"src0": 0.16, "src1": 0.09, "src2": 0.04, "src3": 0.01}
    scaled = temperature_scaled_weights(pri, 2)
    assert scaled == {d: math.sqrt(v) for d, v in pri.items()}
    docs = engine.catalog.get("documents")
    got = _rows(domain_mixture_temperature_weights(
        docs, "source", "doc_id", "n_chars", pri, 2))
    want = _rows(domain_mixture(
        docs, "source", "doc_id", "n_chars", scaled))
    assert sorted(got) == sorted(want) and got
    # T→∞ flattens toward uniform; zero weights stay excluded
    flat = temperature_scaled_weights({"a": 0.5, "b": 0.0}, 1e9)
    assert flat["b"] == 0.0 and 0.99 < flat["a"] <= 1.0


def test_mixture_temperature_hint_bad_args(engine):
    for bad in [
            "mixture_temperature(source, doc_id, n_chars, 'a=1')",
            "mixture_temperature(source, doc_id, n_chars, 'a=1', 0)",
            "mixture_temperature(source, doc_id, n_chars, 'a=1', '2')",
            "mixture_temperature(source, doc_id, n_chars, 'a=1', x)"]:
        with pytest.raises(PlanError,
                           match="mixture_temperature hint takes"):
            engine.sql(f"select /*+ {bad} */ doc_id from documents")


def test_temperature_scaled_weights_validation():
    from flink_dsl_spark.llm_ops.assemble import (
        temperature_scaled_weights)
    with pytest.raises(ValueError, match="temperature"):
        temperature_scaled_weights({"a": 1.0}, 0)
    with pytest.raises(ValueError, match="temperature"):
        temperature_scaled_weights({"a": 1.0}, float("nan"))
    with pytest.raises(ValueError, match="finite"):
        temperature_scaled_weights({"a": float("inf")}, 2)


# ---------------------------------------------------------------------------
# priority_sample(id, weight, k) hint — DLT weighted sampling reachable
# from the dialect (r11)
# ---------------------------------------------------------------------------

def test_priority_sample_hint_equals_python_api(engine):
    """/*+ priority_sample(id, w, k) */ keeps the same row SET as
    llm_ops.assemble.priority_sample with the dialect's fixed md5
    hash + seed 42 (the hint keeps ALL columns, the API projects)."""
    from flink_dsl_spark.llm_ops.assemble import md5_id_hash, \
        priority_sample
    got = engine.sql(
        "select /*+ priority_sample(doc_id, n_chars, 25) */ doc_id, "
        "n_chars, source from documents")
    want = priority_sample(
        engine.catalog.get("documents"), "doc_id", "n_chars", k=25,
        seed=42, id_hash=md5_id_hash)
    assert {r["doc_id"] for r in got.collect()} == \
        {r["doc_id"] for r in want.collect()}
    assert got.count() == 25
    assert got.columns == ["doc_id", "n_chars", "source"]


def test_priority_sample_hint_applies_after_where(engine):
    """Sampling operates on the FILTERED rows, and composes with a
    following aggregate over the cut corpus."""
    rows = _rows(engine.sql(
        "select /*+ priority_sample(doc_id, n_chars, 10) */ n_chars "
        "from documents where n_chars > 100"))
    assert len(rows) == 10 and all(n > 100 for (n,) in rows)
    agg = _rows(engine.sql(
        "select /*+ priority_sample(doc_id, n_chars, 10) */ "
        "count(*) as cnt from documents where n_chars > 100"))
    assert agg == [(10,)]


def test_priority_sample_hint_plan_is_take_ordered(engine):
    df = engine.sql(
        "select /*+ priority_sample(doc_id, n_chars, 25) */ doc_id "
        "from documents")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan


def test_priority_sample_hint_survives_colliding_column(engine, spark):
    """A user column named like the bookkeeping priority must pass
    through intact (the __tb_* collision lesson)."""
    eng = FsqlEngine(spark)
    df = spark.createDataFrame(
        [(i, float(i + 1), f"v{i}") for i in range(50)],
        "id long, w double, __ps_pri string")
    eng.register("t", df)
    got = eng.sql(
        "select /*+ priority_sample(id, w, 5) */ id, __ps_pri from t")
    rows = got.collect()
    assert len(rows) == 5
    assert all(r["__ps_pri"] == f"v{r['id']}" for r in rows)


def test_priority_sample_hint_stratified_equals_python_api(engine):
    """/*+ priority_sample(id, w, k, stratum) */ keeps the same row
    set as llm_ops.assemble.priority_sample_stratified (r12): k rows
    from EACH distinct stratum value, same md5 hash + seed 42."""
    from flink_dsl_spark.llm_ops.assemble import md5_id_hash, \
        priority_sample_stratified
    got = engine.sql(
        "select /*+ priority_sample(doc_id, n_chars, 8, source) */ "
        "doc_id, source, n_chars from documents")
    want = priority_sample_stratified(
        engine.catalog.get("documents"), "doc_id", "n_chars",
        "source", k=8, seed=42, id_hash=md5_id_hash)
    assert {(r["source"], r["doc_id"]) for r in got.collect()} == \
        {(r["source"], r["doc_id"]) for r in want.collect()}
    # every stratum contributes exactly min(k, stratum size) rows
    per = {}
    for r in got.collect():
        per[r["source"]] = per.get(r["source"], 0) + 1
    assert all(n <= 8 for n in per.values()) and len(per) >= 2
    assert got.columns == ["doc_id", "source", "n_chars"]
    plan = _plan(got)
    assert "WindowGroupLimit" in plan
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# sample(id, permille) hint — deterministic Bernoulli subsample (r12)
# ---------------------------------------------------------------------------

def test_sample_hint_membership_and_composition(engine):
    """/*+ sample(id, p) */ keeps exactly the rows whose seeded md5
    hash lands below p/1000 (the split_dataset membership rule),
    composes with WHERE, and keeps all columns."""
    from flink_dsl_spark.llm_ops.assemble import md5_id_hash
    import pyspark.sql.functions as F
    got = engine.sql(
        "select /*+ sample(doc_id, 200) */ doc_id, source "
        "from documents where n_chars > 100")
    want = (engine.catalog.get("documents")
            .filter("n_chars > 100")
            .filter(md5_id_hash(F.col("doc_id"), 42) % 1000 < 200))
    assert {r["doc_id"] for r in got.collect()} == \
        {r["doc_id"] for r in want.collect()}
    assert got.columns == ["doc_id", "source"]
    # ~20% of the corpus, reproducible: re-running yields the SAME set
    again = {r["doc_id"] for r in engine.sql(
        "select /*+ sample(doc_id, 200) */ doc_id, source "
        "from documents where n_chars > 100").collect()}
    assert again == {r["doc_id"] for r in got.collect()}
    agg = engine.sql(
        "select /*+ sample(doc_id, 500) */ count(*) as cnt "
        "from documents").collect()[0]["cnt"]
    n = engine.catalog.get("documents").count()
    assert 0.35 * n < agg < 0.65 * n


def test_sample_hint_no_shuffle_and_streaming_safe(engine, spark):
    """Membership is per-row, so the plan has NO exchange — and the
    hint is the one sampling cut that works on a stream."""
    import os
    import tempfile
    df = engine.sql("select /*+ sample(doc_id, 100) */ doc_id "
                    "from documents")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    eng = FsqlEngine(spark, streaming=True)
    d = tempfile.mkdtemp(prefix="sample_stream_")
    src = os.path.join(d, "ev.parquet")
    os.symlink(f"{SF_DIR}/events.parquet", src)
    eng.sql(f"create stream sev (event_id long, user_id long, "
            f"event_type string, value double, ts timestamp) "
            f"source file('{src}')")
    out = eng.sql("select /*+ sample(event_id, 300) */ event_id "
                  "from sev")
    assert out.isStreaming


def test_sample_hint_bad_args_error(engine):
    for bad in ["sample(doc_id)", "sample(doc_id, 0)",
                "sample(doc_id, 1000)", "sample(7, 100)"]:
        with pytest.raises(PlanError, match="sample hint takes"):
            engine.sql(f"select /*+ {bad} */ doc_id from documents")
    with pytest.raises(PlanError, match="not in select input"):
        engine.sql("select /*+ sample(nope, 100) */ doc_id "
                   "from documents")


def test_priority_sample_hint_bad_args_error(engine):
    for bad in ["priority_sample(doc_id, n_chars)",
                "priority_sample(doc_id, n_chars, 0)",
                "priority_sample(doc_id, 3, 5)",
                "priority_sample(doc_id, n_chars, 5, 9)",
                "priority_sample(doc_id, n_chars, k)"]:
        with pytest.raises(PlanError, match="priority_sample hint takes"):
            engine.sql(f"select /*+ {bad} */ doc_id from documents")
    with pytest.raises(PlanError, match="not in select input"):
        engine.sql("select /*+ priority_sample(nope, n_chars, 5) */ "
                   "doc_id from documents")


def test_hint_int_args_reject_bool_ast(engine):
    """isinstance(True, int) is True — a programmatically-built Hint
    carrying a Python bool where a positive int belongs must NOT
    silently plan as k=1 / permille=1 (r12 ADVICE: the sample hint
    had the guard, priority_sample/cap/token_budget/salt did not)."""
    from flink_dsl_spark.parser import parse
    cases = [
        ("select /*+ priority_sample(doc_id, n_chars, 5) */ doc_id "
         "from documents", 2, "priority_sample hint takes"),
        ("select /*+ cap(source, doc_id, 5) */ doc_id "
         "from documents", 2, "cap hint takes"),
        ("select /*+ token_budget(doc_id, n_chars, 500) */ doc_id "
         "from documents", 2, "token_budget hint takes"),
        ("select /*+ sample(doc_id, 100) */ doc_id "
         "from documents", 1, "sample hint takes"),
        ("select /*+ salt(doc_id, 4) */ doc_id "
         "from documents", 1, "salt hint takes"),
    ]
    for text, pos, msg in cases:
        stmt = parse(text)
        stmt.hints[0].args[pos] = True
        with pytest.raises(PlanError, match=msg):
            engine._run(stmt, None)


def test_priority_stratified_hint_survives_colliding_rn_column(
        engine, spark):
    """The stratified path's row-number bookkeeping column must also
    dodge a same-named user column (r12 ADVICE: pri was guarded,
    pri + '_rn' was not — withColumn silently replaces)."""
    eng = FsqlEngine(spark)
    df = spark.createDataFrame(
        [(i, float(i + 1), f"s{i % 3}", f"v{i}") for i in range(60)],
        "id long, w double, g string, __ps_pri_rn string")
    eng.register("t", df)
    got = eng.sql("select /*+ priority_sample(id, w, 4, g) */ "
                  "id, g, __ps_pri_rn from t")
    rows = got.collect()
    assert len(rows) == 12                      # 4 per stratum x 3
    assert all(r["__ps_pri_rn"] == f"v{r['id']}" for r in rows)


def test_priority_sample_hint_rejected_on_sqlgen_path(engine):
    with pytest.raises(PlanError, match="subqueries"):
        engine.sql(
            "select /*+ priority_sample(doc_id, n_chars, 5) */ doc_id "
            "from documents "
            "where n_chars > (select avg(n_chars) from documents)")


# ---------------------------------------------------------------------------
# TABLESAMPLE(id_col, permille) relation suffix (r13)
# ---------------------------------------------------------------------------

def test_tablesample_membership(engine):
    """Same hash-residue row set as the sample hint's membership
    rule, applied at the relation."""
    from flink_dsl_spark.llm_ops.assemble import md5_id_hash
    import pyspark.sql.functions as F
    got = engine.sql(
        "select doc_id from documents tablesample(doc_id, 200)")
    want = (engine.catalog.get("documents")
            .filter(md5_id_hash(F.col("doc_id"), 42) % 1000 < 200))
    assert {r["doc_id"] for r in got.collect()} == \
        {r["doc_id"] for r in want.collect()}
    plan = _plan(got)
    assert "Exchange" not in plan          # pure per-row filter


def test_tablesample_one_join_side(engine):
    """The point of the relation form: sample ONE side of a join —
    the other side stays complete, and the filter applies BEFORE the
    join (unsampled docs never join)."""
    from flink_dsl_spark.llm_ops.assemble import md5_id_hash
    import pyspark.sql.functions as F
    got = engine.sql("""
        select c.source, count(*) as n
        from documents c tablesample(doc_id, 300)
        join embeddings e on c.doc_id = e.vec_id
        group by c.source""")
    docs = (engine.catalog.get("documents")
            .filter(md5_id_hash(F.col("doc_id"), 42) % 1000 < 300))
    emb = engine.catalog.get("embeddings")
    want = (docs.join(emb, docs.doc_id == emb.vec_id)
                .groupBy("source").count())
    assert {(r["source"], r["n"]) for r in got.collect()} == \
        {(r["source"], r["count"]) for r in want.collect()}


def test_tablesample_derived_table_and_alias(engine):
    d = engine.sql(
        "select * from (select doc_id, n_chars from documents) t "
        "tablesample(doc_id, 400)")
    assert d.count() > 0
    # alias + suffix + WHERE compose
    d2 = engine.sql(
        "select d.doc_id from documents d tablesample(doc_id, 500) "
        "where d.n_chars > 100")
    assert d2.count() > 0
    # a relation genuinely aliased 'tablesample' still works via AS
    d3 = engine.sql(
        "select tablesample.doc_id from documents as tablesample")
    assert d3.count() > 0


def test_tablesample_survives_cte_inlining(engine):
    """r13 review: CTE inlining rebuilds a TableRef as a DerivedTable
    — the sample suffix must ride through, not silently vanish (the
    query ran UNSAMPLED before the fix)."""
    from flink_dsl_spark.llm_ops.assemble import md5_id_hash
    import pyspark.sql.functions as F
    got = engine.sql(
        "with d as (select doc_id from documents) "
        "select doc_id from d tablesample(doc_id, 300)")
    want = (engine.catalog.get("documents")
            .filter(md5_id_hash(F.col("doc_id"), 42) % 1000 < 300))
    assert {r["doc_id"] for r in got.collect()} == \
        {r["doc_id"] for r in want.collect()}


def test_tablesample_on_lateral_rejected_clearly(engine):
    """r13 review: LATERAL always compiles on the SQL-text path where
    TABLESAMPLE has no form — the rejection must NAME the clause, not
    die as generic trailing input."""
    from flink_dsl_spark.errors import UnsupportedError
    with pytest.raises(UnsupportedError, match="TABLESAMPLE"):
        engine.sql(
            "select d.doc_id, l.m from documents d, lateral "
            "(select max(n_chars) as m from documents) l "
            "tablesample(m, 100)")


def test_tablesample_errors(engine):
    with pytest.raises(PlanError, match="not in relation"):
        engine.sql("select doc_id from documents "
                   "tablesample(nope, 100)")
    for bad in ["tablesample(doc_id, 0)", "tablesample(doc_id, 1000)",
                "tablesample(doc_id, 2.5)"]:
        with pytest.raises(ParseError,
                           match="permille|TABLESAMPLE"):
            engine.sql(f"select doc_id from documents {bad}")
    from flink_dsl_spark.errors import UnsupportedError
    with pytest.raises(UnsupportedError, match="TABLESAMPLE"):
        engine.sql(
            "select doc_id from documents tablesample(doc_id, 100) "
            "where n_chars > (select avg(n_chars) from documents)")


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(st.lists(st.one_of(st.integers(min_value=-10**6,
                                      max_value=10**6),
                          st.none()),
                min_size=1, max_size=40, unique=True),
       st.integers(min_value=1, max_value=999))
def test_tablesample_membership_python_replay_fuzz(spark, ids,
                                                   permille):
    """r13 fuzz shape for TABLESAMPLE: random id sets (NULLs
    included) and permilles vs a pure-Python md5 replay of the
    membership rule — NULL ids never sampled."""
    import hashlib
    eng = FsqlEngine(spark)
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    eng.register("ts_t", df)
    got = {r["id"] for r in eng.sql(
        f"select id from ts_t tablesample(id, {permille})").collect()}
    exp = {i for i in ids if i is not None and
           int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:15], 16)
           % 1000 < permille}
    assert got == exp, (ids, permille)


def test_tablesample_in_merge(engine, spark):
    """r13 verdict item 6: TABLESAMPLE composes with MERGE through
    the USING (subquery) form — value-checked against the Python
    membership replay — while the bare suffix on the source or the
    target gets a NAMED rejection (never a silent drop and never a
    generic trailing-input error)."""
    from flink_dsl_spark.llm_ops.assemble import md5_id_hash
    import pyspark.sql.functions as F
    eng = FsqlEngine(spark)
    src = spark.createDataFrame([(i, f"v{i}") for i in range(40)],
                                "id long, v string")
    eng.register("ms_src", src)
    eng.register("ms_tgt", spark.createDataFrame(
        [(i, "old") for i in range(40)], "id long, v string"))
    eng.sql("""merge into ms_tgt using
               (select * from ms_src tablesample(id, 500)) x
               on ms_tgt.id = x.id
               when matched then update set v = x.v""")
    got = {r["id"] for r in eng.catalog.get("ms_tgt").collect()
           if r["v"] != "old"}
    want = {r["id"] for r in src.filter(
        md5_id_hash(F.col("id"), 42) % 1000 < 500).collect()}
    assert got == want and 0 < len(got) < 40
    with pytest.raises(ParseError, match="MERGE source"):
        eng.sql("merge into ms_tgt using ms_src tablesample(id, 500)"
                " on ms_tgt.id = ms_src.id when matched then delete")
    with pytest.raises(ParseError, match="MERGE target"):
        eng.sql("merge into ms_tgt tablesample(id, 500) using ms_src"
                " on ms_tgt.id = ms_src.id when matched then delete")


def test_tablesample_streaming_safe(engine, spark):
    import os
    import tempfile
    eng = FsqlEngine(spark, streaming=True)
    d = tempfile.mkdtemp(prefix="ts_stream_")
    os.symlink(f"{SF_DIR}/events.parquet", os.path.join(d, "ev.parquet"))
    eng.sql(f"create stream ts_ev (event_id long, user_id long, "
            f"event_type string, value double, ts timestamp) "
            f"source file('{d}')")
    try:
        out = eng.sql("select event_id from ts_ev "
                      "tablesample(event_id, 300)")
        assert out.isStreaming
    finally:
        eng.sql("drop stream ts_ev")


# ---------------------------------------------------------------------------
# bm25(text, id, 'terms', k) hint — Okapi BM25 retrieval (r13)
# ---------------------------------------------------------------------------

def test_bm25_hint_equals_python_api(engine):
    """/*+ bm25(text, id, 'terms', k) */ keeps exactly the top-k rows
    of llm_ops.textstats.bm25_scores with the score appended as
    bm25_score, and all input columns preserved."""
    from flink_dsl_spark.llm_ops.textstats import bm25_scores
    got = engine.sql(
        "select /*+ bm25(text, doc_id, 'hash join merge', 15) */ "
        "doc_id, source, bm25_score from documents")
    want = bm25_scores(engine.catalog.get("documents"), "text",
                       "doc_id", ["hash", "join", "merge"], k=15)
    assert {(r["doc_id"], r["bm25_score"]) for r in got.collect()} == \
        {(r["id"], r["score"]) for r in want.collect()}
    assert got.columns == ["doc_id", "source", "bm25_score"]


def test_bm25_hint_applies_after_where(engine):
    """The hint scores the FILTERED corpus: N/avgdl/df come from the
    post-WHERE rows, so the scores differ from the unfiltered ones."""
    from flink_dsl_spark.llm_ops.textstats import bm25_scores
    got = engine.sql(
        "select /*+ bm25(text, doc_id, 'hash join', 10) */ "
        "doc_id, bm25_score from documents where lang = 'en'")
    want = bm25_scores(
        engine.catalog.get("documents").filter("lang = 'en'"),
        "text", "doc_id", ["hash", "join"], k=10)
    assert {(r["doc_id"], r["bm25_score"]) for r in got.collect()} == \
        {(r["id"], r["score"]) for r in want.collect()}


def test_bm25_hint_star_and_aggregate(engine):
    """Unqualified * includes the appended score (last); aggregates
    summarize the retrieved top-k set."""
    df = engine.sql("select /*+ bm25(text, doc_id, 'hash', 8) */ * "
                    "from documents")
    assert df.columns[-1] == "bm25_score"
    assert df.count() == 8
    agg = engine.sql(
        "select /*+ bm25(text, doc_id, 'hash', 8) */ "
        "count(*) as n, min(bm25_score) as lo from documents"
    ).collect()[0]
    assert agg["n"] == 8 and agg["lo"] > 0


def test_bm25_hint_plan_broadcasts_topk(engine):
    """Scale gate: ONE corpus explode (Generate), the <=k score
    relation broadcast back (BroadcastHashJoin), the k-cut a
    TakeOrderedAndProject — the corpus itself is never shuffled."""
    df = engine.sql(
        "select /*+ bm25(text, doc_id, 'hash join', 10) */ "
        "doc_id, bm25_score from documents")
    plan = _plan(df)
    assert plan.count("Generate") == 1
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_bm25_hint_bad_args_error(engine):
    for bad in ["bm25(text, doc_id, 'hash')",
                "bm25(text, doc_id, 'hash', 0)",
                "bm25(text, doc_id, 5, 5)",
                "bm25(text, doc_id, 'hash', k)"]:
        with pytest.raises(PlanError, match="bm25 hint takes"):
            engine.sql(f"select /*+ {bad} */ doc_id from documents")
    with pytest.raises(PlanError, match="not in select input"):
        engine.sql("select /*+ bm25(nope, doc_id, 'hash', 5) */ "
                   "doc_id from documents")
    with pytest.raises(PlanError, match="empty after normalization"):
        engine.sql("select /*+ bm25(text, doc_id, '!! ??', 5) */ "
                   "doc_id from documents")


def test_bm25_hint_excludes_null_ids(engine, spark):
    """r13 review: a NULL-id doc can never join back, so it must not
    occupy a top-k score slot either (it would silently shrink the
    result and displace a real document)."""
    eng = FsqlEngine(spark)
    df = spark.createDataFrame(
        [(None, "data data data data"), (2, "data"), (3, "nothing")],
        "id long, text string")
    eng.register("t", df)
    rows = eng.sql("select /*+ bm25(text, id, 'data', 1) */ "
                   "id, bm25_score from t").collect()
    assert [r["id"] for r in rows] == [2]


def test_bm25_hint_derived_table_composition(engine):
    """r13 review: a derived table around a hinted select exposes
    bm25_score to the outer query — both through an explicit
    projection and through the inner unqualified *."""
    got = engine.sql(
        "select doc_id, bm25_score from "
        "(select /*+ bm25(text, doc_id, 'hash join', 5) */ * "
        " from documents) t where bm25_score > 0")
    rows = got.collect()
    assert len(rows) == 5 and all(r["bm25_score"] > 0 for r in rows)
    star = engine.sql(
        "select * from (select /*+ bm25(text, doc_id, 'hash', 3) */ * "
        "from documents) t")
    assert star.columns[-1] == "bm25_score"


def test_bm25_score_not_visible_in_where(engine):
    """r13 review: the hint applies AFTER the WHERE filter, so a
    bm25_score reference there fails with a clean resolution error
    (not a raw Spark AnalysisException)."""
    from flink_dsl_spark.errors import ResolutionError
    with pytest.raises(ResolutionError, match="unknown column"):
        engine.sql("select /*+ bm25(text, doc_id, 'hash', 5) */ "
                   "doc_id from documents where bm25_score > 0")


def test_bm25_hint_score_column_collision_rejected(engine, spark):
    """bm25_score is the hint's output CONTRACT — a pre-existing
    column of that name errors instead of being silently shadowed."""
    eng = FsqlEngine(spark)
    df = spark.createDataFrame(
        [(1, "hash join", 0.5)],
        "id long, text string, bm25_score double")
    eng.register("t", df)
    with pytest.raises(PlanError, match="already has one"):
        eng.sql("select /*+ bm25(text, id, 'hash', 3) */ id from t")


def test_bm25_score_unknown_without_hint(engine):
    """Without the hint, bm25_score is not a column — the resolver's
    synthetic binding must not leak into hint-less selects."""
    from flink_dsl_spark.errors import ResolutionError
    with pytest.raises(ResolutionError, match="unknown column"):
        engine.sql("select bm25_score from documents")


def test_bm25_hint_is_batch_only(engine, spark):
    import os
    import tempfile
    eng = FsqlEngine(spark, streaming=True)
    d = tempfile.mkdtemp(prefix="bm25_stream_")
    os.symlink(f"{SF_DIR}/documents.parquet",
               os.path.join(d, "documents.parquet"))
    eng.sql("create stream bm_docs (doc_id long, text string, "
            "lang string, source string, n_chars long) "
            f"source file ('{d}', 'parquet')")
    try:
        with pytest.raises(PlanError, match="batch-only"):
            eng.sql("select /*+ bm25(text, doc_id, 'hash', 5) */ "
                    "doc_id from bm_docs")
    finally:
        eng.sql("drop stream bm_docs")


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(st.lists(st.lists(st.sampled_from(
            ["red", "blue", "green", "fast", "x9"]),
            min_size=0, max_size=10).map(" ".join),
            min_size=1, max_size=15),
       st.sampled_from(["red", "blue x9", "green fast"]),
       st.integers(min_value=1, max_value=6))
def test_bm25_hint_equals_api_fuzz(spark, texts, terms, k):
    """r13 fuzz shape for the bm25 hint: random corpora, query bags
    and k vs the Python API — guards the join-back (row identity,
    column preservation) and the k-cut tie-break together; the
    scoring formula itself is fuzzed in test_llm_ops."""
    from flink_dsl_spark.llm_ops.textstats import bm25_scores
    eng = FsqlEngine(spark)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    eng.register("bm_t", df)
    got = eng.sql(f"select /*+ bm25(text, id, '{terms}', {k}) */ "
                  "id, text, bm25_score from bm_t").collect()
    want = bm25_scores(df, "text", "id", terms.split(), k=k).collect()
    assert {(r["id"], r["bm25_score"]) for r in got} == \
        {(r["id"], r["score"]) for r in want}
    texts_by_id = dict(enumerate(texts))
    assert all(r["text"] == texts_by_id[r["id"]] for r in got)


# ---------------------------------------------------------------------------
# hybrid_rrf(text, vec, id, 'terms', query_id, k[, pool]) hint (r14)
# ---------------------------------------------------------------------------

# text + vector on one relation: the documents ⋈ embeddings join the
# hint is designed to sit on (the llm78 serving shape)
_HY_J = ("(select d.doc_id, d.source, d.text, e.embedding "
         "from documents d join embeddings e "
         "on d.doc_id = e.vec_id) j")


def test_hybrid_rrf_hint_equals_python_api(engine):
    """/*+ hybrid_rrf(...) */ keeps exactly the fused top-k rows of
    llm_ops.simsearch.hybrid_topk with the score appended as
    rrf_score, and all input columns preserved."""
    from flink_dsl_spark.llm_ops.simsearch import hybrid_topk
    got = engine.sql(
        "select /*+ hybrid_rrf(text, embedding, doc_id, "
        "'data stream window', 7, 10) */ doc_id, source, rrf_score "
        f"from {_HY_J}")
    d = engine.catalog.get("documents")
    e = engine.catalog.get("embeddings")
    joined = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "source", "text", "embedding")
    want = hybrid_topk(joined, "text", "embedding", "doc_id",
                       ["data", "stream", "window"], 7, k=10, pool=50)
    assert {(r["doc_id"], r["rrf_score"]) for r in got.collect()} == \
        {(r["id"], r["rrf"]) for r in want.collect()}
    assert got.columns == ["doc_id", "source", "rrf_score"]


def test_hybrid_rrf_hint_pool_arg_and_star(engine):
    """The optional 7th arg narrows each leg's candidate pool (a
    pool-3 fusion differs from the default-50 one); unqualified *
    appends rrf_score last."""
    from flink_dsl_spark.llm_ops.simsearch import hybrid_topk
    got = engine.sql(
        "select /*+ hybrid_rrf(text, embedding, doc_id, "
        "'data stream', 7, 5, 3) */ * "
        f"from {_HY_J}")
    assert got.columns[-1] == "rrf_score"
    d = engine.catalog.get("documents")
    e = engine.catalog.get("embeddings")
    joined = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "source", "text", "embedding")
    want = hybrid_topk(joined, "text", "embedding", "doc_id",
                       ["data", "stream"], 7, k=5, pool=3)
    assert {(r["doc_id"], r["rrf_score"]) for r in got.collect()} == \
        {(r["id"], r["rrf"]) for r in want.collect()}


def test_hybrid_rrf_hint_applies_after_where(engine):
    """The hint scores the FILTERED corpus: both legs' statistics and
    candidate pools come from the post-WHERE rows."""
    from flink_dsl_spark.llm_ops.simsearch import hybrid_topk
    got = engine.sql(
        "select /*+ hybrid_rrf(text, embedding, doc_id, "
        "'data stream', 7, 8) */ doc_id, rrf_score "
        f"from {_HY_J} where doc_id < 300")
    d = engine.catalog.get("documents")
    e = engine.catalog.get("embeddings")
    joined = (d.join(e, d.doc_id == e.vec_id)
               .select("doc_id", "text", "embedding")
               .filter("doc_id < 300"))
    want = hybrid_topk(joined, "text", "embedding", "doc_id",
                       ["data", "stream"], 7, k=8, pool=50)
    assert {(r["doc_id"], r["rrf_score"]) for r in got.collect()} == \
        {(r["id"], r["rrf"]) for r in want.collect()}


def test_hybrid_rrf_hint_plan_broadcasts(engine):
    """Scale gate: the corpus-side work is one bm25 explode
    (Generate) + one broadcast 1-row cosine query; the ≤k fused
    relation broadcasts back (BroadcastHashJoin); the leg cuts are
    TakeOrderedAndProject; the corpus is never cartesian-joined."""
    df = engine.sql(
        "select /*+ hybrid_rrf(text, embedding, doc_id, "
        "'data stream', 7, 10) */ doc_id, rrf_score "
        f"from {_HY_J}")
    plan = _plan(df)
    assert plan.count("Generate") == 1
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_hint_bad_args_error(engine):
    for bad in ["hybrid_rrf(text, embedding, doc_id, 'x', 7)",
                "hybrid_rrf(text, embedding, doc_id, 'x', 7, 0)",
                "hybrid_rrf(text, embedding, doc_id, 'x', 7, 5, 0)",
                "hybrid_rrf(text, embedding, doc_id, 7, 7, 5)"]:
        with pytest.raises(PlanError, match="hybrid_rrf hint takes"):
            engine.sql(f"select /*+ {bad} */ doc_id from {_HY_J}")
    with pytest.raises(PlanError, match="not in select input"):
        engine.sql("select /*+ hybrid_rrf(nope, embedding, doc_id, "
                   f"'x', 7, 5) */ doc_id from {_HY_J}")
    with pytest.raises(PlanError, match="empty after normalization"):
        engine.sql("select /*+ hybrid_rrf(text, embedding, doc_id, "
                   f"'!! ??', 7, 5) */ doc_id from {_HY_J}")


def test_hybrid_rrf_hint_absent_query_id_fails_loudly(engine):
    """An absent query_id would silently EMPTY the cosine leg and
    degrade the fusion to pure BM25 — it must raise instead."""
    with pytest.raises(PlanError, match="not present"):
        engine.sql("select /*+ hybrid_rrf(text, embedding, doc_id, "
                   f"'data', 999999999, 5) */ doc_id from {_HY_J}")


def test_hybrid_rrf_hint_null_query_vector_fails_loudly(engine,
                                                        spark):
    """r14 review: a query row that EXISTS but carries a NULL vector
    makes every candidate cosine NULL — the leg would silently rank
    by ascending id; the probe must reject it by name."""
    eng = FsqlEngine(spark)
    df = spark.createDataFrame(
        [(1, "data", None), (2, "data x", [0.1, 0.9]),
         (3, "y", [0.9, 0.1])],
        "id long, text string, v array<double>")
    eng.register("hy_nv", df)
    with pytest.raises(PlanError, match="NULL.*vector"):
        eng.sql("select /*+ hybrid_rrf(text, v, id, 'data', 1, 2) */"
                " id from hy_nv")
    # a non-NULL query vector on the same table still works
    rows = eng.sql("select /*+ hybrid_rrf(text, v, id, 'data', 2, 2)"
                   " */ id, rrf_score from hy_nv").collect()
    assert len(rows) >= 1


def test_hybrid_rrf_hint_duplicate_query_id_fails_loudly(engine,
                                                         spark):
    """r14 review pass 2: a duplicated query_id would broadcast 2+
    query rows into the cosine crossJoin (candidates duplicated,
    ranks corrupted) — and a limit(1) probe could land on the clean
    row of a dirty pair.  Must reject by name."""
    eng = FsqlEngine(spark)
    df = spark.createDataFrame(
        [(1, "data", [0.5, 0.5]), (1, "data dup", None),
         (2, "data x", [0.1, 0.9]), (3, "y", [0.9, 0.1])],
        "id long, text string, v array<double>")
    eng.register("hy_dup", df)
    with pytest.raises(PlanError, match="more than one row"):
        eng.sql("select /*+ hybrid_rrf(text, v, id, 'data', 1, 2) */"
                " id from hy_dup")


def test_hybrid_rrf_score_not_visible_in_where(engine):
    """The hint applies AFTER the WHERE filter, so an rrf_score
    reference there fails with a clean resolution error."""
    from flink_dsl_spark.errors import ResolutionError
    with pytest.raises(ResolutionError, match="unknown column"):
        engine.sql("select /*+ hybrid_rrf(text, embedding, doc_id, "
                   f"'data', 7, 5) */ doc_id from {_HY_J} "
                   "where rrf_score > 0")
    # and without the hint, rrf_score is not a column at all
    with pytest.raises(ResolutionError, match="unknown column"):
        engine.sql("select rrf_score from documents")


def test_hybrid_rrf_hint_score_collision_rejected(engine, spark):
    eng = FsqlEngine(spark)
    df = spark.createDataFrame(
        [(1, "data", [1.0, 0.0], 0.5), (2, "x", [0.0, 1.0], 0.1)],
        "id long, text string, v array<double>, rrf_score double")
    eng.register("hy_t", df)
    with pytest.raises(PlanError, match="already has one"):
        eng.sql("select /*+ hybrid_rrf(text, v, id, 'data', 1, 2) */"
                " id from hy_t")


def test_hybrid_rrf_hint_excludes_null_ids(engine, spark):
    """NULL-id rows can never join back, so they must not hold
    candidate slots on either leg (the bm25-hint rule)."""
    eng = FsqlEngine(spark)
    df = spark.createDataFrame(
        [(None, "data data data", [1.0, 0.0]),
         (2, "data", [0.9, 0.1]), (3, "nothing", [0.0, 1.0])],
        "id long, text string, v array<double>")
    eng.register("hy_n", df)
    rows = eng.sql("select /*+ hybrid_rrf(text, v, id, 'data', 3, 1)"
                   " */ id, rrf_score from hy_n").collect()
    assert [r["id"] for r in rows] == [2]


def test_hybrid_rrf_hint_derived_table_composition(engine):
    """A derived table around a hinted select exposes rrf_score to
    the outer query — through projection and the inner *."""
    got = engine.sql(
        "select doc_id, rrf_score from "
        "(select /*+ hybrid_rrf(text, embedding, doc_id, "
        f"'data stream', 7, 5) */ * from {_HY_J}) t "
        "where rrf_score > 0")
    rows = got.collect()
    assert len(rows) == 5 and all(r["rrf_score"] > 0 for r in rows)


def test_two_score_hints_compose(engine):
    """bm25 + hybrid_rrf in ONE select: applied in written order
    (bm25 keeps its top-k rows first, hybrid_rrf then fuses over
    that CUT corpus — a query_id outside the cut fails loudly), BOTH
    score columns referencable, and an unqualified * carries both
    (in written hint order)."""
    # pick a query_id guaranteed inside the bm25 top-40 cut
    cut = engine.sql(
        "select /*+ bm25(text, doc_id, 'data stream window', 40) */ "
        f"doc_id from {_HY_J}").collect()
    qid = min(r["doc_id"] for r in cut)
    got = engine.sql(
        "select /*+ bm25(text, doc_id, 'data stream window', 40), "
        "hybrid_rrf(text, embedding, doc_id, 'data stream', "
        f"{qid}, 5) */"
        f" doc_id, bm25_score, rrf_score from {_HY_J}")
    rows = got.collect()
    assert len(rows) == 5
    assert all(r["bm25_score"] > 0 and r["rrf_score"] > 0
               for r in rows)
    star = engine.sql(
        "select /*+ bm25(text, doc_id, 'data stream window', 40), "
        "hybrid_rrf(text, embedding, doc_id, 'data stream', "
        f"{qid}, 5) */"
        f" * from {_HY_J}")
    assert star.columns[-2:] == ["bm25_score", "rrf_score"]
    # a query_id OUTSIDE the cut corpus fails loudly (order matters)
    out_of_cut = 999_999_999
    with pytest.raises(PlanError, match="not present"):
        engine.sql(
            "select /*+ bm25(text, doc_id, 'data stream window', 5),"
            " hybrid_rrf(text, embedding, doc_id, 'data stream', "
            f"{out_of_cut}, 3) */ doc_id from {_HY_J}")


def test_hybrid_rrf_hint_is_batch_only(engine, spark):
    import os
    import tempfile
    eng = FsqlEngine(spark, streaming=True)
    d = tempfile.mkdtemp(prefix="hy_stream_")
    os.symlink(f"{SF_DIR}/documents.parquet",
               os.path.join(d, "documents.parquet"))
    eng.sql("create stream hy_docs (doc_id long, text string, "
            "lang string, source string, n_chars long) "
            f"source file ('{d}', 'parquet')")
    try:
        with pytest.raises(PlanError, match="batch-only"):
            eng.sql("select /*+ hybrid_rrf(text, text, doc_id, "
                    "'x', 1, 5) */ doc_id from hy_docs")
    finally:
        eng.sql("drop stream hy_docs")


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(st.lists(st.lists(st.sampled_from(
            ["red", "blue", "green", "fast", "x9"]),
            min_size=0, max_size=8).map(" ".join),
            min_size=2, max_size=12),
       st.sampled_from(["red", "blue x9", "green fast"]),
       st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=6))
def test_hybrid_rrf_hint_equals_api_fuzz(spark, texts, terms, k,
                                         pool):
    """r14 fuzz shape for the hybrid_rrf hint: random corpora, query
    bags, k and pool vs the Python API — guards the join-back (row
    identity, column preservation), the leg cuts, and the fused
    tie-break together; rrf_fusion's arithmetic is fuzzed in
    test_llm_ops."""
    from flink_dsl_spark.llm_ops.simsearch import hybrid_topk
    eng = FsqlEngine(spark)
    # deterministic unit-ish vectors varying by index — the fuzz
    # drives structure (ranks, ties, pool cuts), not float edge cases
    rows = [(i, t, [1.0 / (i + 1), float(i % 3)])
            for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows,
                               "id long, text string, v array<double>")
    eng.register("hy_f", df)
    got = eng.sql(
        f"select /*+ hybrid_rrf(text, v, id, '{terms}', 0, {k}, "
        f"{pool}) */ id, text, rrf_score from hy_f").collect()
    want = hybrid_topk(df, "text", "v", "id", terms.split(), 0,
                       k=k, pool=pool).collect()
    assert {(r["id"], r["rrf_score"]) for r in got} == \
        {(r["id"], r["rrf"]) for r in want}
    texts_by_id = dict(enumerate(texts))
    assert all(r["text"] == texts_by_id[r["id"]] for r in got)


def test_priority_sample_hint_is_batch_only(engine, spark):
    import os
    import tempfile
    eng = FsqlEngine(spark, streaming=True)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    d = tempfile.mkdtemp(prefix="ps_stream_")
    os.symlink(f"{SF_DIR}/events.parquet",
               os.path.join(d, "events.parquet"))
    eng.sql("create stream ps_ev ("
            + ", ".join(f"{f.name} {_ddl_type(f.dataType)}"
                        for f in ev.schema.fields)
            + f") source file ('{d}', 'parquet')")
    try:
        with pytest.raises(PlanError, match="batch-only"):
            eng.sql("select /*+ priority_sample(event_id, value, 3) */ "
                    "event_id from ps_ev")
    finally:
        eng.sql("drop stream ps_ev")
