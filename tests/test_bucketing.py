"""Bucketed tables: the write-once shuffle for co-located joins.

Verifies the three claims bucketing.py makes: (1) a join of two tables
bucketed on the join key compiles WITHOUT an exchange on either side,
(2) an aggregation on the bucket key compiles without an exchange, and
(3) results are identical to the unbucketed plans.  Broadcast joins are
disabled inside these tests (a broadcast would hide the exchange these
assertions are about); production keeps broadcast for genuinely small
dims and bucketing for fact-fact joins.
"""

import pytest

from pyspark.sql import functions as F

from flink_dsl_spark.bucketing import bucket_spec, write_bucketed

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    """orders + lineitem bucketed by order key, 8 buckets, sorted."""
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = write_bucketed(orders, "t_orders_b", ["o_orderkey"], 8,
                       sort_cols=["o_orderkey"],
                       path=str(base / "orders"))
    l = write_bucketed(lineitem, "t_lineitem_b", ["l_orderkey"], 8,
                       sort_cols=["l_orderkey"],
                       path=str(base / "lineitem"))
    yield o, l, orders, lineitem
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_bucketed_join_has_no_exchange(spark, bucketed_pair,
                                       no_broadcast):
    o, l, orders, lineitem = bucketed_pair
    joined = o.join(l, o.o_orderkey == l.l_orderkey) \
              .select("o_orderkey", "o_custkey", "l_extendedprice")
    p = _plan(joined)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p          # both sides pre-bucketed
    # identical rows to the unbucketed join
    ref = orders.join(lineitem,
                      orders.o_orderkey == lineitem.l_orderkey) \
                .select("o_orderkey", "o_custkey", "l_extendedprice")
    assert sorted(map(tuple, joined.collect())) == \
        sorted(map(tuple, ref.collect()))


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    _o, l, _orders, lineitem = bucketed_pair
    agg = l.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q"))
    assert "Exchange" not in _plan(agg)
    ref = {r["l_orderkey"]: r["q"] for r in
           lineitem.groupBy("l_orderkey")
                   .agg(F.sum("l_quantity").alias("q")).collect()}
    got = {r["l_orderkey"]: r["q"] for r in agg.collect()}
    assert got == ref


def test_unbucketed_join_does_exchange(spark, bucketed_pair,
                                       no_broadcast):
    """Control: the same join over plain parquet reads shuffles both
    sides — this is the exchange bucketing removes."""
    _o, _l, orders, lineitem = bucketed_pair
    p = _plan(orders.join(lineitem,
                          orders.o_orderkey == lineitem.l_orderkey))
    assert "Exchange hashpartitioning" in p


def test_bucket_spec_roundtrip(spark, bucketed_pair):
    spec = bucket_spec(spark, "t_lineitem_b")
    assert spec["num_buckets"] == 8
    assert spec["bucket_cols"] == ["l_orderkey"]
    assert spec["sort_cols"] == ["l_orderkey"]
    with pytest.raises(Exception):
        bucket_spec(spark, "nonexistent_table_xyz")


def test_engine_join_on_bucketed_relations(spark, bucketed_pair,
                                           no_broadcast):
    """FSQL queries over register_bucketed relations keep the
    co-location: the engine-emitted join plan has no exchange, and the
    result matches the engine's plain-parquet answer."""
    from flink_dsl_spark import FsqlEngine
    eng = FsqlEngine(spark)
    try:
        eng.register_bucketed("ob", "t_orders_b")
        eng.register_bucketed("lb", "t_lineitem_b")
        eng.register_parquet("op", f"{SF_DIR}/orders.parquet")
        eng.register_parquet("lp", f"{SF_DIR}/lineitem.parquet")
        q = ("select ob.o_orderkey as k, lb.l_linenumber as n "
             "from ob join lb on ob.o_orderkey = lb.l_orderkey")
        fast = eng.sql(q)
        assert "Exchange" not in _plan(fast)
        ref = eng.sql("select op.o_orderkey as k, lp.l_linenumber as n "
                      "from op join lp on op.o_orderkey = lp.l_orderkey")
        assert sorted(map(tuple, fast.collect())) == \
            sorted(map(tuple, ref.collect()))
    finally:
        eng.close()
