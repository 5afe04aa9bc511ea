"""Salted joins: identical results to the unsalted join, hot keys
spread across salt sub-keys."""

import pytest

from pyspark.sql import functions as F

from flink_dsl_spark.skew import salted_join

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key: 90% of fact rows share key 1; dim has one row per key
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
         .otherwise((F.col("id") % 50) + 2).alias("k"),
        F.col("id").alias("v"))
    dim = spark.range(1, 60).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("label"))
    return fact, dim


def test_salted_inner_matches_plain(skewed):
    fact, dim = skewed
    plain = fact.join(dim, ["k"], "inner")
    salted = salted_join(fact, dim, ["k"], salt=8)
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, plain.collect()))
    assert "__salt" not in salted.columns


def test_salted_left_matches_plain(spark, skewed):
    fact, dim = skewed
    # make some fact keys unmatched so the left side matters
    dim_partial = dim.filter("k <> 1")
    plain = fact.join(dim_partial, ["k"], "left")
    salted = salted_join(fact, dim_partial, ["k"], salt=4, how="left")
    assert sorted(map(tuple, salted.collect(), )) == \
        sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(skewed):
    """The point of the salt: the hot key's rows occupy `salt` distinct
    (key, salt) shuffle keys instead of one."""
    fact, _dim = skewed
    f_salted = fact.withColumn(
        "__salt", F.floor(F.rand(42) * 8).cast("int"))
    n = (f_salted.filter("k = 1").select("__salt").distinct().count())
    assert n == 8


def test_salted_join_on_real_tables(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    plain = orders.join(customer,
                        orders.o_custkey == customer.c_custkey) \
                  .select("o_orderkey", "c_name")
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        customer, ["c_custkey"], salt=6).select("o_orderkey", "c_name")
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_salted_join_rejects_outer(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full")
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], salt=0)
