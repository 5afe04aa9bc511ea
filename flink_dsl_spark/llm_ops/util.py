"""Shared helpers for the LLM-pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Repartition a coarsely-partitioned input up to cluster parallelism
    before a compute-heavy projection (minhash permutations, simhash
    folds, per-row hyperplane dot products).

    A scan of a few small (or few huge gzip) files yields fewer splits
    than the cluster has cores, and everything downstream of it runs on
    those few tasks.  For cheap JVM expressions that is fine; for
    operators whose per-row cost dwarfs the exchange cost, one
    round-robin shuffle of the raw input buys full-cluster parallelism.
    Inputs that are already as parallel as the cluster pass through
    untouched, so at 100 TB (thousands of splits) this is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
