"""Shared helpers for the LLM-pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

# per-tag cache-of-one: operators whose RESULT must stay persisted past
# their own return (iterative algorithms, reused signatures) register it
# here so a long-lived session running many operators doesn't accumulate
# storage memory — each new call evicts the same operator's previous
# cache, and release_caches() frees everything.
_OP_CACHES: dict[str, DataFrame] = {}


def cache_of_one(tag: str, df: DataFrame) -> DataFrame:
    """Persist ``df``, evicting whatever the same ``tag`` persisted
    before.  Returns the persisted frame."""
    prev = _OP_CACHES.pop(tag, None)
    if prev is not None:
        prev.unpersist()
    df = df.persist()
    _OP_CACHES[tag] = df
    return df


def release_caches(tag: str | None = None) -> None:
    """Unpersist one tag's cache (or all of them).  Safe any time —
    consumers that already materialized their results lose nothing."""
    tags = [tag] if tag is not None else list(_OP_CACHES)
    for t in tags:
        prev = _OP_CACHES.pop(t, None)
        if prev is not None:
            prev.unpersist()


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
    if df.isStreaming:
        # partition count is the source's business on a stream (and
        # .rdd is illegal there); micro-batches already fan out
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
