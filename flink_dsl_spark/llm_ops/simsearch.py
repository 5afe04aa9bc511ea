"""Similarity search over embedding columns.

* cosine_topk — brute-force exact top-k: one pass, JVM-side dot products,
  TakeOrderedAndProject (no full sort).  The correct baseline and the
  verifier for approximate variants.
* lsh_ann_topk — random-hyperplane LSH: bucket by sign bits, search the
  query's bucket (and its 1-bit neighbors) only.  The 100 TB path: the
  bucket join prunes candidates by orders of magnitude; planes are
  derived deterministically from xxhash64 so the index is reproducible
  with no driver-side randomness shipped to executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_sim
from .util import spread_for_compute


def _query_vec(df: DataFrame, vec_col: str, id_col: str, query_id) :
    """One-row frame holding the query vector (joined via broadcast)."""
    return F.broadcast(
        df.filter(F.col(id_col) == F.lit(query_id))
          .select(F.col(vec_col).alias("__qv")))


def cosine_topk(df: DataFrame, vec_col: str, id_col: str, query_id,
                k: int = 10) -> DataFrame:
    """Exact top-k by cosine to the row with id == query_id.
    Broadcast the 1-row query, compute cosine in codegen, then
    ORDER BY + LIMIT (Catalyst -> TakeOrderedAndProject: no global
    sort materialization)."""
    q = _query_vec(df, vec_col, id_col, query_id)
    cos = cosine_sim(F.col(vec_col), F.col("__qv"))
    return (spread_for_compute(df).crossJoin(q)
            .filter(F.col(id_col) != F.lit(query_id))
            .select(F.col(id_col).alias("id"),
                    F.round(cos, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col("id").asc())
            .limit(k))


def _hyperplane(dim: int, plane: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j of plane p is
    a [-1,1) value derived from xxhash64(p, j) — computed JVM-side, no
    data shipped from the driver."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.xxhash64(F.lit(plane), j) % F.lit(10**6))
        .cast("double") / F.lit(5 * 10**5))


def _sign_bits(vec: Column, dim: int, planes: int) -> Column:
    """LSH bucket id: sign bit of <vec, plane_p> for each plane."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        dot = F.aggregate(
            F.zip_with(vec, _hyperplane(dim, p),
                       lambda x, h: x.cast("double") * h),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(dot > 0,
                                 F.lit(1 << p).cast("long")).otherwise(0)
    return bucket


def lsh_ann_topk(df: DataFrame, vec_col: str, id_col: str, query_id,
                 k: int = 10, planes: int = 8,
                 probe_bits: int = 1) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets; candidates = rows
    whose bucket is within ``probe_bits`` hamming of the query's bucket
    (multi-probe).  Exact cosine re-rank on the candidates."""
    dim = len(df.select(vec_col).first()[0])
    bdf = (spread_for_compute(df)
           .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                   _sign_bits(F.col(vec_col), dim, planes).alias("bucket")))
    q = F.broadcast(
        bdf.filter(F.col("id") == F.lit(query_id))
           .select(F.col("v").alias("__qv"),
                   F.col("bucket").alias("__qb")))
    ham = F.bit_count(F.col("bucket").bitwiseXOR(F.col("__qb")))
    cos = cosine_sim(F.col("v"), F.col("__qv"))
    return (bdf.crossJoin(q)
            .filter((ham <= probe_bits) & (F.col("id") != F.lit(query_id)))
            .select("id", F.round(cos, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col("id").asc())
            .limit(k))
