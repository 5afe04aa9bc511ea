"""Embedding clustering for corpus curation: distributed k-means and
SemDeDup-style semantic deduplication (Abbas et al. 2023 — cluster the
embedding space, then remove near-identical members within each
cluster; clustering is what makes semantic dedup sub-quadratic).

Scale design: every per-row computation is a JVM higher-order-function
expression over broadcast centroid literals (no UDF, no shuffle); the
Lloyd update is one posexplode + partial-aggregated groupBy per
iteration whose result — k x dim doubles — is the ONLY thing the driver
ever holds.  Unlike simsearch._ivf_centroids (bounded-sample training
for index build), this trains on the FULL corpus distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import spread_for_compute


def _xxhash_id(c, seed: int):
    return F.xxhash64(c, F.lit(seed))


def _dist_cols(vec, centroids):
    """Squared-euclidean distance expressions to each centroid, as pure
    HOF folds (deterministic left-to-right summation — the property the
    cross-engine oracle relies on)."""
    out = []
    for c in centroids:
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(vec, lit,
                       lambda x, y: (x.cast("double") - y) *
                                    (x.cast("double") - y)),
            F.lit(0.0), lambda acc, v: acc + v)
        out.append(d)
    return out


def _assign_expr(vec, centroids):
    """Nearest-centroid index (0-based); ties resolve to the FIRST
    minimal index on both engines (array_position / list_indexof)."""
    dists = F.array(*_dist_cols(vec, centroids))
    return (F.array_position(dists, F.array_min(dists)) - F.lit(1)) \
        .cast("int")


def kmeans_fit(df: DataFrame, vec_col: str, id_col: str, k: int,
               max_iters: int = 10, seed: int = 42,
               quantize: int | None = None,
               id_hash=None) -> list:
    """Full-corpus Lloyd k-means; returns the k x dim centroid list
    (the only driver-side object — k*dim doubles, bounded).

    Init: the k vectors with the smallest (hash(id, seed), id) — a
    reproducible pseudo-random draw that costs one TakeOrdered pass,
    no sampling state.  Each iteration: one broadcast-literal
    assignment projection + one posexplode/groupBy(cluster, dim) avg
    (partial-aggregated, k*dim result rows).  Empty clusters keep
    their previous centroid.

    ``quantize`` rounds updated centroids to that many decimals each
    iteration — the cross-engine-oracle configuration (absorbs
    summation-order ulps in the distributed mean); production leaves
    it None for full precision."""
    if id_hash is None:
        id_hash = _xxhash_id
    base = spread_for_compute(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    init = (base
            .orderBy(id_hash(F.col("id"), seed).asc(), F.col("id").asc())
            .limit(k)
            .select("v").collect())
    centroids = [[float(x) for x in r["v"]] for r in init]
    if quantize is not None:
        centroids = [[round(x, quantize) for x in c] for c in centroids]
    for _ in range(max_iters):
        assigned = base.withColumn(
            "c", _assign_expr(F.col("v"), centroids))
        upd = (assigned
               .select("c", F.posexplode("v").alias("pos", "val"))
               .groupBy("c", "pos")
               .agg(F.avg(F.col("val").cast("double")).alias("m"))
               .collect())
        nxt = [list(c) for c in centroids]
        for r in upd:
            nxt[r["c"]][r["pos"]] = float(r["m"])
        if quantize is not None:
            nxt = [[round(x, quantize) for x in c] for c in nxt]
        if nxt == centroids:
            break
        centroids = nxt
    return centroids


def kmeans_assign(df: DataFrame, vec_col: str, id_col: str,
                  centroids: list) -> DataFrame:
    """(id, cluster) for every row — a pure projection against the
    broadcast centroid literals; composes with any scan."""
    return spread_for_compute(df).select(
        F.col(id_col).alias("id"),
        _assign_expr(F.col(vec_col), centroids).alias("cluster"))


def kmeans(df: DataFrame, vec_col: str, id_col: str, k: int,
           max_iters: int = 10, seed: int = 42,
           quantize: int | None = None, id_hash=None) -> DataFrame:
    """fit + assign in one call; returns (id, cluster)."""
    c = kmeans_fit(df, vec_col, id_col, k, max_iters, seed,
                   quantize, id_hash)
    return kmeans_assign(df, vec_col, id_col, c)


def semdedup(df: DataFrame, vec_col: str, id_col: str, k: int,
             threshold: float = 0.95, max_iters: int = 3,
             seed: int = 42, quantize: int | None = None,
             id_hash=None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embeddings, then drop
    every document with a SAME-CLUSTER smaller-id neighbor at cosine
    >= threshold.  Returns surviving (id, cluster).

    The cluster partition is what keeps this sub-quadratic: pairwise
    cosine runs per-cluster via an equi-join on the cluster id — at
    scale k grows with the corpus so cluster populations stay bounded,
    and the O(n^2) never materializes globally.  The keep rule
    (survive unless a smaller id is near) is deterministic and
    one-pass — no transitive closure, matching the reference
    formulation's per-cluster greedy scan."""
    from .dedup import cosine_sim

    c = kmeans_fit(df, vec_col, id_col, k, max_iters, seed,
                   quantize, id_hash)
    # assignment carries the vector along — no corpus-sized join back
    assigned = spread_for_compute(df).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        _assign_expr(F.col(vec_col), c).alias("cluster"))
    a = assigned.select(F.col("id").alias("id_a"), F.col("cluster"),
                        F.col("v").alias("va"))
    b = assigned.select(F.col("id").alias("id_b"),
                        F.col("cluster").alias("cb"),
                        F.col("v").alias("vb"))
    near = (a.join(b, (F.col("cluster") == F.col("cb")) &
                   (F.col("id_b") < F.col("id_a")))
             .filter(F.round(cosine_sim(F.col("va"), F.col("vb")), 6)
                     >= threshold)
             .select(F.col("id_a").alias("id"))
             .distinct())
    return (assigned.select("id", "cluster")
                    .join(near, "id", "left_anti"))
