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

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _hyperplane(vec: Column, plane: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j of plane p is
    a [-1,1) value derived from xxhash64(p, j) — computed JVM-side, no
    data shipped from the driver.  Sized per row from ``size(vec)``
    (r15): the old form took a dim probed with an eager ``.first()``
    at plan-build — one driver job per operator call, the same class
    of eager work the r14 prefix-sum fix removed; component values are
    identical for every row of a uniform-dim corpus."""
    return F.transform(
        F.sequence(F.lit(0), F.size(vec) - 1),
        lambda j: (F.xxhash64(F.lit(plane), j) % F.lit(10**6))
        .cast("double") / F.lit(5 * 10**5))


def _sign_bits(vec: Column, planes: int) -> Column:
    """LSH bucket id: sign bit of <vec, plane_p> for each plane."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        dot = F.aggregate(
            F.zip_with(vec, _hyperplane(vec, p),
                       lambda x, h: x.cast("double") * h),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(dot > 0,
                                 F.lit(1 << p).cast("long")).otherwise(0)
    return bucket


def _ivf_centroids(df: DataFrame, vec_col: str, nlist: int,
                   iters: int, seed: int, sample_cap: int = 4096):
    """Spherical k-means centroids from a bounded sample.

    The sample (<= sample_cap rows regardless of table size) comes to
    the driver once; Lloyd iterations run in numpy on that sample.  The
    result is a tiny nlist x dim matrix that ships to executors inside
    the assignment UDF's closure — the full table never participates in
    training, which is what keeps this viable at 100 TB."""
    import numpy as np

    n = df.count()
    frac = min(1.0, sample_cap / max(n, 1))
    sample = [r[0] for r in
              df.select(vec_col).sample(frac, seed=seed).collect()]
    x = np.asarray(sample, dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    k = min(nlist, len(x))
    c = x[:k].copy()                      # deterministic init
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                c[j] = members.sum(axis=0)
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True),
                           1e-12)
    return c


def ivf_ann_topk(df: DataFrame, vec_col: str, id_col: str, query_id,
                 k: int = 10, nlist: int = 16, nprobe: int = 4,
                 iters: int = 5, seed: int = 42) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: vectors are
    assigned to their nearest of ``nlist`` spherical-k-means centroids;
    a query searches only its ``nprobe`` closest cells, with exact
    cosine re-ranking inside them.

    Scale shape: centroid assignment is one vectorized Arrow UDF pass
    (a B x dim @ dim x nlist matmul per batch); the cell filter prunes
    the corpus to ~nprobe/nlist of its rows before any pairwise work.
    In a persisted deployment the assignment table would be written
    bucketed/partitioned by cell so the probe becomes partition pruning
    at the scan."""
    import numpy as np
    from pyspark.sql.types import IntegerType

    c = _ivf_centroids(df, vec_col, nlist, iters, seed)

    @F.pandas_udf(IntegerType())
    def _cell(vs: pd.Series) -> pd.Series:
        # NOT the §4.2 flatten recipe (r15, VERDICT item 6 measured
        # and REJECTED): Arrow already hands each element over as an
        # ndarray, so np.asarray over the batch is one vectorized 2D
        # build — the concatenate+reshape form measured SLOWER
        # (6.5 ms vs 5.4 ms per 4000x64 batch), unlike the minhash
        # case where the win came from eliding a (rows x hashes)
        # matrix, which this per-batch matmul never materializes
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                           1e-12)
        return pd.Series(np.argmax(m @ c.T, axis=1).astype("int32"))

    qrow = df.filter(F.col(id_col) == F.lit(query_id)) \
             .select(vec_col).first()
    if qrow is None:
        raise ValueError(f"query id {query_id!r} not found")
    qv = np.asarray(qrow[0], dtype=np.float64)
    qv = qv / max(np.linalg.norm(qv), 1e-12)
    probe = [int(j) for j in np.argsort(-(c @ qv))[:nprobe]]

    assigned = (spread_for_compute(df)
                .select(F.col(id_col).alias("id"),
                        F.col(vec_col).alias("v"))
                .withColumn("cell", _cell("v"))
                .filter(F.col("cell").isin(probe)))
    q = F.broadcast(
        df.filter(F.col(id_col) == F.lit(query_id))
          .select(F.col(vec_col).alias("__qv")))
    cos = cosine_sim(F.col("v"), F.col("__qv"))
    return (assigned.crossJoin(q)
            .filter(F.col("id") != F.lit(query_id))
            .select("id", F.round(cos, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col("id").asc())
            .limit(k))


def lsh_ann_topk(df: DataFrame, vec_col: str, id_col: str, query_id,
                 k: int = 10, planes: int = 8,
                 probe_bits: int = 1) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets; candidates = rows
    whose bucket is within ``probe_bits`` hamming of the query's bucket
    (multi-probe).  Exact cosine re-rank on the candidates."""
    bdf = (spread_for_compute(df)
           .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                   _sign_bits(F.col(vec_col), planes).alias("bucket")))
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


def quantize_embeddings(df: DataFrame, vec_col: str,
                        id_col: str) -> DataFrame:
    """Per-vector symmetric int8 quantization: returns
    (id, qvec array<int>, scale double) with
    ``scale = 127.0 / max(abs(x))`` (0.0 for an all-zero vector) and
    ``qvec[i] = round(x[i] * scale)`` in [-127, 127].

    This is the memory side of the 100 TB ANN story: a float32
    embedding corpus shrinks ~4x (int8 + one double per vector), which
    is routinely the difference between an in-memory candidate scan and
    a spilling one.  Cosine is scale-invariant, so ranking on the
    quantized vectors needs no dequantization — and int8 dot products
    are EXACT in double arithmetic (|sum| <= 127^2 * dim << 2^53), so
    quantized scores are reproducible across engines and summation
    orders, unlike raw float folds.  Pure JVM higher-order functions,
    zero shuffle; composes with scan pushdown.  The max-abs fold is
    order-independent, so the whole transform is deterministic."""
    v = F.transform(F.col("__v"), lambda x: x.cast("double"))
    mx = F.aggregate(v, F.lit(0.0),
                     lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))
    return (spread_for_compute(df)
            .select(F.col(id_col).alias("id"),
                    F.col(vec_col).alias("__v"))
            .withColumn("__scale", scale)
            .select("id",
                    F.transform(
                        F.transform(F.col("__v"),
                                    lambda x: x.cast("double")),
                        lambda x: F.round(x * F.col("__scale"), 0)
                                   .cast("int")).alias("qvec"),
                    F.col("__scale").alias("scale")))


def cosine_topk_quantized(df: DataFrame, vec_col: str, id_col: str,
                          query_id, k: int = 10) -> DataFrame:
    """Brute-force top-k by cosine over int8-QUANTIZED vectors: the
    same plan shape as cosine_topk (broadcast 1-row query, codegen
    dot products, TakeOrderedAndProject), but each vector element is a
    1-byte integer instead of a 4-byte float — the scan that feeds the
    ranking moves a quarter of the bytes.  Scores differ from the
    exact ranking only by quantization error (~1e-3 for unit-norm
    vectors); tests pin top-k recall against cosine_topk."""
    qt = quantize_embeddings(df, vec_col, id_col)
    q = F.broadcast(qt.filter(F.col("id") == F.lit(query_id))
                      .select(F.col("qvec").alias("__qv")))
    from .dedup import cosine_sim
    cos = cosine_sim(F.col("qvec"), F.col("__qv"))
    return (qt.crossJoin(q)
              .filter(F.col("id") != F.lit(query_id))
              .select("id", F.round(cos, 6).alias("cosine"))
              .orderBy(F.col("cosine").desc(), F.col("id").asc())
              .limit(k))


def rp_signs(out_dim: int, dim: int, seed: int = 42) -> list[list[int]]:
    """The deterministic ±1 projection matrix for random_projection:
    entry (j, i) is +1 when md5("rp:<seed>:<j>:<i>") is even, else -1
    — reproducible on any engine/runtime with nothing shipped but the
    seed (the same no-driver-randomness rule as lsh_ann_topk's
    planes).  Bounded: out_dim*dim entries, computed at PLAN time."""
    import hashlib

    return [[1 if int(hashlib.md5(
                f"rp:{seed}:{j}:{i}".encode()).hexdigest(), 16) % 2 == 0
             else -1
             for i in range(dim)]
            for j in range(out_dim)]


def random_projection(df: DataFrame, vec_col: str, id_col: str,
                      dim: int, out_dim: int = 16,
                      seed: int = 42) -> DataFrame:
    """Database-friendly random projection (Achlioptas, JCSS 66(4)
    2003): map each ``dim``-wide embedding onto ``out_dim``
    pseudo-random ±1 directions, scaled by 1/sqrt(out_dim) — the
    Johnson–Lindenstrauss dimension cut that preserves pairwise
    distances within (1±eps) whp.  Returns (id, p0..p{out_dim-1}).

    The 100 TB story: embedding bytes shrink dim/out_dim-fold BEFORE
    the expensive stages — project, then run embedding dedup / ANN /
    clustering on the short vectors and verify survivors on the full
    ones (the same candidates-then-verify shape as minhash LSH).

    Exactness: the matrix entries are ±1, so every output component
    is a FIXED left-to-right index-order sequence of double adds —
    executed as ``aggregate(zip_with(vec, signs, x*s), 0.0, +)`` —
    followed by one correctly-rounded division by sqrt(out_dim).
    Every engine reproduces the identical sequence bit-exactly,
    which is what makes the op value-oracle-able: the llm74 oracle
    replays it as the 0.0-SEEDED written-out chain ``0.0 ± x0 ± x1
    ± …`` (x*(+1.0)/x*(-1.0) are exact sign flips; the explicit 0.0
    seed matters only for the sign of an all-zero result — a bare
    ``-x0 ± …`` chain would keep -0.0 where the fold's 0.0 + (-0.0)
    is +0.0, and the driver's stringified compare distinguishes
    them).

    Scale shape: pure per-row projection, zero shuffle, composes with
    scan pushdown; out_dim*dim multiply-adds per row.  Each sign row
    ships as ONE ArrayType literal — a first cut as an unrolled
    add/subtract chain put ~dim*out_dim expression nodes into the
    plan and Catalyst analysis dominated wall-clock at small scale
    (6 s to compile 16x64 over 2k rows); the HOF form plans in
    milliseconds and computes the identical floats."""
    import math

    if dim < 1 or out_dim < 1:
        raise ValueError("dim and out_dim must be >= 1")
    if out_dim > 64:
        raise ValueError("out_dim must be <= 64 (the sign matrix is "
                         "compiled into the plan)")
    signs = rp_signs(out_dim, dim, seed)
    root = math.sqrt(float(out_dim))
    # slice to dim so an over-length vector projects its first dim
    # components (matching the oracle's embedding[1..dim]); a shorter
    # vector zip_with-pads NULL signs and yields NULL outputs, the
    # same NULL-poisoning an out-of-range getItem would produce
    v = F.transform(F.slice(F.col(vec_col), 1, dim),
                    lambda x: x.cast("double"))
    cols = []
    for j in range(out_dim):
        srow = F.lit([float(s) for s in signs[j]])
        dot = F.aggregate(F.zip_with(v, srow, lambda x, s: x * s),
                          F.lit(0.0), lambda acc, t: acc + t)
        cols.append((dot / F.lit(root)).alias(f"p{j}"))
    return (spread_for_compute(df)
            .select(F.col(id_col).alias("id"), *cols))


def _dkey(v):
    """Double-collapse membership key mirroring what Spark's isin
    actually does for a NUMERIC probe: cast the id column to double
    and compare — so int 1, float 1.0 and string '1' all collapse to
    repr(1.0), and (beyond 2**53) bigint 10**17 + 1 collapses onto
    the same double as the probe 1e17, exactly like the cast.
    Returns None for values the cast would NULL out (non-numeric
    strings, unconvertible types) — those can never isin-match a
    numeric probe."""
    if isinstance(v, bool):
        return None
    try:
        return repr(float(v))
    except (ValueError, TypeError, OverflowError):
        return None


def _ekey(v):
    """Exact-numeric canonical key for comparisons Spark performs at
    long/decimal type: the plain-notation decimal string with
    trailing fractional zeros stripped, so Decimal('5.0'), int 5 and
    string '0005' all key to '5' — exact numeric equality, never a
    2**53-style collapse (two distinct values never share a key).
    Returns None for values decimal can't parse (non-numeric strings,
    floats — floats force the double regime and never reach here)."""
    import decimal
    if isinstance(v, bool) or isinstance(v, float):
        return None
    if not isinstance(v, (int, str)) and type(v).__name__ != "Decimal":
        return None
    try:
        d = decimal.Decimal(str(v))
    except decimal.InvalidOperation:
        return None
    s = format(d, "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return "0" if s in ("", "-", "-0") else s


def cosine_topk_batch(df: DataFrame, vec_col: str, id_col: str,
                      query_ids: list, k: int = 10) -> DataFrame:
    """Exact top-k by cosine for a BATCH of query ids in ONE corpus
    pass — the serving shape of brute-force ANN ("embed the eval set,
    find every item's neighbors"), versus |Q| separate cosine_topk
    jobs that each rescan the corpus.

    Returns (qid, id, cosine) with k rows per query id, ordered by
    (qid, cosine desc, id).  Self-matches are excluded and cosine
    rounds to 6 decimals before ranking — the same cross-engine
    premises as cosine_topk (llm06).

    Scale shape: the |Q|-row query table is collected at CALL time
    (one bounded scan — also validates every requested id exists,
    failing loudly on typos) and broadcast as a local relation
    (bounded: <= 10k ids enforced), ONE codegen cosine per
    (candidate, query), then a
    per-qid rank<=k filter that compiles to WindowGroupLimit
    (plan-gated) — Spark runs it in Partial mode BEFORE the qid
    exchange, so each map task forwards at most k rows per query and
    the shuffle carries O(tasks * |Q| * k) triples, never the
    |corpus| x |Q| cross product."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    if len(query_ids) > 10_000:
        raise ValueError("query_ids is broadcast plan-side — pass at "
                         "most 10k ids (use lsh/ivf for larger sets)")
    if df.isStreaming:
        raise ValueError("cosine_topk_batch is batch-only: the query "
                         "rows are collected EAGERLY at call time "
                         "(one bounded corpus scan) — a stream cannot "
                         "be collected; snapshot it to a table first")
    qdf = (df.filter(F.col(id_col).isin(list(query_ids)))
             .select(F.col(id_col).alias("qid"),
                     F.col(vec_col).alias("__qv")))
    # a typo'd / absent query id would otherwise just yield a quietly
    # smaller result set (it never joins) — fail loudly instead.  The
    # query rows are collected ONCE (bounded: <=10k rows post-filter)
    # and re-shipped as a local relation, so the corpus is still
    # scanned exactly once per side: NOTE the function is therefore
    # EAGER — the query-side scan runs at call time (and snapshots
    # the query vectors), not inside the returned lazy plan.
    # Membership mirrors isin's coercion, which is LIST-LEVEL: Spark
    # resolves In(col, probes) to ONE common comparison type across
    # the column and every probe (measured on this Spark, ANSI on).
    # Two regimes:
    #   - comparison AT DOUBLE — when the id column is float/double
    #     or ANY probe is a Python float (it promotes the whole
    #     list: [10**17, 2.5] matches bigint 10**17 + 1 — measured;
    #     [5, 2.5] matches string ids '5.0' and '2.5' — measured).
    #     Probes match through the double-collapse key (_dkey),
    #     colliding past 2**53 exactly like the cast.
    #   - comparison EXACT — everything else: long for int probes vs
    #     integer columns, DECIMAL for Decimal probes vs integer/
    #     decimal/STRING columns (r14 review, execution-confirmed:
    #     Spark widens long+decimal to decimal and casts a string
    #     column to the decimal probe's type, never to double —
    #     treating a Decimal probe as double-promoting falsely
    #     accepted an absent int probe past 2**53 through a
    #     colliding _dkey), string-vs-string for string ids.  Probes
    #     match by raw str() or by the exact-numeric canonical key
    #     (_ekey), which collapses trailing zeros (Decimal('5.0')
    #     finds bigint 5) but never two distinct values.  A
    #     malformed string probe vs a numeric column — or a
    #     non-integer string ID under an int probe's column cast —
    #     raises Spark's own CAST_INVALID_INPUT at the collect
    #     below: loud, and not ours to re-report.
    qrows = qdf.collect()
    raw_found = {str(r["qid"]) for r in qrows}
    id_type = df.schema[id_col].dataType
    float_col = isinstance(id_type, (T.FloatType, T.DoubleType))
    list_at_double = (
        float_col
        or any(isinstance(p, float) and not isinstance(p, bool)
               for p in query_ids))
    string_col = isinstance(id_type, T.StringType)
    # string probes take the string comparison ONLY when the whole
    # list is strings against a string column — one int/Decimal probe
    # in the list drags the string column through the numeric cast
    # (list-level coercion), and the string probes compare numerically
    # with it (r14 review pass 2: the per-probe guard spuriously
    # rejected a numeric-cast-matched string probe in a mixed list)
    pure_string_cmp = string_col and all(
        isinstance(p, str) for p in query_ids)
    key = _dkey if list_at_double else _ekey
    key_found = {k for k in (key(r["qid"]) for r in qrows)
                 if k is not None}

    def _present(p) -> bool:
        if str(p) in raw_found:
            return True
        if isinstance(p, bool):
            return False
        if not list_at_double and pure_string_cmp:
            # pure string-vs-string comparison: exact, no numeric
            # canonicalization ('1.0' must not find id '1')
            return False
        k = key(p)
        return k is not None and k in key_found
    missing = sorted(str(i) for i in set(query_ids) if not _present(i))
    if missing:
        raise ValueError(
            f"query id(s) not present in the corpus: "
            f"{', '.join(missing[:10])}"
            + (f" (+{len(missing) - 10} more)"
               if len(missing) > 10 else ""))
    spark = df.sparkSession
    q = F.broadcast(spark.createDataFrame(qrows, qdf.schema))
    cos = F.round(cosine_sim(F.col(vec_col), F.col("__qv")), 6)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("id").asc())
    return (spread_for_compute(df).crossJoin(q)
            .filter(F.col(id_col) != F.col("qid"))
            .select("qid", F.col(id_col).alias("id"),
                    cos.alias("cosine"))
            .withColumn("__rnk", F.row_number().over(w))
            .filter(F.col("__rnk") <= k).drop("__rnk")
            .orderBy("qid", F.col("cosine").desc(), F.col("id")))


def rrf_fusion(ranked: list, k: int = 10, k_rrf: int = 60,
               id_col: str = "id", rank_col: str = "rank") -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR
    2009) of N ranked candidate lists: every item's fused score is
    Σ_lists 1/(k_rrf + rank), summing only over the lists it appears
    in; returns the top ``k`` by (rrf desc, id).  The standard way to
    merge lexical (BM25) and semantic (embedding-cosine) retrieval
    without score calibration — ranks are comparable where raw
    scores are not.

    Cross-engine determinism: ranks are INTEGERS (deterministic when
    the upstream lists tie-break on id), each reciprocal is one
    correctly-rounded IEEE division, and the sum associates in LIST
    ORDER (coalesce(1/(k_rrf+r_0), 0) + coalesce(1/(k_rrf+r_1), 0) +
    …) — an oracle spelling the same left-associated chain matches
    bit-for-bit.

    Scale shape: the inputs are the BOUNDED top-pool outputs of
    upstream retrieval (each ≤ pool rows — never a corpus), so the
    full-outer join chain and the k-cut are trivially small; the
    corpus-scale work lives entirely in the upstream operators."""
    if not ranked:
        raise ValueError("ranked must be a non-empty list of "
                         "ranked DataFrames")
    if k < 1 or k_rrf < 1:
        raise ValueError("k and k_rrf must be >= 1")
    sides = [d.select(F.col(id_col).alias("id"),
                      (1.0 / (F.lit(k_rrf) + F.col(rank_col)))
                      .alias(f"__rrf_{i}"))
             for i, d in enumerate(ranked)]
    out = sides[0]
    for s in sides[1:]:
        out = out.join(s, "id", "full")
    expr = F.coalesce(F.col("__rrf_0"), F.lit(0.0))
    for i in range(1, len(sides)):
        expr = expr + F.coalesce(F.col(f"__rrf_{i}"), F.lit(0.0))
    return (out.select("id", expr.alias("rrf"))
               .orderBy(F.col("rrf").desc(), F.col("id"))
               .limit(k))


def hybrid_topk(df: DataFrame, text_col: str, vec_col: str,
                id_col: str, query_terms: list, query_id,
                k: int = 10, pool: int = 50,
                k_rrf: int = 60) -> DataFrame:
    """Hybrid lexical + semantic retrieval: BM25 over ``query_terms``
    and embedding-cosine similarity to the ``query_id`` row, each cut
    to its top-``pool`` candidates, fused by Reciprocal Rank Fusion —
    the two-tower serving shape ("docs that MATCH the query terms OR
    RESEMBLE the seed document", rank-merged without score
    calibration).  Returns (id, rrf), top ``k`` by (rrf desc, id).

    Both candidate ranks tie-break on ascending id over
    already-deterministic scores (bm25_scores' integer micro-score
    sum; cosine_topk's round-6 cosine), so the fused ordering
    value-oracles bit-exactly (see rrf_fusion).

    Input contract (lazy building block — NOT validated here; the
    hybrid_rrf dialect hint validates eagerly): ``query_id`` must
    match exactly ONE row and that row's vector must be non-NULL.
    An absent id silently empties the cosine leg (pure-BM25
    ranking); a duplicate id broadcasts 2+ query rows into the
    cosine crossJoin (candidates duplicated, ranks corrupted); a
    NULL vector NULLs every cosine (leg ranks by ascending id).

    Scale shape: the corpus-scale work is exactly the two upstream
    operators' (bm25_scores: one filtered explode + broadcast stats +
    TakeOrderedAndProject; cosine_topk: broadcast 1-row query +
    TakeOrderedAndProject) — the rank windows and the fusion join run
    on the two ≤ pool-row candidate relations (single-partition BY
    DESIGN over bounded input, the llm69 pattern), never the
    corpus."""
    from pyspark.sql import Window

    from .textstats import bm25_scores

    if pool < 1:
        raise ValueError("pool must be >= 1")
    bm = bm25_scores(df, text_col, id_col, query_terms, k=pool)
    bm_r = bm.select(
        "id", F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("id")))
        .alias("rank"))
    cs = cosine_topk(df, vec_col, id_col, query_id, k=pool)
    cs_r = cs.select(
        "id", F.row_number().over(
            Window.orderBy(F.col("cosine").desc(), F.col("id")))
        .alias("rank"))
    return rrf_fusion([bm_r, cs_r], k=k, k_rrf=k_rrf)
