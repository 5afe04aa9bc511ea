"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine.

Scale design (100 TB):
  * exact dedup is one hash-shuffle on a normalized key (map-side combine);
  * n-gram Jaccard is the *verifier*: an inverted-index self-join — O(sum
    of postings^2) — so at scale it runs on LSH candidates only
    (minhash_lsh_pairs does exactly that);
  * MinHash signatures + banding: signature computation is fully JVM-side
    (higher-order functions inside whole-stage codegen), banding shuffles
    (band_id, band_hash) — skew-safe because bucket sizes are bounded by
    real duplicate clusters;
  * SimHash: token hashes JVM-side, 64-bit fold in one Arrow-batched
    Pandas UDF (numpy popcount matrix), candidate pairs via band-exact
    match on 16-bit chunks, verified by hamming distance (pivoted to
    JVM ``bit_count(a ^ b)``).
"""

from __future__ import annotations

import random

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import spread_for_compute

# Mersenne prime 2^31-1: classic universal-hash modulus for minhash perms
_MERSENNE = (1 << 31) - 1


# ---------------------------------------------------------------------------
# normalization / shingling (shared)
# ---------------------------------------------------------------------------

def normalized(text: Column) -> Column:
    """Canonical text form: lowercase, alnum-only, squeezed whitespace.

    One regex pass: a run of anything non-alphanumeric (whitespace
    included) collapses to a single space — identical output to the
    two-pass strip-then-squeeze form, at half the regex cost over what
    is the corpus-wide hot path (every dedup/textstats op starts here).

    U+0130 (İ) is pre-translated to 'i': it is the ONLY codepoint in
    Unicode whose lowercase mapping differs between the JVM's full
    case mapping (-> i + combining dot, which the alnum squeeze then
    splits into two tokens) and simple codepoint-wise lowering as
    DuckDB/utf8proc does (-> i).  Verified by exhaustive BMP sweep
    (r5); the translate keeps every normalize-keyed oracle premise
    exact and yields the saner single-token form.
    """
    c = F.lower(F.translate(text, "İ", "i"))
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


def char_shingles(text: Column, n: int) -> Column:
    """Distinct character n-grams, computed with higher-order functions
    (JVM-side, no UDF): transform(sequence(1, len-n+1), i -> substr)."""
    ln = F.length(text)
    idx = F.sequence(F.lit(1), F.greatest(ln - F.lit(n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(text, i, n))
    return F.array_distinct(grams)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str,
                normalize: bool = True) -> DataFrame:
    """Exact duplicate removal by (normalized) content hash: one
    hash-aggregate; survivor = min id per group.  Returns
    (id, n_duplicates) for every surviving document.

    The aggregation keys on a 128-bit content fingerprint (two
    independent xxhash64 passes), not on the text itself — the shuffle
    moves 16 bytes per row instead of whole documents, which at corpus
    scale is the difference between shuffling kilobytes and shuffling
    the corpus.  Collision odds at 10^10 docs are ~(10^10)^2 / 2^129
    ≈ 1e-19 — far below hardware error rates."""
    key = normalized(F.col(text_col)) if normalize else F.col(text_col)
    return (spread_for_compute(df)
            .groupBy(F.xxhash64(key).alias("__h1"),
                     F.xxhash64(key, F.lit(1)).alias("__h2"))
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("n_duplicates"))
            .select(id_col, "n_duplicates"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise, inverted-index join)
# ---------------------------------------------------------------------------

def _shingle_index(df: DataFrame, text_col: str, id_col: str, n: int):
    """(sh, e): per-doc distinct-shingle arrays with sizes, and the
    exploded inverted index — the shared base of the n-gram pair
    detectors (Jaccard and containment)."""
    sh = (spread_for_compute(df)
            .select(F.col(id_col).alias("id"),
                    char_shingles(F.col(text_col), n).alias("sh"))
            .withColumn("n_sh", F.size("sh")))
    return sh, sh.select("id", F.explode("sh").alias("s"))


def _shared_shingle_counts(e: DataFrame, count_alias: str) -> DataFrame:
    """Inverted-index self-join: one row per (id_a < id_b) pair that
    shares >= 1 indexed shingle, with the shared count — every score
    derives from this aggregate, never from per-pair array scans over
    the full candidate set."""
    a, b = e.alias("a"), e.alias("b")
    return (a.join(b, (F.col("a.s") == F.col("b.s")) &
                   (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias(count_alias)))


def _join_pair_sizes(pairs: DataFrame, meta: DataFrame,
                     cols: dict) -> DataFrame:
    """Attach per-side metadata: ``cols`` maps a meta column to its
    (a_side_alias, b_side_alias)."""
    sel_a = [F.col("id").alias("id_a")] + \
        [F.col(c).alias(a) for c, (a, _) in cols.items()]
    sel_b = [F.col("id").alias("id_b")] + \
        [F.col(c).alias(b) for c, (_, b) in cols.items()]
    return (pairs.join(meta.select(*sel_a), "id_a")
                 .join(meta.select(*sel_b), "id_b"))


def _capped_candidates(sh: DataFrame, e: DataFrame,
                       max_posting_size: int, threshold: float,
                       ub_score) -> DataFrame:
    """Shared posting-cap scaffold for the n-gram pair detectors:
    (1) over-cap postings drop before the self-join (broadcast
    anti-join); (2) the join counts shared KEPT shingles — a lower
    bound of true shared; (3) the caller's upper-bound score, built
    from ``ub_shared = shared_kept + min(capped_a, capped_b)``,
    prunes the pair list.  The bound compares after the SAME round-6
    the final filters apply, so a pair sitting on the rounding
    boundary is never pruned that the exhaustive path would keep
    (r13 review; round is monotone, so the rounded bound stays
    sound).  Returns the (id_a, id_b) candidates for exact
    verification on full shingle arrays."""
    big = (e.groupBy("s")
            .agg(F.count(F.lit(1)).alias("__pc"))
            .filter(F.col("__pc") > max_posting_size)
            .select("s"))
    kept = e.join(F.broadcast(big), "s", "left_anti")
    n_kept = kept.groupBy("id").agg(F.count(F.lit(1)).alias("n_kept"))
    meta = (sh.select("id", "n_sh")
              .join(n_kept, "id", "left")
              .withColumn("n_capped",
                          F.col("n_sh") - F.coalesce("n_kept", F.lit(0)))
              .select("id", "n_sh", "n_capped"))
    pairs = _join_pair_sizes(
        _shared_shingle_counts(kept, "shared_kept"), meta,
        {"n_sh": ("na", "nb"), "n_capped": ("ca", "cb")})
    ub_shared = F.col("shared_kept") + F.least("ca", "cb")
    return (pairs
            .filter(F.round(ub_score(ub_shared), 6) >= threshold)
            .select("id_a", "id_b"))


def _verified_pairs(cand: DataFrame, sh: DataFrame):
    """Exact-verification scaffold: join candidates back to their FULL
    shingle arrays; returns (joined, shared_count_expr)."""
    joined = (cand
              .join(sh.alias("sa"), F.col("id_a") == F.col("sa.id"))
              .join(sh.alias("sb"), F.col("id_b") == F.col("sb.id")))
    return joined, F.size(F.array_intersect(F.col("sa.sh"),
                                            F.col("sb.sh")))


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        n: int = 8, threshold: float = 0.8,
                        max_posting_size: int | None = None) -> DataFrame:
    """All pairs with char-n-gram Jaccard >= threshold via an
    inverted-index self-join whose aggregate counts shared shingles —
    the score comes from the count, never from per-pair array scans
    over the full candidate set.

    ``max_posting_size`` is the straggler guard: the self-join emits
    len(posting)^2/2 rows per shingle, so one boilerplate shingle shared
    by a million docs is a 10^12-row task.  With the cap, over-cap
    postings are dropped before the join (broadcast anti-join, same
    shape as minhash_lsh_pairs' max_bucket_size), the join counts
    shared KEPT shingles (a lower bound), and a sound upper bound —
    true shared <= kept shared + min(capped_a, capped_b) — prunes the
    pair list before an exact array-intersect verification of the few
    survivors.  No false negatives among pairs sharing >=1 under-cap
    shingle; a pair is missed only when it shares NOTHING rarer than
    the cap — real near-duplicates share many rare shingles.  Uncapped,
    results are exhaustively exact; at scale prefer minhash_lsh_pairs
    (this function is its verifier).  Scaffolding shared with
    ngram_containment_pairs (_shingle_index/_capped_candidates/
    _verified_pairs — r13 review consolidation)."""
    sh, e = _shingle_index(df, text_col, id_col, n)
    jac_of = lambda shared: shared / (F.col("na") + F.col("nb")
                                      - shared)
    if max_posting_size is None:
        pairs = _join_pair_sizes(_shared_shingle_counts(e, "shared"),
                                 sh.select("id", "n_sh"),
                                 {"n_sh": ("na", "nb")})
        return (pairs
                .withColumn("jaccard",
                            F.round(jac_of(F.col("shared")), 6))
                .filter(F.col("jaccard") >= threshold)
                .select("id_a", "id_b", "jaccard"))
    cand = _capped_candidates(sh, e, max_posting_size, threshold,
                              jac_of)
    j, shared = _verified_pairs(cand, sh)
    return (j.withColumn("jaccard", F.round(
                shared / (F.col("sa.n_sh") + F.col("sb.n_sh")
                          - shared), 6))
             .filter(F.col("jaccard") >= threshold)
             .select("id_a", "id_b", "jaccard"))


def ngram_containment_pairs(df: DataFrame, text_col: str, id_col: str,
                            n: int = 8, threshold: float = 0.8,
                            max_posting_size: int | None = None
                            ) -> DataFrame:
    """All pairs where char-n-gram CONTAINMENT >= threshold in either
    direction — the ASYMMETRIC complement of ngram_jaccard_pairs:
    containment(A in B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|
    detects quotes, excerpts and boilerplate-wrapped copies that
    Jaccard misses (a 100-word quote inside a 10k-word page has
    near-zero Jaccard but containment ≈ 1 for the quote side).

    Returns one row per unordered pair (id_a < id_b) with BOTH
    directions, (id_a, id_b, cont_a_in_b, cont_b_in_a), keeping pairs
    where either direction clears the threshold; containments round
    to 6 decimals (integer count / integer count — one
    correctly-rounded division each, so the values replay bit-exactly
    in any engine).

    Scale shape: identical to ngram_jaccard_pairs (the scaffolding is
    literally shared — _shingle_index/_capped_candidates/
    _verified_pairs): inverted-index self-join whose aggregate counts
    shared shingles, with the same ``max_posting_size`` straggler
    guard; the capped path prunes against the SMALLER denominator —
    the direction where containment is largest — before the exact
    verification of survivors."""
    sh, e = _shingle_index(df, text_col, id_col, n)
    if max_posting_size is None:
        pairs = _join_pair_sizes(_shared_shingle_counts(e, "shared"),
                                 sh.select("id", "n_sh"),
                                 {"n_sh": ("na", "nb")})
        return (pairs
                .withColumn("cont_a_in_b",
                            F.round(F.col("shared") / F.col("na"), 6))
                .withColumn("cont_b_in_a",
                            F.round(F.col("shared") / F.col("nb"), 6))
                .filter((F.col("cont_a_in_b") >= threshold)
                        | (F.col("cont_b_in_a") >= threshold))
                .select("id_a", "id_b", "cont_a_in_b", "cont_b_in_a"))
    cand = _capped_candidates(sh, e, max_posting_size, threshold,
                              lambda ub: ub / F.least("na", "nb"))
    j, shared = _verified_pairs(cand, sh)
    return (j.withColumn("cont_a_in_b",
                         F.round(shared / F.col("sa.n_sh"), 6))
             .withColumn("cont_b_in_a",
                         F.round(shared / F.col("sb.n_sh"), 6))
             .filter((F.col("cont_a_in_b") >= threshold)
                     | (F.col("cont_b_in_a") >= threshold))
             .select("id_a", "id_b", "cont_a_in_b", "cont_b_in_a"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def release_sig_cache() -> None:
    """Unpersist the signature / candidate / candidate-shingle caches
    of the most recent ``minhash_lsh_pairs`` call (safe to call any
    time; a consumer that has already materialized its result loses
    nothing)."""
    from .util import release_caches
    release_caches("minhash_sig")
    release_caches("minhash_cand")
    release_caches("minhash_csh")


def _perm_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
            for _ in range(num_hashes)]


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       num_hashes: int = 64, n: int = 8,
                       seed: int = 42) -> DataFrame:
    """MinHash signature per document: (id, signature, n_sh).

    Shingle base-hashes stay JVM-side (one ``xxhash64`` pass, whole-stage
    codegen); the ``num_hashes`` universal-hash permutations
    ``min((a*h+b) mod p)`` run as ONE Arrow-batched Pandas UDF,
    vectorized ACROSS documents and computed one permutation at a time:
    the batch's base hashes concatenate into one flat vector, each
    permutation is one ``(flat*a + b) % p`` pass with per-doc minima
    from ``np.minimum.reduceat`` — peak temporaries are one flat-sized
    vector, never a (shingles x num_hashes) matrix (r15: the matrix
    form paid ~4 s of first-call page-fault cost per worker and was 4x
    slower steady; numbers in the UDF body).  With p = 2^31-1 every
    product fits int64, so the math is exact.

    Alternatives measured and rejected (r14): the equivalent
    higher-order-function expression tree is ~40x slower (lambda bodies
    interpreted per element per permutation); an explode + 64-way
    min-aggregate is ~1.7x slower and adds an exchange; a ``mapInArrow``
    form reading the Arrow list buffers zero-copy wins single-threaded
    (~1.8x — no per-doc ndarray materialization) but LOST the
    interleaved A/B at normal parallelism (llm03 steady 2.4 s -> 3.2 s:
    the extra passthrough columns and the map barrier cost more than
    the per-doc conversions it saves once partitions are small), so the
    pandas form stays.

    The shingle arrays themselves are streamed through the projection and
    never returned: at scale a persisted shingle column is a ~10x
    inflation of the corpus, so consumers that need shingles (the LSH
    verifier) recompute them for just the rows they touch."""
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    params = _perm_params(num_hashes, seed)
    a_vec = np.array([a for a, _b in params], dtype=np.int64)
    b_vec = np.array([b for _a, b in params], dtype=np.int64)
    p = _MERSENNE
    empty_sig = [int(p)] * num_hashes

    @F.pandas_udf(ArrayType(LongType()))
    def _perm_mins(base: pd.Series) -> pd.Series:
        # vectorized ACROSS documents (r14, guide §4.2), one PERMUTATION
        # at a time (r15): concatenate the batch's base hashes into one
        # flat vector, then for each of the num_hashes permutations run
        # (flat*a + b) % p over the whole batch and take per-doc minima
        # with np.minimum.reduceat.  The r14 form materialized the full
        # (shingles x num_hashes) int64 permutation matrix in 256k-
        # shingle chunks — measured (r15, single process, one llm03-
        # sized batch): 4.4 s on its FIRST call (~0.5 GB of fresh-page
        # mmap/fault traffic for the matrix + its 3 modular-arithmetic
        # temporaries, paid once per worker and the dominant term of
        # llm03's cold regression) and 0.43 s steady; this per-hash
        # column loop runs 0.11 s with NO first-call cliff — its
        # temporaries are one flat-sized vector (~2.5 MB here), cache-
        # resident instead of memory-bandwidth-bound.  The math is
        # unchanged and exact: (h*a + b) % p in int64 with h,a < p =
        # 2^31-1, so every product < 2^62.
        out = [None] * len(base)
        arrs, idxs, lens = [], [], []
        for i, arr in enumerate(base):
            if arr is None or len(arr) == 0:
                out[i] = empty_sig
            else:
                arrs.append(np.asarray(arr, dtype=np.int64))
                idxs.append(i)
                lens.append(len(arr))
        # doc-aligned chunks of ~4M shingles bound the per-hash
        # temporaries (~3 flat-sized int64 vectors, <= ~100 MB peak
        # per worker) independently of the Arrow batch size — the
        # memory-bound intent of the r14 256k-chunk review fix, kept
        # through the r15 per-hash rewrite.  A bench-sized batch
        # (~300k shingles) is a single chunk, so the fast path is
        # unchanged.
        pos = 0
        while pos < len(arrs):
            take, tot = 0, 0
            while pos + take < len(arrs) and (take == 0 or
                                              tot < 4_194_304):
                tot += lens[pos + take]
                take += 1
            flat = np.concatenate(arrs[pos:pos + take])
            starts = np.zeros(take, dtype=np.int64)
            np.cumsum(lens[pos:pos + take - 1] if take > 1 else [],
                      out=starts[1:])
            mins = np.empty((take, num_hashes), dtype=np.int64)
            for h in range(num_hashes):
                v = (flat * a_vec[h] + b_vec[h]) % p
                mins[:, h] = np.minimum.reduceat(v, starts)
            for j in range(take):
                out[idxs[pos + j]] = mins[j]
            pos += take
        return pd.Series(out)

    sh = char_shingles(F.col(text_col), n)
    df = spread_for_compute(df)
    prepped = df.select(
        F.col(id_col).alias("id"), sh.alias("__shingles")
    ).withColumn(
        "__base",
        F.transform("__shingles",
                    lambda s: F.pmod(F.xxhash64(s), F.lit(p))))
    return prepped.select("id", _perm_mins("__base").alias("signature"),
                          F.size("__shingles").alias("n_sh"))


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      num_hashes: int = 64, bands: int = 16,
                      n: int = 8, threshold: float = 0.8,
                      seed: int = 42,
                      max_bucket_size: int | None = None) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH, verified with exact
    Jaccard on the candidates.  bands=16 x rows=4 over 64 hashes targets
    ~(1/16)^(1/4) ≈ 0.5 similarity at 50% candidate probability — safely
    below a 0.8 threshold (near-certain recall there).

    ``max_bucket_size`` is the skew guard for the candidate self-join: a
    degenerate bucket of b identical documents contributes b^2/2 pairs,
    so one million-document duplicate cluster turns the join into a
    single 10^12-pair straggler.  Buckets larger than the cap are
    dropped (cluster members still pair through exact_dedup, which
    handles identical content in one hash-aggregate); every member of a
    capped bucket still participates via its other bands."""
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    # The signature frame has exactly ONE consumer in the uncapped
    # plan (the banding explode below — a linear chain), so persisting
    # it only adds an InMemoryRelation encode+write+read to the lone
    # pass (r14: measured as part of llm03's dominant middle stage).
    # Only the max_bucket_size path references `buckets` twice (the
    # over-cap aggregate + the anti-join probe), which would recompute
    # the Arrow-batched signature UDF without a persist — keep the
    # cache there.  The persist must outlive this (lazy) function, so
    # it is tracked in a cache-of-one: a repeat call evicts the
    # previous call's cache, and release_sig_cache() frees the last
    # one.  Only (id, signature) is ever persisted — a few hundred
    # bytes per doc; the shingle sets (a ~10x corpus inflation) are
    # recomputed below for the candidate rows only.
    from .util import cache_of_one, release_caches
    sig = (minhash_signatures(df, text_col, id_col, num_hashes, n, seed)
           .select("id", "signature"))
    if max_bucket_size is not None:
        sig = cache_of_one("minhash_sig", sig)
    else:
        # an earlier CAPPED call may have left its signature cache
        # under this tag; without this release an uncapped repeat call
        # would pin it for the rest of the session (r14 review).
        # Known mixed-usage caveat (r14 ADVICE, accepted): BUILDING an
        # uncapped plan evicts a previously built capped plan's cache
        # at plan-build time, so a capped plan materialized AFTERWARDS
        # recomputes its signature UDF once per consumer — correctness
        # unaffected (the UDF is deterministic); interleave
        # materialization with building, or re-call the capped form,
        # to restore the cache.
        release_caches("minhash_sig")

    band_arr = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.hash(F.slice("signature", i * r + 1, r)).alias("bh"))
        for i in range(bands)
    ])
    buckets = (sig.select("id", F.explode(band_arr).alias("b"))
                  .select("id", "b.band", "b.bh"))
    if max_bucket_size is not None:
        # one extra (band, bh) aggregate — partial-agg shuffle of counts,
        # not of members — then a broadcast-able small filter join.  The
        # guard runs BEFORE collect_list below so a degenerate bucket's
        # members are never gathered into one task's array.
        big = (buckets.groupBy("band", "bh")
                      .agg(F.count(F.lit(1)).alias("__bc"))
                      .filter(F.col("__bc") > max_bucket_size)
                      .select("band", "bh"))
        buckets = buckets.join(F.broadcast(big), ["band", "bh"],
                               "left_anti")
    # candidate pairs by gathering each bucket's members and expanding
    # the (i < j) pairs with higher-order functions — ONE shuffle of the
    # bucket rows, vs. the equivalent self-join's two shuffles (the join
    # re-shuffles the same lineage once per side).  Per-bucket arrays are
    # bounded by max_bucket_size when set; uncapped they are bounded by
    # the largest real duplicate cluster, the same bound the self-join's
    # output cardinality already carried.
    members = (buckets.groupBy("band", "bh")
                      .agg(F.collect_list("id").alias("ids"))
                      .filter(F.size("ids") >= 2))
    pair_arr = F.flatten(F.transform(
        "ids",
        lambda x: F.transform(
            F.filter("ids", lambda y: y > x),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")))))
    cand = (members.select(F.explode(pair_arr).alias("p"))
                   .select("p.id_a", "p.id_b")
                   .distinct())

    # verify candidates with exact Jaccard on full shingle arrays.
    # r13 shape: join the raw TEXT per side and shingle AFTER the join
    # — but Catalyst pushed the jaccard filter into the join condition
    # and re-derived the shingling expression there and in every
    # downstream projection, so each candidate pair re-shingled both
    # documents ~6x (measured in the r14 before-plan: the
    # array_distinct(transform(...)) subtree appears in the join
    # condition plus three Projects).  r14 shape (guide §4.4 family —
    # stop the optimizer duplicating expensive expressions): shingle
    # each candidate DOCUMENT exactly once, below the join, by
    # semi-joining the corpus to the candidate id set first.  The
    # jaccard filter still lands in the join condition, but it now
    # references the materialized shingle COLUMNS of the join inputs
    # (Catalyst never re-derives an expression through a join
    # boundary).  At scale this also drops one corpus scan: one
    # semi-joined scan computes both sides' shingles instead of two
    # per-side text joins.  cand and the shingled candidate docs are
    # tiny by construction (LSH candidates), so the cache-of-one
    # persists are bounded.
    cand = cache_of_one("minhash_cand", cand)
    # one explode instead of a two-branch union + distinct: the id set
    # is the same, the plan subtree is half the size (r15, guide §1.2 —
    # plan weight is cold-start cost: codegen/JIT of every subtree)
    ids = (cand.select(F.explode(F.array("id_a", "id_b")).alias("id"))
               .distinct())
    # the candidate-doc shingle pass: spread the scan (so the shingle
    # projection is not serialized onto the one task a one-row-group
    # file gives it — measured r14: 0.8 s serial CPU; at 100 TB the
    # scan is already parallel and the spread is a no-op), semi-join
    # down to candidate docs, shingle the survivors once.  NO broadcast
    # hint on the id set: banded LSH candidates are usually tiny and
    # AQE picks the broadcast join from the real materialized size,
    # but a duplicate-heavy corpus can produce a candidate set past
    # the 8 GB broadcast cap — forcing the hint there fails the job
    # where a shuffle semi join is the correct plan (r14 review).
    csh = (spread_for_compute(
               df.select(F.col(id_col).alias("id"),
                         F.col(text_col).alias("t")))
             .join(ids, "id", "left_semi")
             .select("id", char_shingles(F.col("t"), n).alias("sh"))
             .withColumn("n_sh", F.size("sh")))
    csh = cache_of_one("minhash_csh", csh)
    shared = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
    verified = (cand
                .join(csh.alias("sa"), F.col("id_a") == F.col("sa.id"))
                .join(csh.alias("sb"), F.col("id_b") == F.col("sb.id"))
                .withColumn("jaccard", F.round(
                    shared / (F.col("sa.n_sh") + F.col("sb.n_sh")
                              - shared), 6))
                .filter(F.col("jaccard") >= threshold))
    return verified.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# duplicate clustering (transitive closure of pair output)
# ---------------------------------------------------------------------------

def dup_clusters(pairs: DataFrame, id_a: str = "id_a",
                 id_b: str = "id_b", max_iter: int = 25) -> DataFrame:
    """Connected components over near-duplicate pairs: returns
    (id, cluster_id) for every id appearing in ``pairs``, where
    cluster_id is the minimum id of the component — the canonical
    "keep one representative per duplicate cluster" step after any
    pairwise dedup (A~B and B~C must collapse to ONE cluster even when
    A~C was never emitted).

    Implementation: iterative min-label propagation — each round is one
    equi-join (labels onto edges) plus a min-aggregate, all JVM-side;
    rounds needed = component diameter, which for duplicate clusters is
    tiny.  Each round's result is persisted and the previous round
    freed, so the lineage stays O(1) instead of growing per iteration
    (at 100 TB this would be the difference between a stable job and a
    stack-overflowing 25-deep plan).  Convergence is detected with a
    monotone sum(label) fingerprint: one cheap action per round."""
    e = pairs.select(F.col(id_a).cast("long").alias("src"),
                     F.col(id_b).cast("long").alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()

    labels = (edges.select(F.col("src").alias("id")).distinct()
                   .withColumn("label", F.col("id")).persist())
    prev_sum = labels.agg(F.sum("label")).first()[0]

    for _ in range(max_iter):
        nbr_min = (edges.join(labels,
                              edges["dst"] == labels["id"])
                        .groupBy("src")
                        .agg(F.min("label").alias("nbr_label")))
        new_labels = (labels.join(nbr_min,
                                  labels["id"] == nbr_min["src"],
                                  "left")
                      .select(labels["id"],
                              F.least(labels["label"],
                                      F.coalesce(F.col("nbr_label"),
                                                 labels["label"]))
                              .alias("label"))
                      .persist())
        cur_sum = new_labels.agg(F.sum("label")).first()[0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    # the final labels must stay cached for the caller's consumption,
    # but not for the lifetime of the session: cache-of-one (so repeated
    # clustering calls don't accumulate storage memory), materialized
    # while the last round is still cached, then the round cache freed
    from .util import cache_of_one
    out = cache_of_one(
        "dup_clusters",
        labels.select(F.col("id"), F.col("label").alias("cluster_id")))
    out.count()
    labels.unpersist()
    return out


def dedup_survivors(df: DataFrame, pairs: DataFrame, id_col: str,
                    id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """The corpus that actually ships to training: every document that
    appears in no near-dup pair, plus ONE deterministic representative
    (the minimum id) per duplicate cluster.

    Composes dup_clusters (min-label propagation) with two bounded
    steps: a per-cluster min aggregate (output = one row per cluster)
    and a broadcast-able anti-join of the cluster membership against
    the corpus — both shuffles are keyed on the pair-participant set,
    which is tiny relative to the corpus whenever dedup is worth
    running."""
    clusters = dup_clusters(pairs, id_a, id_b)           # (id, cluster_id)
    reps = (clusters.groupBy("cluster_id")
                    .agg(F.min("id").alias("id")).select("id"))
    paired = clusters.select("id")
    ids = df.select(F.col(id_col).alias("id"))
    survivors = ids.join(paired, "id", "left_anti").unionByName(reps)
    return df.join(survivors.withColumnRenamed("id", id_col),
                   id_col)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def md5_token_hash(t: Column) -> Column:
    """Cross-engine 60-bit token hash: decimal value of the first 15 hex
    chars of md5.  Slower than xxhash64 but bit-identical to
    ``CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)`` in DuckDB —
    lets the full simhash pipeline be value-oracled (the llm26/llm27
    companion pattern).  The four missing top bits only shrink the
    hash space; every downstream lane/chunk/hamming step is unchanged."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def simhash_64(df: DataFrame, text_col: str, id_col: str,
               token_hash=None) -> DataFrame:
    """64-bit SimHash per document.  Token hashes computed JVM-side
    (xxhash64 by default; pass ``token_hash`` for a custom Column->Column
    hash, e.g. md5_token_hash for cross-engine verification), the
    64-lane sign fold runs in one Arrow-batched Pandas UDF (numpy bit
    matrix) — the classic case where a vectorized UDF beats 64 separate
    JVM aggregates."""
    from pyspark.sql.functions import pandas_udf

    if token_hash is None:
        token_hash = lambda t: F.xxhash64(t)  # noqa: E731
    tokens = F.split(normalized(F.col(text_col)), " ")
    hashes = F.transform(tokens, token_hash)

    @pandas_udf("long")
    def fold(hs: pd.Series) -> pd.Series:
        import numpy as np
        # vectorized ACROSS documents (r14, guide §4.2 — the minhash
        # reduceat recipe), one LANE at a time (r15): flatten the
        # batch's token hashes, then for each of the 64 lanes extract
        # that bit column over the whole batch and count per-doc ones
        # via np.add.reduceat; pack sign bits with a single matmul
        # against the lane powers.  The r14 form materialized the full
        # (tokens x 64) bit matrix in 256k-token chunks — measured
        # (r15, one batch, single process): 0.27 s first call / 0.05 s
        # steady vs 0.01 s here with no first-call page-fault cliff
        # (the same alloc-bound profile as the minhash matrix, see
        # _perm_mins).  Lane counts accumulate in int64 (r14 ADVICE:
        # the int32 reduceat overflowed in theory for >= 2^31-token
        # docs).  All-integer ops — bit-identical.
        out = np.zeros(len(hs), dtype=np.int64)
        arrs, idxs, lens = [], [], []
        for i, arr in enumerate(hs):
            if arr is not None and len(arr) > 0:
                arrs.append(np.asarray(arr, dtype=np.int64))
                idxs.append(i)
                lens.append(len(arr))
        if not arrs:
            return pd.Series(out)
        lanes = np.arange(64, dtype=np.uint64)
        powers = (np.uint64(1) << lanes).astype(np.uint64)
        one = np.uint64(1)
        # same ~4M-token doc-aligned chunking as the minhash fold:
        # bounds the per-lane temporaries (~2 flat-sized vectors)
        # regardless of the Arrow batch size (r15 review)
        pos = 0
        while pos < len(arrs):
            take, tot = 0, 0
            while pos + take < len(arrs) and (take == 0 or
                                              tot < 4_194_304):
                tot += lens[pos + take]
                take += 1
            flat = np.concatenate(arrs[pos:pos + take]).astype(np.uint64)
            starts = np.zeros(take, dtype=np.int64)
            np.cumsum(lens[pos:pos + take - 1] if take > 1 else [],
                      out=starts[1:])
            ones = np.empty((take, 64), dtype=np.int64)
            for lane in range(64):
                b = ((flat >> np.uint64(lane)) & one).astype(np.int64)
                ones[:, lane] = np.add.reduceat(b, starts)
            cnt = np.asarray(lens[pos:pos + take],
                             dtype=np.int64)[:, None]
            votes = 2 * ones - cnt            # sum of (2*bit - 1)
            sims = ((votes > 0).astype(np.uint64) @ powers) \
                .astype(np.uint64)
            for j in range(take):
                out[idxs[pos + j]] = np.int64(sims[j])
            pos += take
        return pd.Series(out)

    return spread_for_compute(df).select(F.col(id_col).alias("id"),
                                         fold(hashes).alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  max_hamming: int = 3, token_hash=None) -> DataFrame:
    """Near-duplicate pairs: hamming(simhash_a, simhash_b) <= k.
    Candidate generation by exact match on one of four 16-bit chunks
    (pigeonhole: any pair with hamming <= 3 agrees on >= 1 chunk),
    verified with JVM ``bit_count(a ^ b)``.  Given the hash function,
    the output is EXACT (pigeonhole candidates are complete, the
    hamming filter is exact) — so with ``token_hash=md5_token_hash``
    the whole pipeline value-oracles against an independent SQL
    implementation."""
    sh = simhash_64(df, text_col, id_col, token_hash=token_hash)
    chunks = F.array(*[
        F.struct(F.lit(i).alias("chunk"),
                 F.shiftrightunsigned("simhash", 16 * i)
                  .bitwiseAND(F.lit(0xFFFF)).alias("cv"))
        for i in range(4)
    ])
    b = sh.select("id", "simhash", F.explode(chunks).alias("c")) \
          .select("id", "simhash", "c.chunk", "c.cv")
    x, y = b.alias("x"), b.alias("y")
    cand = (x.join(y, (F.col("x.chunk") == F.col("y.chunk")) &
                   (F.col("x.cv") == F.col("y.cv")) &
                   (F.col("x.id") < F.col("y.id")))
            .select(F.col("x.id").alias("id_a"),
                    F.col("y.id").alias("id_b"),
                    F.col("x.simhash").alias("ha"),
                    F.col("y.simhash").alias("hb"))
            .distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.withColumn("hamming", ham)
                .filter(F.col("hamming") <= max_hamming)
                .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns, JVM-side:
    zip_with product + aggregate sum (whole-stage codegen)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def embedding_dup_pairs(df: DataFrame, vec_col: str, id_col: str,
                        threshold: float = 0.95) -> DataFrame:
    """Embedding near-duplicates: all pairs with cosine >= threshold.
    Brute-force O(n^2) — correct baseline and the verifier for
    embedding_dup_pairs_lsh (the scale path)."""
    v = spread_for_compute(df).select(F.col(id_col).alias("id"),
                                      F.col(vec_col).alias("v"))
    a, b = v.alias("a"), v.alias("b")
    cos = cosine_sim(F.col("a.v"), F.col("b.v"))
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.round(cos, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def embedding_dup_pairs_lsh(df: DataFrame, vec_col: str, id_col: str,
                            threshold: float = 0.95, planes: int = 8,
                            tables: int = 4) -> DataFrame:
    """Embedding near-duplicates at scale: random-hyperplane LSH with
    ``tables`` independent hash tables.

    Candidates = pairs sharing a bucket in ANY table (equi-join on
    (table, bucket) — a shuffle bounded by bucket sizes, never
    all-pairs); exact cosine verifies candidates, so precision is exact
    and only recall is approximate:

        recall = 1 - (1 - (1 - acos(s)/pi)^planes)^tables

    Tune to the threshold: tight dedup (s >= 0.9, per-plane p ~ 0.9)
    supports planes=8/tables=4+; loose thresholds (s ~ 0.4, p ~ 0.63)
    need few planes and more tables (e.g. planes=3/tables=12 -> ~95%).
    More tables buy recall at linear cost; more planes shrink buckets
    (cheaper join) but cut per-table recall."""
    v = spread_for_compute(df).select(F.col(id_col).alias("id"),
                                      F.col(vec_col).alias("v"))
    table_arr = F.array(*[
        F.struct(F.lit(t).alias("t"),
                 _table_sign_bits(F.col("v"), planes, t).alias("b"))
        for t in range(tables)
    ])
    buckets = (v.select("id", F.explode(table_arr).alias("tb"))
                .select("id", "tb.t", "tb.b"))
    x, y = buckets.alias("x"), buckets.alias("y")
    cand = (x.join(y, (F.col("x.t") == F.col("y.t")) &
                      (F.col("x.b") == F.col("y.b")) &
                      (F.col("x.id") < F.col("y.id")))
            .select(F.col("x.id").alias("id_a"),
                    F.col("y.id").alias("id_b"))
            .distinct())
    a = v.alias("va")
    b = v.alias("vb")
    cos = cosine_sim(F.col("va.v"), F.col("vb.v"))
    return (cand.join(a, F.col("id_a") == F.col("va.id"))
                .join(b, F.col("id_b") == F.col("vb.id"))
                .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
                .filter(F.col("cosine") >= threshold))


def _table_sign_bits(vec: Column, planes: int,
                     table: int) -> Column:
    """Sign-bit bucket for one LSH table; hyperplanes are derived from
    xxhash64(table, plane, component) — deterministic, JVM-side, sized
    per row from ``size(vec)`` (r15: replaces a dim probed with an
    eager ``.first()`` driver job at plan-build; identical component
    values for a uniform-dim corpus)."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        plane = F.transform(
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda j: (F.xxhash64(F.lit(table), F.lit(p), j)
                       % F.lit(10**6)).cast("double") / F.lit(5 * 10**5))
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda xx, h: xx.cast("double") * h),
            F.lit(0.0), lambda acc, val: acc + val)
        bucket = bucket + F.when(dot > 0,
                                 F.lit(1 << p).cast("long")).otherwise(0)
    return bucket


# ---------------------------------------------------------------------------
# corpus-level line dedup (RefinedWeb / FineWeb "line dedup" stage)
# ---------------------------------------------------------------------------

def line_dedup(df: DataFrame, text_col: str, id_col: str,
               sep: str = "\n") -> DataFrame:
    """Corpus-wide exact line dedup (the RefinedWeb / FineWeb line-level
    stage, Penedo et al. 2023/2024): every distinct non-empty line
    survives only at its FIRST occurrence — minimal (doc id, line
    index) — across the WHOLE corpus; later copies (boilerplate,
    navigation chrome, license blurbs) are removed.  Empty lines are
    structural and always kept.  Returns
    (id, clean_text, n_lines, n_kept) with surviving lines rejoined in
    original order.

    Scale shape: the winner-per-line aggregation keys on a 128-bit
    line fingerprint (two xxhash64 passes, the exact_dedup premise) so
    the shuffle moves 16-byte keys + one min-struct per distinct line
    instead of a corpus of text, and min() partial-aggregates
    map-side — a boilerplate line in a billion documents contributes
    ONE row per map task, which is what makes the hot-key profile of
    real web corpora survivable without salting.  Reassembly is a
    second keyed agg on doc id (never skewed: a doc has bounded
    lines).  Two shuffles total, both partial-agg'd."""
    t = F.col(text_col)
    import re as _re
    lines = F.split(t, _re.escape(sep), -1)
    base = df.select(F.col(id_col).alias("id"), lines.alias("__lines"))
    ex = base.select(
        "id", F.posexplode("__lines").alias("idx", "line"))
    content = ex.filter(F.col("line") != "")
    blanks = ex.filter(F.col("line") == "")
    winners = (content
               .groupBy(F.xxhash64("line").alias("__h1"),
                        F.xxhash64("line", F.lit(1)).alias("__h2"))
               .agg(F.min(F.struct("id", "idx", "line")).alias("__w"))
               .select(F.col("__w.id").alias("id"),
                       F.col("__w.idx").alias("idx"),
                       F.col("__w.line").alias("line")))
    kept = winners.unionByName(blanks)
    joined = (kept.groupBy("id")
                  .agg(F.array_sort(F.collect_list(F.struct("idx", "line")))
                        .alias("__k")))
    return (base.select("id", F.size("__lines").alias("n_lines"))
                .join(joined, "id", "left")
                .select("id",
                        F.coalesce(
                            F.array_join(F.transform(
                                "__k", lambda s: s["line"]), sep),
                            F.lit("")).alias("clean_text"),
                        "n_lines",
                        F.coalesce(F.size("__k"), F.lit(0))
                         .alias("n_kept")))


def soft_dedup(df: DataFrame, text_col: str, id_col: str,
               seed: int = 42, id_hash=None) -> DataFrame:
    """Frequency-proportional downsampling ("soft dedup", the CCNet /
    C4 head-tail idea applied at document granularity): a document in
    an exact-duplicate group of size c survives with probability
    ~1/c, so each group contributes ~1 expected copy while the choice
    stays independent per document — no winner-election aggregation,
    no group materialization: the decision is a pure function of
    (id hash, group size), so a group's survivors never depend on
    WHICH other ids share the group (unlike min-id survivor picks,
    where inserting a smaller id flips the previous winner).

    Keep rule: ``u * c < 2^60`` where u is the document's 60-bit
    seeded id hash (uniform on [0, 2^60)) and c the group size — i.e.
    exactly ``u/2^60 < 1/c``.  The product is computed in
    decimal(38,0) (HUGEINT on the DuckDB side) because it overflows
    int64 for c > 8; decimal integer math is exact in both engines,
    so with the md5 id hash every comparison is bit-identical in
    DuckDB (llm68 oracle).

    Returns (id, dup_count, kept) for every document.  Scale: one
    window count keyed on the normalized-text fingerprint (hot groups
    partial-aggregate if rewritten as groupBy-join; window keeps the
    row count intact which the keep-decision needs anyway), then a
    stateless per-row compare.  Cites reference scope: the reference
    (kduy/Flink-DSL) has no curation surface; this extends the dedup
    family (exact_dedup, `dedup.py:72`)."""
    from pyspark.sql import Window

    if id_hash is None:
        # xxhash64 is SIGNED 64-bit; the keep rule needs u uniform on
        # [0, 2^60), so mask to the low 60 bits (a raw signed default
        # would keep every negative-hash doc unconditionally and
        # positive-hash docs only ~2^-3/c of the time).
        id_hash = lambda c, s: (  # noqa: E731
            F.xxhash64(c, F.lit(s)).bitwiseAND(F.lit((1 << 60) - 1)))
    norm = normalized(F.col(text_col))
    w = Window.partitionBy(F.xxhash64(norm), F.xxhash64(norm, F.lit(1)))
    cnt = F.count(F.lit(1)).over(w)
    u = id_hash(F.col(id_col), seed)
    keep = (u.cast("decimal(38,0)") * cnt) < F.lit(1 << 60)
    return (df.select(F.col(id_col).alias("id"),
                      cnt.alias("dup_count"),
                      keep.alias("kept"))
              .orderBy("id"))


# ---------------------------------------------------------------------------
# cross-document duplicate-span detection (exact-substring dedup signal)
# ---------------------------------------------------------------------------

def duplicate_spans(df: DataFrame, text_col: str, id_col: str,
                    span: int = 64, anchor: int = 8,
                    density: int = 16, min_docs: int = 2,
                    anchor_hash=None) -> DataFrame:
    """Cross-document duplicate-span detection — the detection half of
    exact substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"), reshaped from suffix arrays
    (inherently sequential, machine-sized) to a shuffle-friendly
    winnowing form (Schleimer et al. 2002): a position is an ANCHOR
    when the hash of its ``anchor``-char prefix is 0 mod ``density``
    — a pure function of local content, so a verbatim block shared by
    two documents anchors at the SAME interior offsets no matter
    where the block sits in each document (a fixed-stride grid would
    only match blocks whose offsets happen to agree mod stride).
    Each anchored ``span``-char window is fingerprinted, and spans
    occurring in >= ``min_docs`` distinct documents are counted.
    Returns (id, n_spans, n_dup_spans, dup_frac); expected span
    density is one per ``density`` chars, and a shared block of B
    chars goes undetected with odds ~(1-1/density)^(B-span), i.e.
    vanishing for blocks a few spans long.

    Scale shape: anchor selection + span extraction is one
    higher-order-function projection (one 8-char hash per position —
    the inherent winnowing cost, all JVM-side, no UDF); the cross-doc
    occurrence count groups on a 64-bit xxhash of the span so the
    shuffle moves 8-byte keys, never substrings, with two-phase
    count(distinct doc); flagged keys join back on the same hashed
    key (AQE handles hot boilerplate keys).  Driver sees nothing.
    ``anchor_hash``: Column -> integral Column for anchor selection;
    defaults to xxhash64, with dedup.md5_token_hash as the
    cross-engine-reproducible (oracle) alternative."""
    if density < 1 or span < 1 or anchor < 1:
        raise ValueError("span, anchor and density must be >= 1")
    if anchor_hash is None:
        anchor_hash = F.xxhash64
    t = F.col(text_col)
    ln = F.length(t)
    idx = F.when(ln >= span,
                 F.sequence(F.lit(1), ln - F.lit(span - 1))
                 ).otherwise(F.array().cast("array<int>"))
    offs = F.filter(
        idx,
        lambda i: F.pmod(anchor_hash(F.substring(t, i, anchor)),
                         F.lit(density)) == 0)
    base = df.select(F.col(id_col).alias("id"), t.alias("__t"),
                     F.size(offs).alias("n_spans"), offs.alias("__offs"))
    spans = (spread_for_compute(base)
             .select("id", F.explode("__offs").alias("off"),
                     F.col("__t"))
             .select("id",
                     F.xxhash64(F.substring(F.col("__t"),
                                            F.col("off"), span))
                      .alias("__k")))
    dup_keys = (spans.groupBy("__k")
                     .agg(F.count_distinct("id").alias("__nd"))
                     .filter(F.col("__nd") >= min_docs)
                     .select("__k"))
    per_doc = (spans.join(dup_keys, "__k")
                    .groupBy("id")
                    .agg(F.count(F.lit(1)).alias("n_dup_spans")))
    return (base.select("id", "n_spans")
                .join(per_doc, "id", "left")
                .select("id", "n_spans",
                        F.coalesce("n_dup_spans", F.lit(0))
                         .alias("n_dup_spans"))
                .withColumn("dup_frac",
                            F.when(F.col("n_spans") > 0,
                                   F.col("n_dup_spans") /
                                   F.col("n_spans"))))


# ---------------------------------------------------------------------------
# cross-corpus near-dedup (new data vs an existing training corpus)
# ---------------------------------------------------------------------------

def cross_corpus_dup_pairs(df: DataFrame, ref: DataFrame,
                           text_col: str, id_col: str,
                           ref_text_col: str | None = None,
                           ref_id_col: str | None = None,
                           n: int = 8, threshold: float = 0.8,
                           max_posting_size: int | None = None
                           ) -> DataFrame:
    """Near-duplicate pairs BETWEEN two corpora (id_a from ``df``, id_b
    from ``ref``) with char-n-gram Jaccard >= threshold — the "is this
    new crawl already in the training set" primitive.  Same
    inverted-index + count-aggregate design as ngram_jaccard_pairs
    (the score comes from the shared-shingle count, never per-pair
    array scans over the candidate set), with the asymmetric join in
    place of the self-join.

    ``max_posting_size`` is the same straggler guard: postings counted
    across BOTH sides, over-cap shingles dropped before the join, a
    sound upper bound — true shared <= kept shared + min(capped_a,
    capped_b) — prunes candidates, and survivors verify exactly on
    their full shingle arrays.  Uncapped, results are exhaustively
    exact.  At 100 TB run this with the cap on (boilerplate shared by
    both corpora is the dominant skew source), or band the signatures
    first (minhash_lsh_pairs' shape) and use this as the verifier."""
    ref_text_col = ref_text_col or text_col
    ref_id_col = ref_id_col or id_col

    def shingled(frame, tcol, icol):
        return (spread_for_compute(frame)
                .select(F.col(icol).alias("id"),
                        char_shingles(F.col(tcol), n).alias("sh"))
                .withColumn("n_sh", F.size("sh")))

    sa = shingled(df, text_col, id_col)
    sb = shingled(ref, ref_text_col, ref_id_col)
    ea = sa.select("id", F.explode("sh").alias("s"))
    eb = sb.select("id", F.explode("sh").alias("s"))

    if max_posting_size is not None:
        big = (ea.select("s").unionAll(eb.select("s"))
                 .groupBy("s")
                 .agg(F.count(F.lit(1)).alias("__pc"))
                 .filter(F.col("__pc") > max_posting_size)
                 .select("s"))
        ka = ea.join(F.broadcast(big), "s", "left_anti")
        kb = eb.join(F.broadcast(big), "s", "left_anti")
    else:
        ka, kb = ea, eb

    pairs = (ka.alias("a")
             .join(kb.alias("b"), F.col("a.s") == F.col("b.s"))
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("shared_kept")))
    pairs = (pairs
             .join(sa.select(F.col("id").alias("id_a"),
                             F.col("n_sh").alias("na")), "id_a")
             .join(sb.select(F.col("id").alias("id_b"),
                             F.col("n_sh").alias("nb")), "id_b"))
    if max_posting_size is None:
        jac = F.col("shared_kept") / (F.col("na") + F.col("nb")
                                      - F.col("shared_kept"))
        return (pairs.withColumn("jaccard", F.round(jac, 6))
                     .filter(F.col("jaccard") >= threshold)
                     .select("id_a", "id_b", "jaccard"))
    nka = ka.groupBy("id").agg(F.count(F.lit(1)).alias("nk"))
    nkb = kb.groupBy("id").agg(F.count(F.lit(1)).alias("nk"))
    pairs = (pairs
             .join(nka.select(F.col("id").alias("id_a"),
                              F.col("nk").alias("nka")), "id_a", "left")
             .join(nkb.select(F.col("id").alias("id_b"),
                              F.col("nk").alias("nkb")), "id_b", "left")
             .withColumn("ca", F.col("na") - F.coalesce("nka", F.lit(0)))
             .withColumn("cb", F.col("nb") - F.coalesce("nkb", F.lit(0))))
    ub_shared = F.col("shared_kept") + F.least("ca", "cb")
    ub_j = ub_shared / (F.col("na") + F.col("nb") - ub_shared)
    cand = pairs.filter(ub_j >= threshold).select("id_a", "id_b")
    return (cand
            .join(sa.alias("xa"), F.col("id_a") == F.col("xa.id"))
            .join(sb.alias("xb"), F.col("id_b") == F.col("xb.id"))
            .withColumn("shared", F.size(F.array_intersect(
                F.col("xa.sh"), F.col("xb.sh"))))
            .withColumn("jaccard", F.round(
                F.col("shared") /
                (F.col("xa.n_sh") + F.col("xb.n_sh") - F.col("shared")),
                6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def dedup_against(df: DataFrame, ref: DataFrame,
                  text_col: str, id_col: str,
                  ref_text_col: str | None = None,
                  ref_id_col: str | None = None,
                  n: int = 8, threshold: float = 0.8,
                  max_posting_size: int | None = None) -> DataFrame:
    """Rows of ``df`` with NO near-duplicate in ``ref`` — dedup the new
    corpus against the existing one.  One anti-join over the
    cross-corpus pair list; ``df`` itself is never internally deduped
    (compose with exact_dedup / dedup_survivors for that)."""
    pairs = cross_corpus_dup_pairs(
        df, ref, text_col, id_col, ref_text_col, ref_id_col,
        n=n, threshold=threshold, max_posting_size=max_posting_size)
    hit = pairs.select(F.col("id_a").alias(id_col)).distinct()
    return df.join(hit, id_col, "left_anti")
