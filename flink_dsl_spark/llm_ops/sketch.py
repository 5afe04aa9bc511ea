"""Mergeable frequency sketches for the 100 TB path.

The exact corpus-frequency table (``groupBy(token).count()``) shuffles
one row per distinct (task, token) — fine when the vocabulary fits the
shuffle, which it does for word tokens but not for URLs, hashes, or
n-gram keys with billion-scale universes.  Misra-Gries summaries bound
the shuffle at ``partitions * capacity`` rows REGARDLESS of the key
universe, with the classic deterministic guarantee (no randomness, no
failure probability): a summary of capacity m undercounts any key by
at most N_p/(m+1) of its partition's stream, errors add under merging,
and every key with true count above the summed bound is guaranteed to
survive.  Summaries are mergeable by plain count-sum, so the merge is
an ordinary partial-aggregated Spark shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_token_hash
from .textstats import _word_ngrams, _ws_tokens
from .util import spread_for_compute


def _mg_summarize(capacity: int):
    """Per-partition Misra-Gries fold as a mapInPandas generator.
    Decrement-all is amortized O(1) per stream element: each
    over-capacity arrival spends O(m) but retires m units of
    accumulated count, and at most N total units ever accumulate."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            for tok in pdf["tok"].values:
                if tok in counts:
                    counts[tok] += 1
                elif len(counts) < capacity:
                    counts[tok] = 1
                else:
                    dead = []
                    for key in counts:
                        counts[key] -= 1
                        if counts[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counts[key]
        if counts:
            yield pd.DataFrame({"tok": list(counts.keys()),
                                "cnt": list(counts.values())})
    return gen


def heavy_hitters(df: DataFrame, text_col: str, capacity: int = 4096,
                  k: int = 20) -> DataFrame:
    """Top-``k`` heavy-hitter tokens of the normalized token stream via
    merged per-partition Misra-Gries summaries.  Returns
    (tok, est_cnt) in the deterministic (count desc, tok asc) total
    order; ``est_cnt`` is a lower bound on the true count and exact
    whenever no partition ever exceeded ``capacity`` distinct live
    keys.

    ``capacity >= corpus vocabulary`` therefore degenerates to the
    exact frequency table — that is the DuckDB-oracled configuration
    (llm61); production uses a small capacity precisely when the exact
    table's full-universe shuffle is the thing being avoided.

    Scale shape: tokens explode narrowly (no shuffle), each partition
    folds its stream into <= capacity rows in one Arrow pass, and only
    those summary rows shuffle into the count-sum merge; the ``k``-cut
    is TakeOrderedAndProject on the merged table."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    toks = F.filter(_ws_tokens(F.col(text_col)), lambda t: t != "")
    ex = spread_for_compute(df).select(F.explode(toks).alias("tok"))
    summ = ex.mapInPandas(_mg_summarize(capacity), "tok string, cnt long")
    merged = summ.groupBy("tok").agg(F.sum("cnt").alias("est_cnt"))
    return merged.orderBy(F.col("est_cnt").desc(), "tok").limit(k)


# Cross-engine 60-bit hash: one definition, one documented premise
# (see dedup.md5_token_hash) — keep the sketch family on the same
# helper so the Spark≡DuckDB hash contract can't drift between files.
_md5_hash60 = md5_token_hash


def hll_registers(df: DataFrame, text_col: str, p: int = 9) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) over the normalized
    token stream: ``(bucket, max_rho)`` where bucket is the low ``p``
    bits of the 60-bit token hash and rho the 1-based position of the
    leftmost set bit in the remaining ``60-p``-bit field (``60-p+1``
    when the field is zero).  Returns at most ``2^p`` integer rows in
    bucket order; the cardinality estimate is the standard
    ``alpha_m * m^2 / sum(2^-rho)`` fold over them (driver-side or in
    the pytest harness — kept OUT of this frame so every emitted value
    is an integer and the whole sketch is exactly DuckDB-oracled).

    Why this is the 100 TB cardinality path: counting distinct tokens
    exactly shuffles one row per distinct (task, token) — for n-gram /
    URL universes that IS the bottleneck.  HLL needs no distinct: rho
    is duplicate-insensitive, so each partition folds its whole stream
    map-side into <= 2^p (bucket, max) rows and only those shuffle.
    Registers merge by plain max, so sketches of shards/days union for
    free.  rho uses ``length(bin(w))`` — integer bit-length, identical
    in Spark (Long.toBinaryString) and DuckDB (bin(BIGINT)) — never
    floating log2, whose boundary rounding could diverge."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    field = 60 - p
    toks = F.filter(_ws_tokens(F.col(text_col)), lambda t: t != "")
    ex = spread_for_compute(df).select(F.explode(toks).alias("tok"))
    h = _md5_hash60(F.col("tok"))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(field + 1)).otherwise(
        F.lit(field + 1) - F.length(F.bin(w)))
    hashed = ex.select(
        h.bitwiseAND(F.lit((1 << p) - 1)).alias("bucket"),
        rho.cast("int").alias("rho"))
    return (hashed.groupBy("bucket")
                  .agg(F.max("rho").alias("max_rho"))
                  .orderBy("bucket"))


def hll_estimate(registers, p: int) -> float:
    """Driver-side HLL fold of ``hll_registers`` output (list of
    (bucket, max_rho) rows): the classic raw estimate with the
    small-range linear-counting correction.  Lives outside the
    DataFrame on purpose — the oracled artifact is the integer
    register table; this fold is O(2^p) trivia."""
    m = 1 << p
    filled = {int(b): int(r) for b, r in registers}
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else \
        {16: 0.673, 32: 0.697, 64: 0.709}[m]
    s = sum(2.0 ** -filled.get(j, 0) for j in range(m))
    raw = alpha * m * m / s
    zeros = m - len(filled)
    if raw <= 2.5 * m and zeros:
        import math
        return m * math.log(m / zeros)
    return raw


def cms_counts(df: DataFrame, text_col: str, depth: int = 4,
               width: int = 1024) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of the
    normalized token stream: a ``depth x width`` integer count matrix
    as (row, col, cnt) rows, cells in (row, col) order, zero cells
    absent.  Row r's column for token t is ``(h1 + r*h2) mod width``
    (double hashing — h2 from a salted md5, so the rows are
    independent without per-row string salts on the hot path).
    Point estimate for t = min over rows of its cell, always >= the
    true count; with the default 4x1024 the expected overestimate is
    eps*N with eps = e/width.

    Scale shape: the token stream maps to (row, col) pairs and
    partial-aggregates map-side into <= depth*width cells per
    partition — the shuffle is bounded by the GRID, not the
    vocabulary, and sketches of different shards merge by cell-sum.
    Every value is an integer; h1, h2 < 2^60 and r < depth <= 8 keep
    ``h1 + r*h2 < 2^63``, so the arithmetic is overflow-free and
    bit-identical in DuckDB (the llm65 oracle)."""
    if not 1 <= depth <= 8:
        raise ValueError("depth must be in [1, 8]")
    if not 1 <= width <= (1 << 31):
        # lower bound: mod-0 is undefined; upper: cols are cast to int
        raise ValueError("width must be in [1, 2^31]")
    toks = F.filter(_ws_tokens(F.col(text_col)), lambda t: t != "")
    ex = spread_for_compute(df).select(F.explode(toks).alias("tok"))
    h1 = _md5_hash60(F.col("tok"))
    h2 = _md5_hash60(F.concat(F.lit("cms:"), F.col("tok")))
    cells = F.array(*[
        F.struct(F.lit(r).alias("row"),
                 ((h1 + F.lit(r) * h2) % width).cast("int").alias("col"))
        for r in range(depth)])
    return (ex.select(F.explode(cells).alias("c"))
              .groupBy(F.col("c.row").alias("row"),
                       F.col("c.col").alias("col"))
              .agg(F.count(F.lit(1)).alias("cnt"))
              .orderBy("row", "col"))


def bloom_bitmap(ref: DataFrame, text_col: str, n: int = 13,
                 m_bits: int = 1 << 20, k: int = 4) -> DataFrame:
    """Bloom filter over a reference set's distinct word ``n``-grams as
    a bitmap of 32-bit words: (word, bits) with word = bit_index >> 5
    and bits the OR of ``1 << (bit_index & 31)`` masks.  Gram g sets
    bits ``(h1 + i*h2) mod m_bits`` for i in 0..k-1 (standard double
    hashing, Kirsch & Mitzenmacher 2008).

    32-bit words, not 64: DuckDB's ``<<`` on BIGINT is
    overflow-checked, so ``1 << 63`` errors there while Java wraps —
    masks up to ``1 << 31`` are the widest cross-engine-safe choice,
    and the bitmap is the same m_bits either way.  No distinct pass:
    bit_or is idempotent, so duplicate grams cost nothing and the
    aggregation partial-combines map-side to <= m_bits/32 rows — the
    full m_bits=2^20 bitmap is 32K rows / ~128 KB, a broadcast."""
    if not 1 <= k <= 8:
        # i*h2 with h2 < 2^60 stays under 2^63 only for i <= 7
        raise ValueError("k must be in [1, 8]")
    if m_bits < 32:
        # bitmap words are 32-bit; fewer bits than one word is a
        # misconfiguration, not a smaller filter
        raise ValueError("m_bits must be >= 32")
    grams = ref.select(
        F.explode(_word_ngrams(F.col(text_col), n, distinct=True))
         .alias("gram"))
    h1 = _md5_hash60(F.col("gram"))
    h2 = _md5_hash60(F.concat(F.lit("bloom:"), F.col("gram")))
    pos = F.explode(F.array(*[
        ((h1 + F.lit(i) * h2) % m_bits).alias(f"p{i}")
        for i in range(k)])).alias("pos")
    # the shifted 1 MUST be a long: shiftleft on a 32-bit 1 wraps
    # 1<<31 to -2^31 (Java int shift) while DuckDB's BIGINT shift
    # gives +2^31 (expr form: F.shiftleft only takes literal amounts)
    return (grams.select(pos)
                 .select(F.shiftright(F.col("pos"), 5).alias("word"),
                         F.expr("shiftleft(1L, CAST(pos & 31 AS INT))")
                          .alias("mask"))
                 .groupBy("word")
                 .agg(F.bit_or("mask").alias("bits")))


def bloom_decontaminate(df: DataFrame, text_col: str, id_col: str,
                        ref: DataFrame, ref_text_col: str | None = None,
                        n: int = 13, m_bits: int = 1 << 20,
                        k: int = 4) -> DataFrame:
    """Benchmark decontamination through a Bloom filter: flag every
    document with at least one word ``n``-gram whose ``k`` bloom bits
    are ALL set by the reference set.  Returns
    (id, n_hits, contaminated) — same shape as ``decontaminate``
    (llm40), which is the exact-set companion.

    Where llm40 broadcasts the eval set's distinct GRAM STRINGS, this
    broadcasts a fixed-size BITMAP (m_bits/32 rows, ~128 KB at 2^20)
    — the right trade once the reference is itself large (e.g.
    screening a new crawl against every benchmark suite at once): the
    broadcast no longer grows with the reference, at the price of a
    known false-positive rate (~(1-e^(-kN/m))^k).  Both engines
    compute the SAME bloom, so despite being approximate vs ground
    truth the output is exactly DuckDB-oracled (llm66).

    Plan: each of the k probes is its own BROADCAST left join against
    the bitmap (word-equi-join, in-partition, no shuffle) — NOT an
    exploded probe stream, which would need a (doc, gram) re-aggregation
    shuffle just to AND the probes back together.  The gram hits when
    every probe's bit is set; the only shuffle in the whole check is
    the final per-doc count, keyed on the doc id."""
    ref_text_col = ref_text_col or text_col
    bitmap = bloom_bitmap(ref, ref_text_col, n=n, m_bits=m_bits, k=k)
    doc_grams = spread_for_compute(df).select(
        F.col(id_col).alias("id"),
        F.explode(_word_ngrams(F.col(text_col), n, distinct=True))
         .alias("gram"))
    h1 = _md5_hash60(F.col("gram"))
    h2 = _md5_hash60(F.concat(F.lit("bloom:"), F.col("gram")))
    probed = doc_grams.select(
        "id", "gram",
        *[((h1 + F.lit(i) * h2) % m_bits).alias(f"pos{i}")
          for i in range(k)])
    hit_all = F.lit(True)
    for i in range(k):
        bm = bitmap.select(F.col("word").alias(f"word{i}"),
                           F.col("bits").alias(f"bits{i}"))
        probed = probed.withColumn(
            f"word{i}", F.shiftright(F.col(f"pos{i}"), 5)).join(
            F.broadcast(bm), f"word{i}", "left")
        mask = F.expr(f"shiftleft(1L, CAST(pos{i} & 31 AS INT))")
        hit_all = hit_all & (F.coalesce(F.col(f"bits{i}"), F.lit(0))
                              .bitwiseAND(mask) == mask)
    per_doc = (probed.select("id", hit_all.cast("int").alias("all_set"))
                     .groupBy("id")
                     .agg(F.sum("all_set").alias("n_hits")))
    base = df.select(F.col(id_col).alias("id"))
    return (base.join(per_doc, "id", "left")
                .select("id",
                        F.coalesce("n_hits", F.lit(0)).alias("n_hits"))
                .withColumn("contaminated", F.col("n_hits") > 0))


def exact_quantiles(df: DataFrame, value_col: str,
                    probs=(0.25, 0.5, 0.75, 0.9, 0.99)) -> DataFrame:
    """Exact distributed quantiles (percentile_disc semantics: the
    smallest value whose cumulative count reaches ceil(p*N)) over a
    numeric column with a BOUNDED distinct-value domain — document
    lengths, token counts, scores-in-buckets.  Returns (prob, value)
    in prob order.

    Why not approx_quantile: Spark's Greenwald-Khanna sketch is
    approximate AND implementation-specific, so it can never be
    value-oracled; for the corpus-stats columns that matter here the
    distinct-value table after groupBy(value) is tiny (lengths max
    out in the low millions), making EXACT quantiles cheap: the
    corpus-size work is one partial-agg'd count shuffle keyed on the
    value, and only the distinct-value table enters the prefix-sum
    window — its SinglePartition is over thousands of rows, not the
    corpus (documented in the plan-sweep allowlist).  The quantile
    probe is a broadcast of the 1-row total onto the cumulative
    table.  ceil(p*N) is double math, but the same IEEE double math
    in both engines (N < 2^53 exact), so the cut indices — and with
    them the whole frame — oracle exactly (llm69)."""
    from pyspark.sql import Window

    if not probs or any(not 0.0 < p <= 1.0 for p in probs):
        raise ValueError("probs must be in (0, 1]")
    dist = (df.groupBy(F.col(value_col).alias("v"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = (Window.orderBy("v")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = dist.select("v", F.sum("cnt").over(w).alias("cum"))
    tot = dist.agg(F.sum("cnt").alias("n"))
    pr = F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("prob")
    probed = cum.crossJoin(F.broadcast(tot)).select(
        "v", "cum", "n", pr)
    return (probed.filter(F.col("cum") >=
                          F.ceil(F.col("prob") * F.col("n")))
                  .groupBy("prob")
                  .agg(F.min("v").alias("value"))
                  .orderBy("prob"))


def topk_per_group(df: DataFrame, group_col: str, order_col: str,
                   id_col: str, k: int = 5,
                   descending: bool = True) -> DataFrame:
    """Top-``k`` rows of every group by (order value, id) — "best k
    documents per source", the standard per-domain curation cut.
    Returns (group, id, order value, rank) with rank 1-based and ties
    broken by ascending id, so the cut is total and deterministic.

    Scale shape: ONE hash shuffle on the group key; within a
    partition Spark's WindowGroupLimit optimization (plan-gated in
    the tests) keeps only k rows per group DURING the sort — a group
    with a billion rows never materializes a billion-row sort buffer,
    which is what makes windowed top-k survive skewed groups.  No
    global sort anywhere; the final orderBy is display-only on <=
    k * |groups| rows."""
    from pyspark.sql import Window

    ordv = F.col(order_col).desc() if descending else F.col(order_col)
    w = Window.partitionBy(group_col).orderBy(ordv, F.col(id_col))
    return (df.select(group_col, id_col, order_col)
              .withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= k)
              .orderBy(group_col, "rank"))


def robust_outliers(df: DataFrame, group_col: str, value_col: str,
                    id_col: str, k: int = 2) -> DataFrame:
    """Per-group z-score outlier flag computed in EXACT integer
    algebra: flags x where ``(x - mean)^2 > k^2 * sample_var``,
    i.e. ``(n-1)*(n*x - S)^2 > k^2 * n * (n*Q - S^2)`` with S = sum x
    and Q = sum x^2 — no floating mean/stddev anywhere, so there is
    no summation-order sensitivity and the flag is bit-identical in
    DuckDB (llm71; Spark sums in decimal(38,0) ≙ DuckDB HUGEINT).
    Returns (id, group, value, is_outlier); singleton groups are
    never outliers (both sides 0).

    Exactness bound: all products stay inside 38 digits for group
    sizes up to ~1e8 at value <= ~5e4 ((n*x-S)^2*(n-1) is the
    widest term); past that scale, switch the comparison to doubles
    and accept boundary fuzz.  Scale shape: one partial-agg'd
    group-stats shuffle (3 numbers per group), stats broadcast back,
    then a stateless per-row compare — the corpus itself never
    reshuffles."""
    g = F.col(group_col)
    x = F.col(value_col).cast("decimal(38,0)")
    stats = (df.groupBy(group_col)
               .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
                    F.sum(x).alias("__s"),
                    F.sum(x * x).alias("__q")))
    j = df.select(F.col(id_col).alias("id"), g.alias("grp"),
                  F.col(value_col).alias("value")) \
          .join(F.broadcast(stats.withColumnRenamed(group_col, "grp")),
                "grp")
    n, s, q = F.col("__n"), F.col("__s"), F.col("__q")
    xv = F.col("value").cast("decimal(38,0)")
    lhs = (n - 1) * (n * xv - s) * (n * xv - s)
    rhs = F.lit(k * k) * n * (n * q - s * s)
    return (j.select("id", F.col("grp").alias(group_col), "value",
                     (lhs > rhs).alias("is_outlier"))
             .orderBy("id"))
