"""Distributed BPE tokenizer training and encoding (Sennrich et al.
2016): learn the top-``k`` byte-pair merges from a corpus, then encode
documents with them — the tokenizer-construction step of a training-
data pipeline, run as ordinary Spark plans.

Scale design:

* **Training iterates over the word-frequency table, not the corpus.**
  Classic BPE trains on ``(word, count)``; the corpus collapses to its
  word vocabulary with ONE hash-aggregate shuffle, and every merge
  iteration after that touches only that (tiny, cached) table: one
  pair-count aggregate over the current segmentation — whose pair
  universe is smaller still — plus a 1-row driver collect for the
  arg-max pair.  100 TB of text shrinks to a vocab-sized problem after
  the first pass.
* **Merge application is an exact greedy fold, JVM-side.**  Each merge
  rewrites segmentations with ``F.aggregate`` (leftmost
  non-overlapping pair join — ``aaaa`` + merge (a,a) -> [aa, aa], the
  textbook semantics), inside whole-stage codegen, no UDF.
* **Encoding factors through the vocabulary too**: distinct words
  encode once, then join back to (doc, position) and re-assemble —
  the expensive fold runs per distinct word, not per occurrence.

Deterministic end to end: ties in the merge arg-max break by pair
string ascending, so the same corpus always yields the same tokenizer
— and the whole train+encode pipeline replays exactly in DuckDB
(llm62's oracle: the same weighted pair counts, the same tie-break,
and a recursive leftmost-single-replace whose fixpoint equals the
greedy fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import _ws_tokens
from .util import cache_of_one, release_caches, spread_for_compute


def _adjacent_pairs(seg: Column) -> Column:
    """Space-joined adjacent symbol pairs of a segmentation array
    (guarded: <2 symbols yields an empty array, F.sequence would
    count backwards)."""
    k = F.size(seg) - 1
    pairs = F.transform(F.sequence(F.lit(1), k),
                        lambda i: F.array_join(F.slice(seg, i, 2), " "))
    return F.when(k > 0, pairs).otherwise(
        F.array().cast("array<string>"))


def _apply_merge(seg: Column, x: str, y: str) -> Column:
    """Exact greedy BPE merge application: rewrite ``seg`` joining
    every leftmost non-overlapping (x, y) into one symbol, as a
    sequential ``F.aggregate`` fold carrying (emitted, pending).  The
    "" pending sentinel is safe — symbols are never empty (they start
    as single chars of non-empty words)."""
    merged = x + y

    def step(acc, s):
        return F.when(
            (acc["pend"] == x) & (s == F.lit(y)),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                F.lit("").alias("pend"))
        ).otherwise(F.struct(
            F.when(acc["pend"] == "", acc["out"])
             .otherwise(F.concat(acc["out"], F.array(acc["pend"])))
             .alias("out"),
            s.alias("pend")))

    def fin(acc):
        return F.when(acc["pend"] == "", acc["out"]) \
                .otherwise(F.concat(acc["out"], F.array(acc["pend"])))

    init = F.struct(F.array().cast("array<string>").alias("out"),
                    F.lit("").alias("pend"))
    return F.aggregate(seg, init, step, fin)


def _merge_local(seg: list[str], x: str, y: str) -> list[str]:
    """Driver-side twin of :func:`_apply_merge`: leftmost
    non-overlapping greedy join of (x, y).  Equality with the fold is
    pinned by ``test_bpe_local_equals_distributed``."""
    out: list[str] = []
    i, n, merged = 0, len(seg), x + y
    while i < n:
        if seg[i] == x and i + 1 < n and seg[i + 1] == y:
            out.append(merged)
            i += 2
        else:
            out.append(seg[i])
            i += 1
    return out


def _train_local(word_counts: list[tuple[str, int]],
                 num_merges: int) -> list[tuple[str, str]]:
    """Driver-side merge loop over a collected (word, count) table.
    Byte-identical to the distributed loop: the arg-max tie-break
    compares the SAME space-joined pair string (Python str comparison
    is code-point order, which equals Spark's UTF-8 byte order), and
    merge application is the same leftmost non-overlapping greedy
    join."""
    segs: list[tuple[list[str], int]] = [
        (list(w), wc) for w, wc in word_counts]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for seg, wc in segs:
            for i in range(len(seg) - 1):
                p = (seg[i], seg[i + 1])
                counts[p] = counts.get(p, 0) + wc
        if not counts:
            break
        (x, y), _ = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        merges.append((x, y))
        segs = [(_merge_local(seg, x, y), wc) for seg, wc in segs]
    return merges


def bpe_train(df: DataFrame, text_col: str, num_merges: int,
              local_threshold: int = 200_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.  Returns the
    ordered merge list [(x, y), ...]; stops early if the corpus runs
    out of pairs.

    **Local fast path**: after the one corpus-wide shuffle collapses
    the text to its (word, count) vocabulary, the problem is
    vocabulary-sized — almost always driver-sized.  If the vocab has
    at most ``local_threshold`` words (probed with a CollectLimit scan
    that stops early when it is larger), it is collected ONCE and the
    merge loop runs locally: one Spark job total instead of
    ``num_merges`` sequential job pairs — the difference between 3
    jobs and 32k jobs for a production vocab build.  Merges are
    byte-identical to the distributed loop (same tie-break string,
    same greedy fold; pinned by ``test_bpe_local_equals_distributed``
    and the llm62 oracle).  ``local_threshold=0`` forces the
    distributed path (vocabularies beyond driver memory).

    Distributed fallback: driver-side state is one (pair, count) row
    per iteration — a documented bounded collect, like the window
    machinery's per-bucket offsets.  The word-frequency table is
    re-cached per iteration (cache-of-one evicts the predecessor) so
    each pair count reads a materialized segmentation, not a
    ``num_merges``-deep lineage."""
    if num_merges < 0:
        raise ValueError("num_merges must be >= 0")
    if num_merges == 0:
        return []
    words = (spread_for_compute(df)
             .select(F.explode(F.filter(_ws_tokens(F.col(text_col)),
                                        lambda t: t != "")).alias("w")))
    wf = (words.groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
               .withColumn("seg", F.split("w", "")))
    # cache BEFORE the probe: when the vocab exceeds the threshold,
    # the distributed fallback's first pair count then reuses the
    # materialized aggregate instead of re-shuffling the whole corpus
    wf = cache_of_one("bpe_train", wf)
    if local_threshold > 0:
        sample = wf.select("w", "wc").limit(local_threshold + 1).collect()
        if len(sample) <= local_threshold:
            release_caches("bpe_train")
            return _train_local([(r["w"], r["wc"]) for r in sample],
                                num_merges)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (wf.select(F.explode(_adjacent_pairs(F.col("seg")))
                          .alias("pair"), "wc")
                 .groupBy("pair").agg(F.sum("wc").alias("cnt"))
                 .orderBy(F.col("cnt").desc(), "pair")
                 .limit(1).collect())
        if not top:
            break
        x, y = top[0]["pair"].split(" ")
        merges.append((x, y))
        wf = cache_of_one(
            "bpe_train",
            wf.withColumn("seg", _apply_merge(F.col("seg"), x, y)))
    return merges


def bpe_encode(df: DataFrame, text_col: str, id_col: str,
               merges: list[tuple[str, str]]) -> DataFrame:
    """Encode documents with an ordered merge list.  Returns
    (id, bpe_tokens, n_bpe_tokens) where ``bpe_tokens`` is the
    space-joined symbol stream (words never merge across boundaries)
    and empty documents encode to ("", 0).

    The fold chain runs once per DISTINCT word; occurrences get their
    segmentation by an equi-join (broadcast-hinted — drop the hint for
    vocabularies beyond the broadcast limit and AQE still plans the
    small side correctly) and re-assemble in document order via an
    array_sort on (position, segment)."""
    toks = F.filter(_ws_tokens(F.col(text_col)), lambda t: t != "")
    base = spread_for_compute(df).select(
        F.col(id_col).alias("id"), toks.alias("toks"))
    exploded = base.select(
        "id", F.posexplode("toks").alias("pos", "w"))
    seg: Column = F.split("w", "")
    for x, y in merges:
        seg = _apply_merge(seg, x, y)
    vocab = (exploded.select("w").distinct()
             .withColumn("seg_str", F.array_join(seg, " "))
             .withColumn("n_sym",
                         F.size(F.split(F.col("seg_str"), " "))))
    agg = (exploded.join(F.broadcast(vocab), "w")
           .groupBy("id")
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("pos", "seg_str"))),
                        lambda s: s["seg_str"]),
                    " ").alias("bpe_tokens"),
                F.sum("n_sym").cast("long").alias("n_bpe_tokens")))
    return (base.select("id").join(agg, "id", "left")
            .select("id",
                    F.coalesce("bpe_tokens", F.lit("")).alias("bpe_tokens"),
                    F.coalesce("n_bpe_tokens", F.lit(0).cast("long"))
                     .alias("n_bpe_tokens")))
