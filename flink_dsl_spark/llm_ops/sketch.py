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

from .textstats import _ws_tokens
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
