"""Skew handling: salted joins for hot keys.

The engine's first lines of defense against skew are free: AQE's skew
join (enabled in session.py) splits oversized sort-merge partitions at
runtime, broadcast joins sidestep the shuffle entirely for small dims,
and the LLM-op candidate generators cap degenerate buckets explicitly
(dedup.py, simsearch.py).  The case those leave open is a shuffled join
whose hot key is so large that even AQE's split partitions overwhelm a
task — the classic web-corpus join where one domain/key holds 1% of
100 TB.  Salting fixes that shape mechanically: fact rows of a key
scatter across ``salt`` sub-keys, the (smaller, but not broadcastable)
other side replicates ``salt`` times, and the join runs on
(key, salt) — the hot key's rows now land on ``salt`` tasks instead of
one.  The result set is provably identical to the unsalted join; only
the physical distribution changes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(fact: DataFrame, other: DataFrame,
                on: Sequence[str], salt: int = 8,
                how: str = "inner", seed: int = 42) -> DataFrame:
    """Equi-join ``fact`` (the large, skew-keyed side) with ``other``
    on columns ``on``, salted ``salt`` ways.

    ``other`` is replicated ``salt`` times (explode over a literal
    sequence — a projection, no shuffle), so it should be the smaller
    side: cost grows linearly in ``salt`` on that side only.  ``how``
    supports the joins whose semantics salting preserves row-for-row:
    'inner' and 'left' (left = fact side).  A full/right outer would
    emit each unmatched ``other`` row ``salt`` times and is rejected.

    The fact-side salt is ``floor(rand(seed) * salt)`` — which salt a
    row gets is irrelevant to the result (every salt matches the same
    replicated ``other`` rows), so the join output is deterministic
    even though the salt assignment varies with partitioning."""
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r}: salting preserves only inner/left (fact-side)"
            " join semantics — an outer other-side would duplicate its"
            " unmatched rows once per salt")
    on = list(on)
    overlap = (set(fact.columns) | set(other.columns)) & {_SALT}
    if overlap:
        raise ValueError(f"column {_SALT!r} already exists")
    f_salted = fact.withColumn(
        _SALT, F.floor(F.rand(seed) * salt).cast("int"))
    o_salted = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return (f_salted.join(o_salted, on + [_SALT], how)
                    .drop(_SALT))
