"""Temporal join operators (extension; the reference DSL has no as-of or
range join — these cover the event/time-series queries a large pipeline
needs on top of SURVEY.md §2.3's equality joins).

Both operators are pure DataFrame compositions — no UDFs, no driver
loops — so they inherit codegen, AQE, and spill handling:

* ``asof_join`` is the union-and-carry-forward formulation: one shuffle
  by key, one sort within partitions, a `last(..., ignorenulls)` running
  window.  This is the scale-correct shape — the naive formulation
  (inequality join + argmax) is a near-cross-product per key.
* ``range_join`` buckets time into fixed bands and equi-joins on
  (key, band), turning an inequality join Spark would plan as a
  nested-loop into a hash/sort-merge join whose fan-out is bounded by
  band occupancy; the exact predicate filters inside the band.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .errors import PlanError

_MARK = "__asof_side"
_T = "__asof_t"
_PAY = "__asof_payload"


def _as_ltz(df: DataFrame, *cols: str) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column in ``cols`` to TimestampType so the
    epoch arithmetic below (``cast('double')`` = seconds since epoch)
    resolves.  The engine pins the session timezone to UTC, making the
    cast lossless; non-NTZ columns (already LTZ, or numeric time axes)
    pass through untouched."""
    from pyspark.sql.types import TimestampNTZType
    for c in cols:
        if c in df.columns and isinstance(df.schema[c].dataType,
                                          TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def asof_join(left: DataFrame, right: DataFrame, by: str | list[str],
              left_on: str, right_on: str,
              direction: str = "backward",
              tolerance_sec: Optional[float] = None,
              suffix: str = "_right") -> DataFrame:
    """For every left row, attach the single closest right row with
    ``right_on <= left_on`` (direction='backward', inclusive) or
    ``right_on >= left_on`` ('forward') within the same ``by`` key;
    unmatched left rows keep nulls (left-outer semantics).

    ``tolerance_sec`` additionally requires the match to lie within that
    many seconds of the left timestamp.

    Implementation: union both sides tagged with a marker, carry the
    latest right payload forward with ``last(ignorenulls=True)`` over a
    (key, time, marker) running window, then keep only left rows.
    Exactly one exchange (hash by key) and one sort — at 100 TB this is
    the same cost as any keyed aggregation, with no per-key quadratic
    term.  Ties on the timestamp resolve to the LATEST right row in
    (time, marker-ordinal) order, matching ASOF JOIN's inclusive bound.
    """
    if direction not in ("backward", "forward"):
        raise PlanError("asof_join direction must be "
                        "'backward' or 'forward'")
    keys = [by] if isinstance(by, str) else list(by)
    left = _as_ltz(left, left_on)
    right = _as_ltz(right, right_on)
    overlap = [c for c in right.columns
               if c in left.columns and c not in keys]
    r_payload = [c for c in right.columns if c not in keys]
    if right_on not in right.columns:
        raise PlanError(f"right_on column {right_on!r} not in right side")

    def out_name(c: str) -> str:
        return c + suffix if c in overlap else c

    # right rows: key, event time, payload struct; marker 0 sorts before
    # left marker 1 at equal timestamps -> inclusive match
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_on).cast("double").alias(_T),
        F.lit(0).alias(_MARK),
        F.struct(*[F.col(c).alias(out_name(c))
                   for c in r_payload]).alias(_PAY),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_on).cast("double").alias(_T),
        F.lit(1).alias(_MARK),
        F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
        *[F.col(c) for c in left.columns if c not in keys],
    )
    u = r.unionByName(l)

    if direction == "backward":
        w = (Window.partitionBy(*keys).orderBy(F.col(_T).asc(),
                                               F.col(_MARK).asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        w = (Window.partitionBy(*keys).orderBy(F.col(_T).desc(),
                                               F.col(_MARK).asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w)) \
               .withColumn("__match_t",
                           F.last(F.when(F.col(_MARK) == 0, F.col(_T)),
                                  ignorenulls=True).over(w)) \
               .filter(F.col(_MARK) == 1)

    if tolerance_sec is not None:
        gap = F.abs(F.col(_T) - F.col("__match_t"))
        matched = matched.withColumn(
            _PAY, F.when(gap <= F.lit(float(tolerance_sec)),
                         F.col(_PAY)))

    pay_cols = [F.col(f"{_PAY}.{out_name(c)}").alias(out_name(c))
                for c in r_payload]
    return matched.select(*keys,
                          *[F.col(c) for c in left.columns
                            if c not in keys],
                          *pay_cols)


def sessionize(df: DataFrame, ts_col: str, by: str | list[str],
               gap_sec: float, aggs: dict | None = None) -> DataFrame:
    """Group events into sessions: consecutive events of the same key
    belong to one session while the gap between neighbors stays at or
    under ``gap_sec``; a longer silence starts a new session.

    Built on Spark's native ``session_window`` (dynamic-gap windows are
    merged inside the aggregation operator — one keyed shuffle, state
    bounded by open sessions), so the same call works on a streaming
    DataFrame with a watermark.  Returns one row per session:
    key cols, session_start, session_end, plus the requested aggregates
    (default: n_events).

    Edge semantics: Spark merges sessions whose [ts, ts+gap) extents
    overlap OR touch, so a neighbor AT MOST ``gap_sec`` after its
    predecessor stays in the session (closed boundary — verified by
    test_sessionize_exact_gap_boundary).  session_end is
    last_event_ts + gap (Spark's convention)."""
    keys = [by] if isinstance(by, str) else list(by)
    df = _as_ltz(df, ts_col)
    if aggs is None:
        aggs = {"n_events": F.count(F.lit(1))}
    win = F.session_window(F.col(ts_col), f"{gap_sec} seconds")
    agg_cols = [expr.alias(name) for name, expr in aggs.items()]
    out = (df.groupBy(win.alias("__sess"), *[F.col(k) for k in keys])
             .agg(*agg_cols))
    return out.select(*keys,
                      F.col("__sess.start").alias("session_start"),
                      F.col("__sess.end").alias("session_end"),
                      *[F.col(n) for n in aggs])


_ROLLUP_FNS = {"count", "sum", "min", "max"}


def rollup_timeseries(df: DataFrame, ts_col: str, by: str | list[str],
                      aggs: list[tuple[str, str, str]],
                      granularities_sec: list[int]) -> DataFrame:
    """Multi-resolution time-bucketed aggregates (hypertable-style
    continuous-aggregate rollup): one output row per (granularity, key,
    bucket_start), for every requested granularity.

    Scale design — hierarchical re-aggregation: the raw table is scanned
    and shuffled ONCE, at the finest granularity; every coarser level
    re-aggregates the previous level's output, whose row count is
    already collapsed by bucketing (a day-level pass over minute
    aggregates touches 1/1440th of the events).  That is why ``aggs``
    is restricted to re-aggregable functions (count/sum/min/max — count
    re-aggregates as sum; averages should be derived as sum/count by
    the caller).  Coarser granularities must be integer multiples of
    the finest."""
    keys = [by] if isinstance(by, str) else list(by)
    for fn, _c, _a in aggs:
        if fn not in _ROLLUP_FNS:
            raise PlanError(
                f"rollup_timeseries aggregate {fn!r} is not "
                f"re-aggregable; use one of {sorted(_ROLLUP_FNS)}")
    df = _as_ltz(df, ts_col)
    grans = sorted(set(int(g) for g in granularities_sec))
    if not grans or grans[0] <= 0:
        raise PlanError("granularities_sec must be positive")
    base = grans[0]
    for g in grans[1:]:
        if g % base != 0:
            raise PlanError(
                f"granularity {g}s is not a multiple of the finest "
                f"({base}s); hierarchical rollup needs aligned buckets")

    def bucket(col, width):
        return F.timestamp_seconds(
            F.floor(col.cast("double") / F.lit(width)) * F.lit(width))

    def agg_exprs(first_level: bool):
        out = []
        for fn, c, alias in aggs:
            if first_level:
                e = (F.count(F.lit(1)) if fn == "count"
                     else getattr(F, fn)(F.col(c)))
            else:
                # count re-aggregates as sum of partial counts
                e = F.sum(alias) if fn in ("count", "sum") \
                    else getattr(F, fn)(F.col(alias))
            out.append(e.alias(alias))
        return out

    finest = (df.groupBy(bucket(F.col(ts_col), base)
                         .alias("bucket_start"),
                         *[F.col(k) for k in keys])
                .agg(*agg_exprs(True)))
    if len(grans) > 1:
        # the finest level feeds every coarser one: materialize it once
        # (it is already collapsed by bucketing, so this is the small
        # intermediate a continuous aggregate would persist anyway).
        # Tracked as a cache-of-one so repeated rollups in a long-lived
        # session don't accumulate storage memory.
        from .llm_ops.util import cache_of_one
        finest = cache_of_one("rollup_finest", finest)
    levels = [finest.select(F.lit(base).alias("granularity_sec"),
                            "bucket_start", *keys,
                            *[F.col(a) for _f, _c, a in aggs])]
    for g in grans[1:]:
        cur = (finest.groupBy(bucket(F.col("bucket_start"), g)
                              .alias("bucket_start"),
                              *[F.col(k) for k in keys])
                     .agg(*agg_exprs(False)))
        levels.append(cur.select(F.lit(g).alias("granularity_sec"),
                                 "bucket_start", *keys,
                                 *[F.col(a) for _f, _c, a in aggs]))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def range_join(left: DataFrame, right: DataFrame, by: str | list[str],
               left_on: str, right_on: str,
               lower_sec: float, upper_sec: float,
               suffix: str = "_right") -> DataFrame:
    """All (left, right) pairs with the same ``by`` key and
    ``left_on + lower_sec <= right_on <= left_on + upper_sec``
    (bounds in seconds, inclusive).

    Implementation: band the timeline into fixed buckets of the window
    width and equi-join on (key, bucket), exploding each left row into
    the buckets its admissible interval overlaps; the exact range
    predicate then filters within the band.  Catalyst would otherwise
    plan the pure inequality as a broadcast-nested-loop — quadratic per
    key.  Each qualifying pair is produced exactly once because the
    right row belongs to exactly one bucket."""
    if upper_sec < lower_sec:
        raise PlanError("range_join needs lower_sec <= upper_sec")
    keys = [by] if isinstance(by, str) else list(by)
    left = _as_ltz(left, left_on)
    right = _as_ltz(right, right_on)
    width = max(upper_sec - lower_sec, 1e-9)

    overlap = [c for c in right.columns
               if c in left.columns and c not in keys]

    def out_name(c: str) -> str:
        return c + suffix if c in overlap else c

    lt = F.col(left_on).cast("double")
    rt = F.col(right_on).cast("double")

    lo_b = F.floor((lt + F.lit(lower_sec)) / F.lit(width))
    hi_b = F.floor((lt + F.lit(upper_sec)) / F.lit(width))
    l = left.select("*", F.explode(F.sequence(lo_b, hi_b))
                    .alias("__band"))
    r = right.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        F.floor(rt / F.lit(width)).alias("__band"),
        rt.alias("__rt"),
        *[F.col(c).alias(out_name(c)) for c in right.columns
          if c not in keys],
    )
    from functools import reduce
    conds = [l["__band"] == r["__band"]] + \
            [l[k] == r[f"__rk_{k}"] for k in keys]
    joined = l.join(r, reduce(lambda a, b: a & b, conds))
    lt_j = F.col(left_on).cast("double")
    joined = joined.filter(
        (F.col("__rt") >= lt_j + F.lit(lower_sec)) &
        (F.col("__rt") <= lt_j + F.lit(upper_sec)))
    drop = ["__band", "__rt"] + [f"__rk_{k}" for k in keys]
    return joined.drop(*drop)
