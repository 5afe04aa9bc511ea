"""Bucketed-table support: pre-shuffled storage for co-located joins.

On a 1000-executor cluster the dominant cost of a large equi-join or
aggregation is the shuffle of both sides on the key.  Spark's bucketed
tables move that shuffle to WRITE time, once: a table written with
``bucketBy(n, key)`` stores rows hash-partitioned into ``n`` bucket
files per partition, and every subsequent join or aggregation on the
bucket key reads the table already partitioned — the exchange (and,
with ``sortBy``, the sort) disappears from the plan.  For fact tables
that are joined on the same key by many queries (orders ⋈ lineitem on
the order key being the canonical example), this amortizes one shuffle
across every future query.

This module is deliberately thin over the public DataFrameWriter API —
the work happens in Catalyst's bucketing rules, which recognize
matching output partitioning and elide the exchange.  Caveats that
matter at scale, encoded in the helpers below:

- Both join sides must agree on bucket count (or differ by an exact
  multiple with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
  the helper surfaces the bucket spec so callers can match.
- Bucketed tables must be written via ``saveAsTable`` (the bucket
  metadata lives in the session catalog, not in parquet footers), so
  the table name is the handle — pass an explicit ``path`` to keep the
  data out of the default warehouse directory.
- One bucket = at least one file per write task; writers should
  ``repartition(bucket_cols)`` first so each bucket is one file, not
  ``tasks x buckets`` small files (done here by default).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str,
                   bucket_cols: Sequence[str], num_buckets: int,
                   sort_cols: Optional[Sequence[str]] = None,
                   path: Optional[str] = None,
                   mode: str = "overwrite",
                   one_file_per_bucket: bool = True) -> DataFrame:
    """Write ``df`` as a bucketed table and return the re-read handle.

    ``bucket_cols`` is the co-location key (the join/agg key you are
    pre-paying the shuffle for); ``sort_cols`` additionally sorts
    inside each bucket file so sort-merge joins skip their sort too.
    With ``one_file_per_bucket`` (default) the input is repartitioned
    on the bucket columns first, so each bucket is a single file
    instead of one file per upstream task per bucket — the difference
    between n_buckets files and n_tasks x n_buckets files at scale.

    Returns ``spark.table(table)``, whose scan carries the bucket
    partitioning (SelectedBucketsCount in the formatted plan)."""
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    if not bucket_cols:
        raise ValueError("bucket_cols must name at least one column")
    spark = df.sparkSession
    if one_file_per_bucket:
        df = df.repartition(num_buckets, *[df[c] for c in bucket_cols])
    w = (df.write.format("parquet").mode(mode)
           .bucketBy(num_buckets, bucket_cols[0], *bucket_cols[1:]))
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    # an overwrite leaves Spark's cached relation (file listing) for
    # the table identifier pointing at the DELETED previous files —
    # any reader planned after a second write would fail with
    # FAILED_READ_FILE.FILE_NOT_EXIST; refresh drops the stale entry
    spark.catalog.refreshTable(table)
    return spark.table(table)


def bucket_spec(spark: SparkSession, table: str) -> dict:
    """Return the bucket metadata of a catalog table:
    {"num_buckets": int, "bucket_cols": [...], "sort_cols": [...]}.
    Raises for a non-bucketed table — callers use this to match the
    bucket count of the other join side before writing it."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        raise ValueError(f"table {table!r} is not bucketed")

    def _cols(v: str) -> list[str]:
        return [c.strip().strip("`") for c in
                v.strip("[]").split(",") if c.strip()]

    return {"num_buckets": int(info["Num Buckets"]),
            "bucket_cols": _cols(info.get("Bucket Columns", "")),
            "sort_cols": _cols(info.get("Sort Columns", ""))}
