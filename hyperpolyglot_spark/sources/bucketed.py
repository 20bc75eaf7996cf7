"""Bucketed-table layout for co-located joins.

At 100 TB the fact-fact join (orders x lineitem, or pages x labels on
url) is the dominant shuffle. Writing both sides bucketed + sorted by
the join key once makes every subsequent join shuffle-free: the
SortMergeJoin reads co-located buckets directly (zero Exchange in the
plan — asserted in tests/test_bucketed.py).

Parquet bucketing requires the session catalog (saveAsTable); on a real
cluster this is the same one-liner against the production catalog or an
Iceberg table with a bucket partition transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key_left: str,
    key_right: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on their join keys — no Exchange when
    bucket counts match (Spark aligns bucket i with bucket i)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right], how)
