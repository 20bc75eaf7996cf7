"""Pages-table source/sink with Iceberg-style day partitioning.

The production input is an Iceberg table of crawl pages
(BASELINE.json input_hint). This container has no Iceberg runtime, so
the same layout is expressed as parquet partitioned by crawl day —
identical pruning semantics: a warc_ts day filter prunes whole
partitions before any row is read (SURVEY §2.1 S2; the reference's
analog is skipping vendor subtrees before walking them,
src/lib.rs:224-236). Swapping `format("parquet")` for
`format("iceberg")` + a catalog name is the only change on a real
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "crawl_day"


def write_pages_partitioned(pages: DataFrame, path: str) -> None:
    """Write pages partitioned by crawl day (Iceberg days(warc_ts)
    transform analog)."""
    (
        pages.withColumn(PARTITION_COL, F.to_date("warc_ts"))
        .write.mode("overwrite")
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )


def read_pages(
    spark: SparkSession,
    path: str,
    day: str | None = None,
    day_range: tuple[str, str] | None = None,
) -> DataFrame:
    """Read pages; day filters land in the scan's PartitionFilters."""
    df = spark.read.parquet(path)
    if day is not None:
        df = df.filter(F.col(PARTITION_COL) == day)
    if day_range is not None:
        lo, hi = day_range
        df = df.filter(F.col(PARTITION_COL).between(lo, hi))
    return df.drop(PARTITION_COL)
