"""Skew handling: the corpus has Zipf-skewed hosts (site0.* takes ~35%
of traffic). Partitioning by host would melt one reducer; url-hash
partitioning (the north-star plan shape) balances — this test measures
both."""

from pyspark.sql import functions as F

from hyperpolyglot_spark.datagen.pages import gen_pages_pdf


def _partition_sizes(df, n, col):
    return [
        r["count"]
        for r in df.repartition(n, F.col(col))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    ]


def test_url_hash_beats_host_partitioning(spark):
    pages = spark.createDataFrame(gen_pages_pdf(3000)).withColumn(
        "host", F.lower(F.get(F.split("url", "/"), 2))
    )
    n = 16
    host_sizes = _partition_sizes(pages, n, "host")
    url_sizes = _partition_sizes(pages, n, "url")
    mean = 3000 / n

    # hosts are Zipf-skewed: the hottest host makes one partition blow up
    assert max(host_sizes) / mean > 2.0, host_sizes
    # url-hash partitioning stays balanced (every key is unique)
    assert max(url_sizes) / mean < 1.35, url_sizes
    assert len(url_sizes) == n  # no empty reducers


def test_hot_host_share(spark):
    pages = spark.createDataFrame(gen_pages_pdf(3000)).withColumn(
        "host", F.lower(F.get(F.split("url", "/"), 2))
    )
    top = (
        pages.groupBy("host").count().orderBy(F.desc("count")).limit(1).collect()
    )[0]
    assert top["host"] == "portal.example.com"
    assert top["count"] > 3000 * 0.2  # the skew stratum is real
