"""applyInPandasWithState: per-host kept-doc quota operator. State must
accumulate across micro-batches (maxFilesPerTrigger forces several)."""

from pyspark.sql import functions as F

from hyperpolyglot_spark.datagen.pages import gen_pages_pdf
from hyperpolyglot_spark.plans.pipeline import run_pipeline
from hyperpolyglot_spark.streaming.stream import (
    host_quota_stream,
    streaming_labels,
)


def test_host_quota_state_accumulates(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    # 8 files -> several micro-batches at maxFilesPerTrigger=8? force
    # more batches with 24 files
    pdf = gen_pages_pdf(240)
    spark.createDataFrame(pdf).repartition(24).write.parquet(src)

    labels = streaming_labels(spark, src)
    quota = host_quota_stream(labels, max_kept_per_host=5)
    q = (
        quota.writeStream.format("memory")
        .queryName("quota")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from quota").collect()
    assert rows

    # ground truth kept-per-host from the batch pipeline
    batch = run_pipeline(spark, spark.read.parquet(src))
    truth = {
        r["host"]: r["kept"]
        for r in batch.withColumn(
            "host", F.lower(F.get(F.split("url", "/"), 2))
        )
        .groupBy("host")
        .agg(F.sum(F.col("keep").cast("long")).alias("kept"))
        .collect()
    }

    by_host: dict[str, dict] = {}
    for r in rows:
        h = by_host.setdefault(
            r["host"], {"kept": 0, "admitted": 0, "batches": 0}
        )
        h["kept"] += r["kept_now"]
        h["admitted"] += r["admitted"]
        h["batches"] += 1
    for host, agg in by_host.items():
        assert agg["kept"] == truth.get(host, 0), host
        assert agg["admitted"] <= 5  # quota enforced across batches
        assert agg["admitted"] <= agg["kept"]
    # at least one host must actually hit the quota
    assert any(r["quota_hit"] for r in rows)
