"""Streaming pipeline: availableNow drain must produce exactly the
batch labels; restart with same checkpoint must not duplicate."""

from pyspark.sql import functions as F

from hyperpolyglot_spark.datagen.pages import gen_pages_pdf
from hyperpolyglot_spark.plans.pipeline import run_pipeline
from hyperpolyglot_spark.streaming.stream import (
    run_stream_once,
    streaming_labels,
    streaming_metrics,
)

N = 150


def test_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "labels_out")
    ckpt = str(tmp_path / "ckpt")
    pdf = gen_pages_pdf(N)
    spark.createDataFrame(pdf).repartition(4).write.parquet(src)

    run_stream_once(spark, src, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == N

    batch = run_pipeline(spark, spark.read.parquet(src))
    a = {r["url"]: (r["keep"], r["drop_rule"], r["lang_pred"], r["scrubbed_text"])
         for r in got.collect()}
    b = {r["url"]: (r["keep"], r["drop_rule"], r["lang_pred"], r["scrubbed_text"])
         for r in batch.collect()}
    assert a == b

    # exactly-once: re-running with the same checkpoint adds nothing
    run_stream_once(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == N


def test_streaming_metrics_window(spark, tmp_path):
    src = str(tmp_path / "pages_in2")
    spark.createDataFrame(gen_pages_pdf(N)).write.parquet(src)
    labels = streaming_labels(spark, src)
    m = streaming_metrics(labels)
    # complete mode: append would only emit once the watermark passes
    # the window end, which a single availableNow drain never reaches
    q = (
        m.writeStream.format("memory")
        .queryName("mtest")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from mtest").collect()
    # warc_ts increases 1s per row -> all N rows inside one 1h window
    assert len(rows) == 1
    assert rows[0]["docs"] == N
    assert 0 < rows[0]["kept"] <= N
