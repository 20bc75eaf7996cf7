"""The end-to-end quality-filter pipeline over a ``pages`` table.

    pages(url, warc_ts, html, text, lang)
      -> extract (pandas UDF: html -> extracted_text + meta_tag)
      -> cascade language ID   (operators/cascade.py)
      -> quality signals + keep/drop (functions/quality.py, pure JVM)
      -> PII/toxicity scrub    (functions/scrub.py, kept rows only)
      -> labels DataFrame (FIXTURES.md §2 schema)

Stage order implements the early-exit economics of the reference
cascade (X1/X5): the scrub UDF sees only kept rows' text (dropped rows
pass NULL through the batch at ~zero cost), and the classifier UDF sees
only rows the cheap stages could not resolve.

The whole plan is narrow (no shuffle) from scan to labels — metrics
aggregation and any final repartition are the only exchanges, which is
what you want at 10^12 documents: shuffle only the tiny aggregate, never
the corpus.

py_label_page() is the frozen single-node oracle — the Spark pipeline
must reproduce it per url with keep/drop F1 >= 0.99 (BASELINE.json;
ours is exact by construction and the tests assert F1 == 1.0).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.extract import extract_text, meta_lang_tag
from ..functions.quality import py_keep_drop, py_signals, with_keep_drop
from ..functions.scrub import SCRUB_NAMES, py_scrub, with_scrub
from ..operators.cascade import detect_lang_py

_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("meta_tag", T.StringType()),
    ]
)


@F.pandas_udf(_EXTRACT_SCHEMA)
def _extract_udf(html: pd.Series) -> pd.DataFrame:
    texts, metas = [], []
    for h in html:
        if h is None:
            texts.append("")
            metas.append(None)
            continue
        texts.append(extract_text(bytes(h)))
        metas.append(meta_lang_tag(bytes(h)))
    return pd.DataFrame({"text": texts, "meta_tag": metas})


def with_extraction(df: DataFrame, html_col: str = "html") -> DataFrame:
    e = _extract_udf(F.col(html_col))
    return (
        df.withColumn("_e", e)
        .withColumn("extracted_text", F.col("_e.text"))
        .withColumn("meta_tag", F.col("_e.meta_tag"))
        .drop("_e")
    )


_LABEL_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("meta_tag", T.StringType()),
        T.StructField("lang_pred", T.StringType()),
        T.StructField("strategy", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("n_words", T.LongType()),
        T.StructField("symbol_ratio", T.DoubleType()),
        T.StructField("rep3_ratio", T.DoubleType()),
        T.StructField("stop_density", T.DoubleType()),
        T.StructField("is_vendor_url", T.DoubleType()),
    ]
)


def make_label_udf(spark: SparkSession, model=None):
    """ONE Arrow-batched UDF fusing the text-bound per-document work:
    html decode + extraction + the 5-stage detection cascade (broadcast
    model) + the scalar quality signals.

    Why fused, with measurements (50k pages, local[32], warm): the
    column-expression forms of the cascade and signals are higher-order
    array expressions that Catalyst's projection collapsing re-inlines
    into every consumer (strategy, lang_pred, the rule ladder, the
    scrub mask) — the executed plan carried 31 copies of the
    words-split tree and ran 40-50s; HOF lambdas are interpreted, not
    codegen'd, so each copy is paid per row. The same logic as plain
    Python inside the extraction UDF's Arrow batch costs ~0.3ms/row and
    the whole pipeline drops to ~8s. Extraction forces the Python hop
    anyway; the cascade's dict probes + compiled markers + signal
    counting ride the same batch, and NB scoring still runs only on
    rows the cheap stages leave unresolved (early-exit X1). The
    column-expression cascade/signal operators remain (operators/
    cascade.py, functions/quality.py) — parity-tested and used by the
    oracle queries — this is a plan-shape choice, not a semantics fork:
    both paths implement the same frozen spec functions."""
    from ..functions.langid import default_model

    bc = spark.sparkContext.broadcast(model or default_model())

    @F.pandas_udf(_LABEL_SCHEMA)
    def label_udf(urls: pd.Series, html: pd.Series) -> pd.DataFrame:
        m = bc.value
        out = {f.name: [] for f in _LABEL_SCHEMA.fields}
        for url, h in zip(urls, html):
            b = bytes(h) if h is not None else b""
            url = url or ""
            text = extract_text(b)
            meta = meta_lang_tag(b)
            lang, strat = detect_lang_py(url, text, meta, m)
            sig = py_signals(text, url)
            out["text"].append(text)
            out["meta_tag"].append(meta)
            out["lang_pred"].append(lang)
            out["strategy"].append(strat)
            out["n_chars"].append(int(sig["n_chars"]))
            out["n_words"].append(int(sig["n_words"]))
            out["symbol_ratio"].append(sig["symbol_ratio"])
            out["rep3_ratio"].append(sig["rep3_ratio"])
            out["stop_density"].append(sig["stop_density"])
            out["is_vendor_url"].append(sig["is_vendor_url"])
        return pd.DataFrame(out)

    return label_udf


def run_pipeline(spark: SparkSession, pages: DataFrame, model=None) -> DataFrame:
    """pages -> labels. Narrow end-to-end; column-pruned scan (url +
    html only are needed upstream of the label projection)."""
    df = pages.select("url", "warc_ts", "html")
    lbl = make_label_udf(spark, model)(F.col("url"), F.col("html"))
    df = df.withColumn("_l", lbl).select(
        "url",
        "warc_ts",
        F.col("_l.text").alias("extracted_text"),
        F.col("_l.lang_pred").alias("lang_pred"),
        F.col("_l.strategy").alias("strategy"),
        F.col("_l.n_chars").alias("n_chars"),
        F.col("_l.n_words").alias("n_words"),
        F.col("_l.symbol_ratio").alias("symbol_ratio"),
        F.col("_l.rep3_ratio").alias("rep3_ratio"),
        F.col("_l.stop_density").alias("stop_density"),
        F.col("_l.is_vendor_url").alias("is_vendor_url"),
    )
    df = with_keep_drop(df)
    # scrub only kept rows: dropped rows contribute NULL text to the
    # Arrow batch, the UDF loop skips them
    df = df.withColumn(
        "_scrub_in", F.when(F.col("keep"), F.col("extracted_text"))
    )
    df = with_scrub(df, text_col="_scrub_in")
    scrub_cols = [F.col(f"scrub_{n}") for n in SCRUB_NAMES]
    return df.select(
        "url",
        "warc_ts",
        F.col("extracted_text").alias("text"),
        "lang_pred",
        "strategy",
        "keep",
        "drop_rule",
        "scrubbed_text",
        *scrub_cols,
        "n_chars",
        "n_words",
        "symbol_ratio",
        "rep3_ratio",
        "stop_density",
    )


def metrics(labels: DataFrame) -> DataFrame:
    """Corpus metrics: docs seen / kept / dropped-by-rule / scrub counts
    (the breakdown agg A1-A3 analog + north-star metrics rows). One
    partial+final hash aggregation — the only shuffle in the job."""
    scrub_sums = [
        F.sum(F.coalesce(F.col(f"scrub_{n}"), F.lit(0))).alias(f"scrub_{n}")
        for n in SCRUB_NAMES
    ]
    return labels.groupBy("lang_pred", "strategy", "keep", "drop_rule").agg(
        F.count("*").alias("docs"),
        F.sum("n_chars").alias("chars"),
        *scrub_sums,
    )


def breakdown(labels: DataFrame) -> DataFrame:
    """Language breakdown with percent-of-total by file count
    (reference get_language_breakdown + CLI percentages,
    src/bin/main.rs:121-133; percentages are doc-count based per
    README.md:50)."""
    counts = labels.groupBy("lang_pred").agg(F.count("*").alias("docs"))
    total = F.sum("docs").over(Window.partitionBy())
    return counts.withColumn(
        "pct", F.round(F.col("docs") * 100.0 / total, 4)
    ).orderBy(F.desc("docs"), "lang_pred")


# ----------------------------------------------------------------------
# frozen single-node oracle (reference labels)
# ----------------------------------------------------------------------

def py_label_page(url: str, html: bytes, model=None) -> dict:
    """Pure-Python per-document spec: the 'reference pipeline' whose
    labels the Spark job must match (SURVEY.md §7.1.1)."""
    text = extract_text(html)
    meta = meta_lang_tag(html)
    lang_pred, strategy = detect_lang_py(url, text, meta, model)
    keep, drop_rule = py_keep_drop(text, url)
    if keep:
        scrubbed, counts = py_scrub(text)
    else:
        # dropped rows are never scrubbed: NULL text, zero counts
        # (matches the Spark batch pass-through convention)
        scrubbed, counts = None, {n: 0 for n in SCRUB_NAMES}
    sig = py_signals(text, url)
    return {
        "url": url,
        "text": text,
        "lang_pred": lang_pred,
        "strategy": strategy,
        "keep": keep,
        "drop_rule": drop_rule,
        "scrubbed_text": scrubbed,
        **{f"scrub_{n}": counts[n] for n in SCRUB_NAMES},
        "n_chars": int(sig["n_chars"]),
        "n_words": int(sig["n_words"]),
        "symbol_ratio": sig["symbol_ratio"],
        "rep3_ratio": sig["rep3_ratio"],
        "stop_density": sig["stop_density"],
    }
