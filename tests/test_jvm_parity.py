"""Column-expression operator parity vs the pure-Python spec.

The production pipeline fuses these stages into one Arrow UDF for plan
shape (see plans/pipeline.py); the column-expression forms remain part
of the operator inventory and MUST stay semantically identical to the
spec — this test is that guarantee, row by row on a pages sample that
exercises every stratum.
"""

import pytest
from pyspark.sql import functions as F

from hyperpolyglot_spark.datagen.pages import gen_page, gen_pages_pdf
from hyperpolyglot_spark.functions.quality import (
    py_keep_drop,
    py_signals,
    with_keep_drop,
    with_quality_signals,
)
from hyperpolyglot_spark.functions.scrub import SCRUB_NAMES, py_scrub, with_scrub
from hyperpolyglot_spark.operators.cascade import detect_lang_py, with_cascade
from hyperpolyglot_spark.plans.pipeline import with_extraction

N = 300


@pytest.fixture(scope="module")
def extracted(spark):
    pages = spark.createDataFrame(gen_pages_pdf(N))
    return with_extraction(pages.select("url", "warc_ts", "html")).cache()


@pytest.fixture(scope="module")
def oracle_rows():
    from hyperpolyglot_spark.functions.extract import extract_text, meta_lang_tag

    out = {}
    for i in range(N):
        r = gen_page(i)
        text = extract_text(r["html"])
        out[r["url"]] = (text, meta_lang_tag(r["html"]))
    return out


def test_extraction_udf_matches_spec(extracted, oracle_rows):
    for r in extracted.collect():
        text, meta = oracle_rows[r["url"]]
        assert r["extracted_text"] == text, r["url"]
        assert r["meta_tag"] == meta, r["url"]


def test_jvm_cascade_matches_spec(spark, extracted, oracle_rows):
    got = {
        r["url"]: (r["lang_pred"], r["strategy"])
        for r in with_cascade(
            extracted, spark, text_col="extracted_text"
        ).collect()
    }
    for url, (text, meta) in oracle_rows.items():
        assert got[url] == detect_lang_py(url, text, meta), url


def test_jvm_signals_and_rules_match_spec(extracted, oracle_rows):
    df = with_keep_drop(
        with_quality_signals(extracted, "extracted_text", "url")
    )
    for r in df.collect():
        text, _ = oracle_rows[r["url"]]
        sig = py_signals(text, r["url"])
        assert r["n_chars"] == int(sig["n_chars"])
        assert r["n_words"] == int(sig["n_words"])
        assert r["symbol_ratio"] == pytest.approx(sig["symbol_ratio"])
        assert r["rep3_ratio"] == pytest.approx(sig["rep3_ratio"])
        assert r["stop_density"] == pytest.approx(sig["stop_density"])
        keep, rule = py_keep_drop(text, r["url"], signals=sig)
        assert (r["keep"], r["drop_rule"]) == (keep, rule), r["url"]


def test_jvm_scrub_udf_matches_spec(extracted, oracle_rows):
    df = with_scrub(extracted, text_col="extracted_text")
    for r in df.collect():
        text, _ = oracle_rows[r["url"]]
        scrubbed, counts = py_scrub(text)
        assert r["scrubbed_text"] == scrubbed, r["url"]
        for n in SCRUB_NAMES:
            assert r[f"scrub_{n}"] == counts[n], (r["url"], n)


def test_jvm_cascade_schemeless_urls(spark):
    """Scheme-less URLs must hit the same stage-1/2 hints as the py spec
    (ADVICE round 1: column form hard-coded the scheme://host shape)."""
    cases = [
        ("example.de/news/politik", "hallo welt", None),
        ("www.example.fr/en/article", "bonjour le monde", None),
        ("https://example.co.uk/blog/post", "hello there world", None),
        ("example.com/it/pagina", "testo di prova", "it"),
        ("host.es", "hola mundo texto", None),
    ]
    rows = [
        {"url": u, "extracted_text": t, "meta_tag": m} for u, t, m in cases
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["url"]: (r["lang_pred"], r["strategy"])
        for r in with_cascade(df, spark, text_col="extracted_text").collect()
    }
    for u, t, m in cases:
        assert got[u] == detect_lang_py(u, t, m), u
