"""Hashed n-gram classifier: trainer parity, bounded model size, and
agreement with the explicit-vocabulary dict model on kept docs."""

import numpy as np
import pytest

from hyperpolyglot_spark.datagen.pages import gen_page
from hyperpolyglot_spark.functions.extract import extract_text
from hyperpolyglot_spark.functions.langid import (
    HASH_BUCKETS,
    classify_any,
    classify_hashed_py,
    classify_py,
    default_hashed_model,
    default_model,
    gram_bucket,
    train_hashed_py,
    train_hashed_spark,
    training_corpus,
)


def test_bucket_is_deterministic_and_in_range():
    assert gram_bucket("the") == gram_bucket("the")
    for g in ("abc", "the", "und", "的是了", "ё́ж"):
        assert 0 <= gram_bucket(g) < HASH_BUCKETS


def test_train_spark_matches_train_py(spark):
    corpus = training_corpus(docs_per_lang=6)
    py_model = train_hashed_py(corpus)
    spark_model = train_hashed_spark(
        spark.createDataFrame(corpus, "lang string, text string")
    )
    assert set(spark_model) == set(py_model)
    for lang in py_model:
        assert np.allclose(spark_model[lang], py_model[lang], atol=1e-12)


def test_model_size_bounded_by_buckets():
    hm = default_hashed_model()
    for vec in hm.values():
        assert vec.shape == (HASH_BUCKETS,)
    # ~0.8MB at 24 languages; the point: size is O(langs * buckets),
    # independent of vocabulary
    assert sum(v.nbytes for v in hm.values()) < 16 * 2**20


def test_tie_break_and_empty_candidates():
    hm = default_hashed_model()
    # empty text scores 0 for every lang -> stable first-candidate win
    assert classify_hashed_py("", ["fr", "en"], hm) == "fr"
    assert classify_hashed_py("", None, hm) == "en"  # LANGUAGES[0]
    # unknown lang scores -inf
    assert classify_hashed_py("abc", ["nope", "en"], hm) == "en"


def test_agreement_with_dict_model_on_kept_docs():
    """On docs the quality filter keeps, the hashed scorer must agree
    with the explicit-vocab scorer (collisions only bite on gibberish,
    which is dropped before the classifier matters)."""
    from hyperpolyglot_spark.plans.pipeline import py_label_page

    m, hm = default_model(), default_hashed_model()
    agree = n = 0
    for i in range(300):
        r = gen_page(i)
        row = py_label_page(r["url"], r["html"])
        if not row["keep"]:
            continue
        text = extract_text(r["html"])
        n += 1
        agree += classify_py(text, None, m) == classify_hashed_py(text, None, hm)
    assert n > 100
    assert agree == n, f"{agree}/{n}"


def test_classify_any_dispatch():
    m, hm = default_model(), default_hashed_model()
    t = "der welt haus und wasser nicht durch"
    assert classify_any(t, None, m) == classify_py(t, None, m)
    assert classify_any(t, None, hm) == classify_hashed_py(t, None, hm)
    assert classify_any(t, None, None) == classify_hashed_py(t, None, hm)
    assert classify_any(t, None, m) == "de"


def test_jvm_bucket_matches_python(spark):
    from pyspark.sql import functions as F

    from hyperpolyglot_spark.functions.langid import bucket_col

    grams = ["the", "und", "das", "ist", "的是了", "abc", "xyz"]
    df = spark.createDataFrame([(g,) for g in grams], "gram string")
    got = {
        r["gram"]: r["b"]
        for r in df.select("gram", bucket_col(F.col("gram")).alias("b")).collect()
    }
    for g in grams:
        assert got[g] == gram_bucket(g), g


def test_cap_before_lower_boundary(spark):
    """Cap/lower ORDER parity (ADVICE r2): the spec is text[:cap].lower().
    'İ' lowercases to 2 chars ('i' + combining dot), so lowering BEFORE
    capping shifts every gram after it in longer-than-cap texts. The
    Spark gram columns must slice first, exactly like the Python spec."""
    from pyspark.sql import functions as F

    from hyperpolyglot_spark.functions.langid import (
        MAX_SCORE_CHARS,
        exploded_grams,
        grams_col,
        text_grams,
    )

    # 'İ' sits well before the cap; text extends past the cap so the
    # wrong order would shift the capped window by one char per 'İ'.
    text = ("İstanbul und das wasser " * 200)[: MAX_SCORE_CHARS + 50]
    expected = text_grams(text)

    df = spark.createDataFrame([("x", text)], "lang string, text string")
    got_exploded = [
        r["gram"] for r in exploded_grams(df).select("gram").collect()
    ]
    assert got_exploded == expected

    got_arr = df.select(grams_col(F.col("text")).alias("g")).collect()[0]["g"]
    assert list(got_arr) == expected

    # perplexity gram column follows the same contract
    from hyperpolyglot_spark.functions.perplexity import ppl_events, ppl_grams_col

    got_ppl = df.select(ppl_grams_col(F.col("text")).alias("g")).collect()[0]["g"]
    assert list(got_ppl) == ppl_events(text)


def test_classify_hashed_empty_model_falls_back_to_first_candidate():
    """An empty model (e.g. trained on an empty corpus) must score
    every candidate -inf and return the earliest candidate, exactly
    like the pre-matrix per-language loop — not raise from
    np.stack([]) (code-review regression)."""
    from hyperpolyglot_spark.functions.langid import classify_hashed_py

    assert classify_hashed_py("some text here", ["en", "de"], {}) == "en"
    assert classify_hashed_py("", ["fr"], {}) == "fr"
