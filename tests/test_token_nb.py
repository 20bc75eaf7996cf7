"""Token-NB classifier: the reference's F2 tokenizer -> F3 key-token
-> F4 NB path (src/detectors/classifier.rs:24-48) as a selectable
feature extractor with the same train/score machinery."""

import math

import pytest

from hyperpolyglot_spark.functions.langid import (
    TokenModel,
    classify_any,
    classify_tokens_py,
    make_classify_udf,
    text_tokens,
    train_token_py,
    train_token_spark,
    training_corpus,
)


def test_text_tokens_is_f2_f3():
    """idents + symbols only, numbers/comments/strings out, 32B cap."""
    toks = text_tokens('def foo(): # hi\n  x = "str" + 42')
    assert "def" in toks and "foo" in toks and "(" in toks and "=" in toks
    assert "42" not in toks and "hi" not in toks and "str" not in toks
    long = "a" * 33
    assert long not in text_tokens(f"x {long} y")


def test_train_spark_matches_train_py(spark):
    corpus = training_corpus(docs_per_lang=5)
    py = train_token_py(corpus)
    sp = train_token_spark(
        spark.createDataFrame(corpus, "lang string, text string")
    )
    assert set(sp) == set(py)
    for lang in py:
        assert set(sp[lang]) == set(py[lang])
        for t, v in py[lang].items():
            assert math.isclose(sp[lang][t], v, abs_tol=1e-12), (lang, t)


def test_classifier_semantics():
    m = TokenModel({"en": {"the": -1.0}, "de": {"und": -1.0}})
    assert classify_tokens_py("the house", ["de", "en"], m) == "en"
    assert classify_tokens_py("und haus", ["de", "en"], m) == "de"
    # unknown lang -> -inf; empty text -> stable first-candidate win
    assert classify_tokens_py("the", ["xx", "en"], m) == "en"
    assert classify_tokens_py("", ["de", "en"], m) == "de"
    # classify_any dispatches on the TokenModel marker type
    assert classify_any("the house", ["de", "en"], m) == "en"


def test_udf_matches_py_spec(spark):
    corpus = training_corpus(docs_per_lang=5)
    model = train_token_py(corpus)
    texts = [t for _, t in corpus[::7]]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    from pyspark.sql import functions as F

    clf = make_classify_udf(spark, model)
    got = [
        r["p"]
        for r in df.select(
            clf(F.col("text"), F.array().cast("array<string>")).alias("p")
        ).collect()
    ]
    want = [classify_tokens_py(t, [], model) for t in texts]
    assert got == want


def test_token_model_accuracy_on_corpus():
    """Same-train accuracy analog of the reference's golden test —
    over the languages IN the model (spaceless-CJK prose produces no
    classifier tokens and is absent by spec; the char-gram/hashed
    scorers own that domain)."""
    corpus = training_corpus(docs_per_lang=10)
    model = train_token_py(corpus)
    scored = [(lang, text) for lang, text in corpus if lang in model]
    assert len(scored) >= 0.9 * len(corpus)
    correct = sum(
        1 for lang, text in scored if classify_tokens_py(text, [], model) == lang
    )
    assert correct / len(scored) >= 0.99, correct / len(scored)
