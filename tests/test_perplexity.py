"""KenLM-style perplexity: trainer parity, scoring spec, rule wiring,
and the quality separation the MAX_PPL threshold relies on."""

import math

import pytest
from pyspark.sql import functions as F

from hyperpolyglot_spark.datagen.pages import gen_page, gen_pages_pdf
from hyperpolyglot_spark.functions.langid import training_corpus
from hyperpolyglot_spark.functions.perplexity import (
    PPL_ALPHA,
    default_ppl_model,
    load_ppl_model,
    logprob10_py,
    perplexity_py,
    ppl_events,
    save_ppl_model,
    train_ppl_py,
    train_ppl_spark,
    with_perplexity,
)
from hyperpolyglot_spark.functions.quality import MAX_PPL
from hyperpolyglot_spark.plans.pipeline import py_label_page


def test_events_spec():
    assert ppl_events("") == []
    assert ppl_events("ab") == []
    assert ppl_events("AbC") == ["abc"]
    assert ppl_events("abcd") == ["abc", "bcd"]


def test_probabilities_normalize():
    """Over the SEEN vocab, sum_c P(c|ctx) < 1 and with the alpha mass
    spread over V chars the smoothed distribution sums to exactly 1."""
    model = train_ppl_py([("xx", "abab abab")])
    tri, ctx, v = model["xx"]
    seen_next = {}
    for g, c in tri.items():
        seen_next.setdefault(g[:2], set()).add(g[2])
    for cx, total in ctx.items():
        s = sum(
            (tri.get(cx + ch, 0) + PPL_ALPHA) / (total + PPL_ALPHA * v)
            for ch in {g[2] for g in tri if g[:2] == cx}
        )
        # remaining alpha mass belongs to unseen chars of the vocab
        n_seen = len(seen_next[cx])
        s_full = s + (v - n_seen) * PPL_ALPHA / (total + PPL_ALPHA * v)
        assert s_full == pytest.approx(1.0, abs=1e-12)


def test_train_spark_matches_train_py(spark):
    corpus = training_corpus(docs_per_lang=6)
    py_model = train_ppl_py(corpus)
    spark_model = train_ppl_spark(
        spark.createDataFrame(corpus, "lang string, text string")
    )
    assert set(spark_model) == set(py_model)
    for lang in py_model:
        tri_p, ctx_p, v_p = py_model[lang]
        tri_s, ctx_s, v_s = spark_model[lang]
        assert tri_s == tri_p
        assert ctx_s == ctx_p
        assert v_s == v_p


def test_train_spark_short_text_parity(spark):
    corpus = [("xx", "ab"), ("xx", "abcd"), ("yy", "")]
    assert train_ppl_spark(
        spark.createDataFrame(corpus, "lang string, text string")
    ) == train_ppl_py(corpus)


def test_save_load_roundtrip(spark, tmp_path):
    model = train_ppl_py(training_corpus(docs_per_lang=4))
    path = str(tmp_path / "ppl")
    save_ppl_model(spark, model, path)
    loaded = load_ppl_model(spark, path)
    assert set(loaded) == set(model)
    for lang in model:
        assert loaded[lang][0] == model[lang][0]
        assert loaded[lang][1] == model[lang][1]
        assert loaded[lang][2] == model[lang][2]


def test_scoring_spec_by_hand():
    model = train_ppl_py([("xx", "abcabc")])
    tri, ctx, v = model["xx"]
    # events of "abcabc": abc bca cab abc -> tri {abc:2, bca:1, cab:1}
    assert tri == {"abc": 2, "bca": 1, "cab": 1}
    assert ctx == {"ab": 2, "bc": 1, "ca": 1}
    assert v == 3  # next chars {c, a, b}
    lp, n = logprob10_py("abc", "xx", model)
    assert n == 1
    assert lp == pytest.approx(
        math.log10((2 + PPL_ALPHA) / (2 + PPL_ALPHA * 3))
    )
    # unseen context: P = alpha / (0 + alpha*V) = 1/V
    lp_u, n_u = logprob10_py("zzz", "xx", model)
    assert n_u == 1
    assert lp_u == pytest.approx(math.log10(1.0 / 3))
    # no events / unknown lang -> None
    assert perplexity_py("ab", "xx", model) is None
    assert perplexity_py("abcdef", "nope", model) is None


def test_with_perplexity_matches_spec(spark):
    model = default_ppl_model()
    rows = [
        ("the house of the world", "en"),
        ("der welt haus und wasser", "de"),
        ("qxjz vkwpq zzzz xqxq jjjj", "en"),
        ("ab", "en"),
    ]
    df = spark.createDataFrame(rows, "text string, lang string")
    got = {
        (r["text"]): r["perplexity"]
        for r in with_perplexity(df, spark, "lang", "text").collect()
    }
    for text, lang in rows:
        want = perplexity_py(text, lang, model)
        if want is None:
            assert got[text] is None
        else:
            assert got[text] == pytest.approx(want, rel=1e-12)


def test_quality_separation_and_rule():
    """Clean fixture prose stays under its LANGUAGE'S calibrated
    threshold (perplexity.ppl_thresholds_for — per-language because
    char-trigram entropy differs by script); the perplexed stratum
    scores over it; py_label_page drops it with rule id 'perplexity'
    and never scores docs an earlier rule dropped."""
    from hyperpolyglot_spark.functions.perplexity import (
        default_ppl_model,
        ppl_thresholds_for,
    )

    thr = ppl_thresholds_for(default_ppl_model())
    n_ppl_drops = 0
    for i in range(400):
        r = gen_page(i)
        row = py_label_page(r["url"], r["html"])
        t = thr.get(row["lang_pred"], MAX_PPL)
        if row["keep"]:
            assert row["perplexity"] is not None
            assert row["perplexity"] <= t
        elif row["drop_rule"] == "perplexity":
            n_ppl_drops += 1
            assert row["perplexity"] > t
            assert row["scrubbed_text"] is None
        else:
            # early-exit X5: LM never scored docs cheap rules dropped
            assert row["perplexity"] is None
    assert n_ppl_drops >= 5


def test_thresholds_are_per_language_and_ordered():
    """Latin thresholds sit near the old global cutoff; spaceless-CJK
    thresholds are an order of magnitude higher — the calibration that
    keeps clean zh/ja prose (pre-fix: 100% of it was ppl-dropped)."""
    from hyperpolyglot_spark.functions.perplexity import (
        default_ppl_model,
        ppl_thresholds_for,
    )

    thr = ppl_thresholds_for(default_ppl_model())
    for lang in ("en", "de", "fr", "ru", "ar"):
        assert 5.0 < thr[lang] < 15.0, (lang, thr[lang])
    assert thr["zh"] > 30 and thr["ja"] > 25
    assert thr["zh"] > 3 * thr["en"]


def test_pipeline_emits_perplexity_metrics(spark):
    from hyperpolyglot_spark.plans.pipeline import metrics, run_pipeline

    pages = spark.createDataFrame(gen_pages_pdf(300))
    labels = run_pipeline(spark, pages)
    m = metrics(labels)
    rules = {r["drop_rule"] for r in m.select("drop_rule").distinct().collect()}
    assert "perplexity" in rules
    from hyperpolyglot_spark.functions.perplexity import (
        default_ppl_model,
        ppl_thresholds_for,
    )

    max_thr = max(ppl_thresholds_for(default_ppl_model()).values())
    kept_ppl = labels.filter(F.col("keep")).agg(F.max("perplexity")).collect()[0][0]
    assert kept_ppl is not None and kept_ppl <= max_thr


def test_threshold_cache_is_identity_checked():
    """ADVICE r3: id() reuse after GC must not serve another model's
    thresholds — the cache stores the model ref and re-checks identity."""
    from hyperpolyglot_spark.functions import perplexity as P

    m1 = P.train_ppl_py([("en", "the cat sat on the mat again and again")])
    t1 = P.ppl_thresholds_for(m1)
    # forge a stale entry under a key that a NEW model will collide with
    m2 = P.train_ppl_py([("en", "a completely different training text")])
    P._THRESHOLD_CACHE[id(m2)] = (m1, {"en": -1.0})
    got = P.ppl_thresholds_for(m2)
    assert got != {"en": -1.0}  # identity check rejected the stale hit
    assert P._THRESHOLD_CACHE[id(m2)][0] is m2
    assert P.ppl_thresholds_for(m1) == t1
