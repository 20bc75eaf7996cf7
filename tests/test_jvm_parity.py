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


def test_rule_engine_contexts_in_cascade(spark):
    """The ordered combinator rule tables now drive stage 4: exact
    candidate-set contexts dispatch to And/Or/Negative rule ladders in
    BOTH the py spec and the column form (parity), and the fixture
    corpus exercises them (strategy == 'heuristics')."""
    cases = [
        # .ch -> {de,fr,it}: swiss table; de rule is And(+und, -het)
        ("https://site1.example.ch/p1", "alles und nichts hier", None, "de"),
        # de rule blocked by Negative(het) -> fr rule fires
        ("https://site1.example.ch/p2", "und het les amis dans", None, "fr"),
        # .fi -> {fi,sv}: fi word wins
        ("https://site1.example.fi/p3", "se on hyvä että tulit", None, "fi"),
        # .fi with swedish text -> sv
        ("https://site1.example.fi/p4", "det är bra och fint", None, "sv"),
        # .in -> {hi,en}: devanagari script rule
        ("https://site1.example.in/p5", "यह है एक परीक्षण", None, "hi"),
        ("https://site1.example.in/p6", "the test with words", None, "en"),
        # meta 'cjk' + neutral tld: kana -> ja, hangul -> ko, else zh
        ("https://site1.example.com/p7", "これ は てすと です", "cjk", "ja"),
        ("https://site1.example.com/p8", "이 것 은 테스트", "cjk", "ko"),
        ("https://site1.example.com/p9", "这是的测试没有空格", "cjk", "zh"),
        # meta 'scandinavian': da And(+og/af, -och)
        ("https://site1.example.com/p10", "det er og af huset", "scandinavian", "da"),
        ("https://site1.example.com/p11", "det och är huset", "scandinavian", "sv"),
    ]
    rows = [
        {"url": u, "extracted_text": t, "meta_tag": m}
        for u, t, m, _ in cases
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["url"]: (r["lang_pred"], r["strategy"])
        for r in with_cascade(df, spark, text_col="extracted_text").collect()
    }
    for u, t, m, want_lang in cases:
        spec = detect_lang_py(u, t, m)
        assert got[u] == spec, (u, got[u], spec)
        assert got[u][0] == want_lang, (u, got[u], want_lang)
        assert got[u][1] == "heuristics", (u, got[u])


def test_fixture_corpus_exercises_rule_contexts(spark):
    """At 24 languages the generated corpus must hit the heuristics
    stage through at least one combinator context."""
    from hyperpolyglot_spark.functions.rules import RULE_CONTEXTS
    from hyperpolyglot_spark.functions.metadata import (
        meta_lang_candidates,
        tld_candidates,
        url_hint_lang,
        filter_candidates,
    )
    from hyperpolyglot_spark.functions.extract import extract_text, meta_lang_tag

    hit = 0
    for i in range(400):
        r = gen_page(i)
        if url_hint_lang(r["url"]) is not None:
            continue
        cands = tld_candidates(r["url"])
        if len(cands) == 1:
            continue
        meta = meta_lang_tag(r["html"])
        cands = filter_candidates(cands, meta_lang_candidates(meta))
        if frozenset(cands) in RULE_CONTEXTS:
            hit += 1
    assert hit >= 5, hit


def test_round3_rule_contexts_parity(spark):
    """Round-3 breadth contexts: each case must resolve at the
    heuristics stage to the expected language, identically in the py
    spec and the column ladder."""
    cases = [
        # dano: 'af' -> da, 'av' without 'af' -> no
        ("https://s.example.com/p1", "det er og af huset", "dano", "da"),
        ("https://s.example.com/p2", "det er av huset fra", "dano", "no"),
        # czechoslovak
        ("https://site1.example.sk/p3", "to je pretože sa robí aj", None, "sk"),
        ("https://site1.example.sk/p4", "to se dělá protože ano", None, "cs"),
        # balkan via meta: cyrillic -> sr, latin markers -> hr
        ("https://s.example.com/p5", "ово је питање за владу", "balkan", "sr"),
        ("https://s.example.com/p6", "to je pitanje jer kao što", "balkan", "hr"),
        # east slavic via .ua TLD: ї -> uk, ы -> ru
        ("https://site1.example.ua/p7", "це питання їжі та мови", None, "uk"),
        ("https://site1.example.ua/p8", "это вопрос языка и рынка", None, "ru"),
        # bulgarian vs macedonian via meta
        ("https://s.example.com/p9", "въпрос за държавата и пазара", "balkanslavic", "bg"),
        ("https://s.example.com/p10", "прашање за луѓето и јазикот", "balkanslavic", "mk"),
        # baltic via meta: ė/ų/į -> lt, ņ/ļ/ķ -> lv
        ("https://s.example.com/p11", "klausimas į žmonės ir kalbą", "baltic", "lt"),
        ("https://s.example.com/p12", "jautājums par valdību un ķīmiju", "baltic", "lv"),
        # malay vs indonesian via meta
        ("https://s.example.com/p13", "soalan kerana kerajaan di bandar", "malay", "ms"),
        ("https://s.example.com/p14", "pertanyaan karena pemerintah di kota", "malay", "id"),
        # .in ccTLD full india8 context: scripts decide
        ("https://site1.example.in/p15", "இது ஒரு கேள்வி மொழி", None, "ta"),
        ("https://site1.example.in/p16", "ఇది ఒక ప్రశ్న భాష", None, "te"),
        ("https://site1.example.in/p17", "ഇത് ഒരു ചോദ്യം ഭാഷ", None, "ml"),
        ("https://site1.example.in/p18", "এটা একটি প্রশ্ন ভাষা", None, "bn"),
        ("https://site1.example.in/p19", "आहे आणि मध्ये प्रश्न", None, "mr"),
        ("https://site1.example.in/p20", "यह है और में प्रश्न", None, "hi"),
        # turkic: ə -> az
        ("https://s.example.com/p21", "bu şəhər üçün sual", "turkic", "az"),
        ("https://s.example.com/p22", "bu şehir için soru ve cevap", "turkic", "tr"),
        # afrikaans vs dutch: 'n decides
        ("https://s.example.com/p23", "dit is 'n vraag oor taal", "kaaps", "af"),
        ("https://s.example.com/p24", "dit is een vraag het niet", "kaaps", "nl"),
        # hebrew vs arabic script split
        ("https://s.example.com/p25", "זו שאלה על שפה ועל זמן", "levantine", "he"),
        ("https://s.example.com/p26", "هذا سؤال في اللغة من السوق", "levantine", "ar"),
        # iberia 3-way
        ("https://s.example.com/p27", "és una pregunta amb els nens", "iberia", "ca"),
        ("https://s.example.com/p28", "é unha pregunta para a xente", "iberia", "gl"),
        ("https://s.example.com/p29", "es una pregunta porque los niños", "iberia", "es"),
    ]
    from hyperpolyglot_spark.operators.cascade import detect_lang_py, with_cascade

    rows = [
        {"url": u, "extracted_text": t, "meta_tag": m}
        for u, t, m, _ in cases
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["url"]: (r["lang_pred"], r["strategy"])
        for r in with_cascade(df, spark, text_col="extracted_text").collect()
    }
    for u, t, m, want_lang in cases:
        spec = detect_lang_py(u, t, m)
        assert got[u] == spec, (u, got[u], spec)
        assert got[u] == (want_lang, "heuristics"), (u, got[u], want_lang)


def test_jvm_canonical_url_matches_spec(spark):
    """canonical_url_col (Spark dialect: $1 group refs, backslash-escaped
    literals) must agree with the pure-Python spec char-for-char — the
    DuckDB side has its own parity test in test_spec_functions."""
    from hyperpolyglot_spark.functions.urltools import (
        canonical_url_col,
        py_canonical_url,
    )

    cases = [
        "HTTPS://WWW.Site.COM:443/articles//42/?utm_source=feed&ref=rss#top",
        "https://www.site.com/articles/42?id=7&utm_medium=email&x=1",
        "http://host.org:80/a//b///c/",
        "https://a.com/p?utm_a=1&b=2",
        "https://a.com/p?utm_a=1&utm_b=2&c=3",
        "https://a.com/p?utm_a=1&utm_b=2",
        "https://a.com/p?next=https://b//x",
        "https://a.com/p?q=a/",
        "https://a.com//p//q/?r=1",
        "https://a.com/p&b=2",
        "https://www.site.com/",
        "https://www.site.com",
        "",
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["canon"]
        for r in df.withColumn("canon", canonical_url_col("url")).collect()
    }
    for u in cases:
        assert got[u] == py_canonical_url(u), (u, got[u], py_canonical_url(u))
