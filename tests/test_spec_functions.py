"""Unit tests for the pure-Python spec functions (oracle mode) —
mirrors the reference's per-operator inline tests (SURVEY.md §5.1)."""

import pytest

from hyperpolyglot_spark.functions.extract import (
    extract_text,
    meta_lang_tag,
    truncate_to_char_boundary,
)
from hyperpolyglot_spark.functions.langid import (
    classify_py,
    default_model,
    text_grams,
    train_py,
    training_corpus,
)
from hyperpolyglot_spark.functions.metadata import (
    filter_candidates,
    meta_lang_candidates,
    tld_candidates,
    tld_of,
    url_hint_lang,
    url_host,
)
from hyperpolyglot_spark.functions.quality import py_keep_drop, py_signals
from hyperpolyglot_spark.functions.scrub import py_scrub


# --- filter_candidates: exact src/lib.rs:434-472 semantics -----------
def test_filter_candidates_empty_prev():
    assert filter_candidates([], ["a", "b"]) == ["a", "b"]


def test_filter_candidates_empty_new():
    assert filter_candidates(["a", "b"], []) == ["a", "b"]


def test_filter_candidates_no_overlap_keeps_prev():
    assert filter_candidates(["a", "b"], ["c", "d"]) == ["a", "b"]


def test_filter_candidates_overlap_keeps_prev_order():
    assert filter_candidates(["a", "b", "c"], ["c", "b"]) == ["b", "c"]


# --- url metadata (P1/P2 analogs) -------------------------------------
def test_url_host_and_tld():
    assert url_host("https://www.example.co.uk/x") == "www.example.co.uk"
    assert tld_of("www.example.co.uk") == "uk"
    assert tld_of("foo.com") is None
    # longest-known-suffix scan (compound extension analog)
    assert tld_candidates("https://a.b.ch/page") == ["de", "fr", "it"]
    assert tld_candidates("http://x.cn/") == ["zh"]
    assert tld_candidates("http://x.io/") == []


def test_url_hint_lang():
    assert url_hint_lang("https://site.com/de/artikel") == "de"
    assert url_hint_lang("https://site.com/blog/EN-US/x") == "en"
    assert url_hint_lang("https://site.com/blog/post") is None


def test_meta_lang_candidates():
    assert meta_lang_candidates("en") == ["en"]
    assert meta_lang_candidates("pt-BR".lower()) == ["pt"]
    assert meta_lang_candidates("iberian") == ["es", "pt"]
    assert meta_lang_candidates("en-us-x-mtfrom") == ["en"]
    assert meta_lang_candidates("xx") == []
    assert meta_lang_candidates(None) == []


# --- extraction (byte-identical invariant helpers) --------------------
def test_extract_strips_boilerplate():
    html = (
        b"<html lang='de'><head><style>p{}</style></head><body>"
        b"<nav>Home | About</nav><!-- hidden -->"
        b"<script>var x=1;</script><p>Guten&nbsp;Tag &amp; hallo</p>"
        b"<footer>(c) 2024</footer></body></html>"
    )
    assert extract_text(html) == "Guten Tag & hallo"
    assert meta_lang_tag(html) == "de"


def test_extract_invalid_utf8_policy():
    # decode errors="replace" is THE policy (extract.py docstring)
    assert extract_text(b"<p>ok \xff\xfe</p>") == "ok ��"


def test_truncate_char_boundary():
    s = "a" * 51199 + "京"  # 3-byte char straddling the cap
    out = truncate_to_char_boundary(s, 51200)
    assert out == "a" * 51199
    assert truncate_to_char_boundary("abc", 51200) == "abc"
    assert truncate_to_char_boundary("京" * 3, 4) == "京"


def test_entity_no_double_decode():
    assert extract_text(b"<p>&amp;lt;</p>") == "&lt;"


# --- quality signals + rules ------------------------------------------
GOOD_EN = (
    "the house and the water in the world is that people of the time "
    "for on this market are the children with music at language between "
    "because through country the question answer morning network village "
    "weather mountain library the of and to in is it that was for on are"
) * 2


def test_keep_good_doc():
    keep, rule = py_keep_drop(GOOD_EN)
    assert keep and rule is None


def test_too_short():
    assert py_keep_drop("tiny doc") == (False, "too_short")


def test_symbol_ratio_drop():
    text = "@@@ ###" * 60
    keep, rule = py_keep_drop(text)
    assert (keep, rule) == (False, "symbol_ratio")


def test_repetition_drop():
    text = "the same words again " * 40
    keep, rule = py_keep_drop(text)
    assert (keep, rule) == (False, "repetition")


def test_stopword_density_drop():
    # varied gibberish (no repeated 3-grams) with zero stopwords
    words = [f"zx{i}qv{i * 7}" for i in range(80)]
    text = " ".join(words)
    assert len(text) >= 200
    keep, rule = py_keep_drop(text)
    assert (keep, rule) == (False, "stopword_density")


def test_vendor_url_drop_precedes_all():
    keep, rule = py_keep_drop("tiny", url="https://x.com/ads/page?utm_source=a")
    assert (keep, rule) == (False, "url_blocklist")


def test_signals_values():
    sig = py_signals("ab cd!")
    assert sig["n_chars"] == 6.0
    assert sig["n_words"] == 2.0
    assert sig["symbol_ratio"] == pytest.approx(1 / 6)
    assert sig["rep3_ratio"] == 0.0


# --- scrub -------------------------------------------------------------
def test_scrub_patterns():
    text = (
        "mail bob@example.com or +1 555-123-4567, server 10.0.0.1, "
        "ssn 123-45-6789, card 4111 1111 1111 1111, what the frak"
    )
    scrubbed, counts = py_scrub(text)
    assert "<EMAIL>" in scrubbed and "<PHONE>" in scrubbed
    assert "<IP>" in scrubbed and "<SSN>" in scrubbed
    assert "<CARD>" in scrubbed and "<TOXIC>" in scrubbed
    assert counts["email"] == 1 and counts["toxicity"] == 1
    assert "bob@example.com" not in scrubbed


def test_scrub_idempotent_on_clean():
    s, counts = py_scrub("nothing personal here")
    assert s == "nothing personal here"
    assert all(v == 0 for v in counts.values())


# --- langid classifier --------------------------------------------------
def test_classifier_accuracy_on_corpus():
    """Golden-corpus accuracy == 1.0 (reference lib.rs:386-432 requires
    accuracy 1.0 on samples/; train==eval like the reference)."""
    model = default_model()
    corpus = training_corpus(docs_per_lang=10, seed=777)  # fresh draws
    correct = sum(
        1 for lang, text in corpus if classify_py(text, None, model) == lang
    )
    assert correct / len(corpus) == 1.0


def test_classifier_candidate_restriction():
    model = default_model()
    de_text = "der die und das ist von mit den nicht ein haus wasser"
    assert classify_py(de_text, ["fr", "de"], model) == "de"
    # restricted away from truth -> best among candidates, not 'de'
    assert classify_py(de_text, ["fr", "it"], model) in ("fr", "it")


def test_classifier_stable_tie_break():
    # unknown grams everywhere -> all candidates tie at default logprob;
    # earlier candidate must win (classifier.rs:42-48 stable sort)
    model = {"aa": {}, "bb": {}}
    assert classify_py("qqqq", ["bb", "aa"], model) == "bb"
    # language missing from model -> -inf, never wins over a known one
    assert classify_py("qqqq", ["zz", "aa"], model) == "aa"


def test_classifier_empty_candidates_scores_all():
    model = default_model()
    assert classify_py("的是了在和有这就不人", [], model) == "zh"


def test_text_grams_bounded():
    grams = text_grams("x" * 10_000)
    assert len(grams) == 2000 - 2  # MAX_SCORE_CHARS cap


def test_train_py_logprobs_normalize():
    import math

    model = train_py([("xx", "abcabc")])
    total = sum(math.exp(p) for p in model["xx"].values())
    assert total == pytest.approx(1.0)


def test_char_mask_parity_with_regex():
    """The mask fast path (quality.char_mask / alpha_mask) must agree
    with the spec regexes char-for-char on adversarial inputs: every
    known-script boundary, unicode whitespace (NEL, NBSP, ideographic
    space), astral symbols (emoji), and combining marks."""
    from hyperpolyglot_spark.functions.quality import (
        _HANGUL_ANY_RE,
        _SPACELESS_RE,
        _SYMBOL_RE,
        _scan_counts,
        alpha_mask,
        text_codes,
    )

    samples = [
        "hello world 123",
        "@@@ ### !!! $$$",
        "中文没有空格的文本还有〱〒〓",  # cjk + cjk symbols
        "한국어 조사 테스트 에서",
        "mixed 中文 and ascii ᏣᎳᎩ plus    　 spaces",
        "emoji 😀🎉🚀 and astral 𐐔𐐯𐑅",
        "\x85\x1c\x1d\x1e\x1f edge whitespace-ish controls",
        "combining á ë marks ก้ไทย",
        "ÀàʯḀỿͰϿЀӿ԰֏֐׿؀ۿ boundary letters",
        "",
    ]
    for t in samples:
        want = (
            len(_SYMBOL_RE.findall(t)),
            len(_SPACELESS_RE.findall(t)),
            _HANGUL_ANY_RE.search(t) is not None,
        )
        assert _scan_counts(t) == want, t
        codes = text_codes(t)
        assert int(alpha_mask()[codes].sum()) == sum(c.isalpha() for c in t), t


def test_scrub_broadened_patterns():
    """Round-4 production-set widening: IBAN, parenthesized phone,
    IPv6, street-address shapes, and two added toxicity lexicon
    classes — ordered rewrites with per-pattern counts, exact-
    implication guards, and sequential-order guarantees (iban before
    credit_card so an IBAN's digit groups are never half-eaten)."""
    from hyperpolyglot_spark.functions.scrub import SCRUB_NAMES, py_scrub

    s, c = py_scrub("wire DE44 5001 0517 5407 3249 31 today")
    assert "<IBAN>" in s and c["iban"] == 1 and c["credit_card"] == 0
    s, c = py_scrub("office line (212) 555-0143 after lunch")
    assert "<PHONE>" in s and c["phone_paren"] == 1
    s, c = py_scrub("node 2001:0db8:85a3:0000:8a2e:0370:7334 down")
    assert "<IP6>" in s and c["ipv6"] == 1 and c["ipv4"] == 0
    # compressed :: forms (the overwhelmingly common rendering)
    s, c = py_scrub("hosts 2001:db8::1 and fe80::8a2e:370:7334 up")
    assert s == "hosts <IP6> and <IP6> up" and c["ipv6"] == 2
    s, c = py_scrub("loopback ::1 pings; prefix 2001:db8:: reserved")
    assert s == "loopback <IP6> pings; prefix <IP6> reserved"
    assert c["ipv6"] == 2
    # c++ scope operators / short non-hex words don't trip it
    s, c = py_scrub("call std::sort or boost::asio now")
    assert c["ipv6"] == 0 and "<IP6>" not in s
    # r6 ADVICE: hex-looking identifiers around '::' are code, not
    # addresses — compressed branches need >=2 hextet groups or a
    # digit in the leading/first hextet
    for t in ("the DB::Fetch call", "a::b in perl", "use dead:: now",
              "fe:: token", "Acc::count", "mod a::b::c here"):
        s, c = py_scrub(t)
        assert s == t and c["ipv6"] == 0, (t, s)
    s, c = py_scrub("route ::dead:beef added")  # 2 groups after ::
    assert s == "route <IP6> added" and c["ipv6"] == 1
    s, c = py_scrub("cell ::10ab:cd here")  # longest match, not ::10ab
    assert s == "cell <IP6> here" and c["ipv6"] == 1
    s, c = py_scrub("ship to 742 Evergreen Terrace and 12 Baker Street")
    assert s.count("<ADDR>") == 2 and c["address"] == 2
    s, c = py_scrub("that Clanker and its meatbags, I will airlock you")
    assert c["toxicity_slur"] == 2 and c["toxicity_threat"] == 1
    # times and decimals are not addresses/ips/ipv6
    s, c = py_scrub("meet at 12:30, pi is 3.14, room 4 floor 2")
    assert s == "meet at 12:30, pi is 3.14, room 4 floor 2"
    assert all(v == 0 for v in c.values())
    assert len(SCRUB_NAMES) == 12


def test_fused_toxicity_equals_sequential():
    """py_scrub fuses the three toxicity classes into one combined
    scan; output must equal the literal sequential per-class rewrites
    the table (and the generated DuckDB oracle) describes."""
    from hyperpolyglot_spark.functions.scrub import _COMPILED, py_scrub

    def sequential(text):
        counts = {}
        for name, rx, rep in _COMPILED:
            text, n = rx.subn(rep, text)
            counts[name] = n
        return text, counts

    cases = [
        "what the frak is this gorram clanker, i will airlock you",
        "FRAKKING meatbags and mudbloods, vape them all",
        "frag you and frag them, frakking clankers",
        "I will vaping them because airlocking you failed",
        "frak@example.com carries a stem inside an email",
        "clean text with none of it",
        "wire DE44 5001 0517 5407 3249 31 to the gorram smeg bank",
    ]
    for t in cases:
        assert py_scrub(t) == sequential(t), t


def test_canonical_url_py_vs_duckdb():
    """The canonicalization expression is generated for both engines
    from one step table — pin cross-engine parity on adversarial urls."""
    import duckdb

    from hyperpolyglot_spark.functions.urltools import (
        canonical_url_sql,
        py_canonical_url,
    )

    cases = [
        "HTTPS://WWW.Site.COM:443/articles//42/?utm_source=feed&ref=rss#top",
        "https://www.site.com/articles/42?id=7&utm_medium=email&x=1",
        "http://host.org:80/a//b///c/",
        "relative/path?utm_source=x",
        "https://h.io/p?utm_a=1&utm_b=2&utm_c=3",
        "https://h.io/p?a=1&ref=x&b=2",
        "https://h.io/p?ref=x#f",
        "https://CASE.Sensitive.Path.COM/Articles/Keep/Case",
        "ftp://Weird.Scheme.ORG:443/x",
        "https://www.site.com/",
        "https://www.site.com",
        "",
        # leading tracking param followed by a real param (the
        # delimiter-consumption bug class)
        "https://a.com/p?utm_a=1&b=2",
        "https://a.com/p?utm_a=1&utm_b=2&c=3",
        "https://a.com/p?utm_a=1&utm_b=2",
        # query content is opaque: embedded urls / trailing slash in a
        # value must survive; slashes collapse in the PATH only
        "https://a.com/p?next=https://b//x",
        "https://a.com/p?next=https:/b/x",
        "https://a.com/p?q=a/",
        "https://a.com//p//q/?r=1",
        # literal '&' in a path must NOT merge with a query form
        "https://a.com/p&b=2",
    ]
    con = duckdb.connect()
    sql = canonical_url_sql("u")
    for c in cases:
        got = con.execute(f"SELECT {sql} FROM (SELECT ? AS u)", [c]).fetchone()[0]
        assert got == py_canonical_url(c), c


def test_canonical_url_semantics():
    from hyperpolyglot_spark.functions.urltools import py_canonical_url as cu

    # authority lowercased, path case preserved
    assert cu("HTTPS://A.B/Path/Case") == "https://a.b/Path/Case"
    # default ports dropped, non-default kept
    assert cu("https://a.b:443/x") == "https://a.b/x"
    assert cu("https://a.b:8443/x") == "https://a.b:8443/x"
    # real params survive in order, tracking removed anywhere
    assert cu("https://a.b/x?p=1&utm_c=2&q=3") == "https://a.b/x?p=1&q=3"
    # bare root slash kept
    assert cu("https://a.b/") == "https://a.b/"
    # LEADING tracking param: the next real param takes over the '?'
    assert cu("https://a.b/p?utm_a=1&b=2") == "https://a.b/p?b=2"
    assert cu("https://a.b/p?utm_a=1&utm_b=2&c=3") == "https://a.b/p?c=3"
    assert cu("https://a.b/p?utm_a=1&utm_b=2") == "https://a.b/p"
    # ...and a literal '&' path stays distinct from the query form
    assert cu("https://a.b/p&b=2") == "https://a.b/p&b=2"
    # slash handling is PATH-only: query values keep their slashes
    assert cu("https://a.b/p?next=https://c//x") == "https://a.b/p?next=https://c//x"
    assert cu("https://a.b/p?q=a/") == "https://a.b/p?q=a/"
    assert cu("https://a.b//p//q/?r=1") == "https://a.b/p/q?r=1"


def test_dedupe_lines_spec():
    """C4-style within-doc duplicate-line removal: first occurrence
    wins, order preserved, count exact (functions/textclean.py)."""
    from hyperpolyglot_spark.functions.textclean import py_dedupe_lines

    assert py_dedupe_lines("a\nb\na\nc\nb") == ("a\nb\nc", 2)
    assert py_dedupe_lines("x") == ("x", 0)
    assert py_dedupe_lines("") == ("", 0)
    assert py_dedupe_lines("x\nx\nx") == ("x", 2)
    # empty lines are lines too: repeated blank lines collapse
    assert py_dedupe_lines("a\n\nb\n\nc") == ("a\n\nb\nc", 1)


def test_rate_threshold_zero_keeps_nothing():
    """ADVICE r6: rate<=0 must keep NOTHING. The old '00000000'
    threshold leaked rows whose 8-hex md5 prefix was exactly zero
    through the <= comparison (p=2^-32/row — hundreds of rows at
    10^12-doc scale). The empty-string threshold sorts before every
    hex hash in Python, Spark, and DuckDB collation alike."""
    import duckdb

    from hyperpolyglot_spark.operators.mixing import rate_threshold_hex

    assert rate_threshold_hex(0.0) == ""
    assert rate_threshold_hex(-1.0) == ""
    # unchanged for in-range rates (oracle SQL text stability)
    assert rate_threshold_hex(0.25) == f"{int(0.25 * 0xFFFFFFFF):08x}"
    assert rate_threshold_hex(1.0) == "ffffffff"
    # the adversarial row: an 8-hex prefix of exactly 00000000
    assert not ("00000000" <= rate_threshold_hex(0.0))
    assert duckdb.sql("SELECT '00000000' <= ''").fetchone()[0] is False
