"""Quality signals + ordered keep/drop rules (heuristic rule engine).

This is the web-text generalization of the reference's heuristic rule
engine (src/detectors/heuristics.rs:46-72): an ORDERED rule list where
the first matching rule decides (drop + rule id), and a pattern-less
default (keep) at the end. Cheap rules run first so expensive stages
never see dropped docs (the `.h -> C` classifier-dodge trick,
codegen.rs:329-336 / README.md:76-83, generalized — SURVEY.md §4 X5).

Two implementations with identical semantics, tested for parity:
  - py_signals/py_keep_drop: pure-Python spec (oracle mode).
  - with_quality_signals/with_keep_drop: Spark column expressions —
    built-ins only, whole-stage-codegen'd, no Python in the hot path.

Word split spec: ASCII-whitespace runs (both sides operate on
extraction output, which collapses all whitespace to single spaces).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .langdata import ALL_STOPWORDS
from .langid import NORM_FROM, NORM_TO, normalize_scoring_text

# Letter ranges of every script in the language universe (the 26
# scripts). Shared by the symbol class below (negated: anything not a
# known letter/digit/space is a "symbol") and by langid's unknown-
# script gate (positive: a doc whose letters mostly fall OUTSIDE these
# ranges has zero candidate languages). Same literals compile under
# Python re, Java regex, and RE2/DuckDB.
LETTER_RANGES = (
    "À-ʯ"  # latin-1 supplement + extended A/B + IPA (ə, hausa ɓɗ)
    "Ͱ-Ͽ"  # greek
    "Ѐ-ӿ"  # cyrillic
    "԰-֏"  # armenian
    "֐-׿"  # hebrew
    "؀-ۿ"  # arabic
    "ऀ-ॿ"  # devanagari
    "ঀ-৿"  # bengali
    "਀-੿"  # gurmukhi
    "઀-૿"  # gujarati
    "଀-୿"  # odia
    "஀-௿"  # tamil
    "ఀ-౿"  # telugu
    "ಀ-೿"  # kannada
    "ഀ-ൿ"  # malayalam
    "඀-෿"  # sinhala
    "฀-๿"  # thai
    "຀-໿"  # lao
    "ༀ-࿿"  # tibetan
    "က-႟"  # myanmar
    "Ⴀ-ჿ"  # georgian
    "ሀ-፿"  # ethiopic
    "ក-៿"  # khmer
    "Ḁ-ỿ"  # latin extended additional (vietnamese, yoruba/igbo dots)
    "぀-ヿ"  # hiragana + katakana
    "一-鿿"  # cjk unified ideographs
    "가-힯"  # hangul syllables
    "ᄀ-ᇿ"  # hangul conjoining jamo (decomposed korean)
    "㄰-㆏"  # hangul compatibility jamo
)
# Chars that count as "symbols": not alnum, not whitespace, and not a
# letter of any known script.
_SYMBOL_CLASS = "[^A-Za-z0-9\\s" + LETTER_RANGES + "]"
# Positive form: a letter of SOME known script (ascii letters + the
# shared ranges). Consumed by langid's unknown-script gate.
KNOWN_LETTER_CLASS = "[A-Za-z" + LETTER_RANGES + "]"
_SYMBOL_RE = re.compile(_SYMBOL_CLASS)
_WS_SPLIT_RE = re.compile(r"[ \t\n\r\f\x0b]+")

# Scripts written WITHOUT spaces between words (han, kana, thai —
# hangul and vietnamese DO space). Word-based quality signals are
# meaningless for text dominated by these scripts: a 400-word zh doc is
# ~10 whitespace tokens, so stopword density reads ~0 and word-3-gram
# repetition reads ~0 regardless of content. Docs with
# spaceless_ratio > 0.5 get CHAR-based equivalents instead (the CCNet/
# Gopher-style CJK special-case every real web filter needs).
_SPACELESS_CLASS = "[぀-ヿ一-鿿฀-๿ក-៿຀-໿က-႟ༀ-࿿]"
_SPACELESS_RE = re.compile(_SPACELESS_CLASS)
SPACELESS_THRESHOLD = 0.5
_REP_CHAR_N = 3
_REP_CHAR_CAP = 2000

# Korean is SPACED but agglutinative: function morphemes (은/는/이/가/
# 를/에서/...) attach to content words, so real Korean prose has ~zero
# EXACT stopword-token matches (measured 0.015 on the real-text
# fixture). A hangul token ending in a common particle counts as a
# stop hit — same regex in Python re, Java rlike, and DuckDB RE2.
_HANGUL_PARTICLE_RE_S = (
    "[가-힯]+(?:는|은|이|가|를|을|의|에서|에게|에|으로|로|와|과|도|만"
    "|까지|부터|처럼|보다)$"
)
_HANGUL_PARTICLE_RE = re.compile(_HANGUL_PARTICLE_RE_S)
# doc-level gate for the per-word particle scan: the particle regex
# requires [가-힯]+, so a doc with no Hangul syllable can skip it
_HANGUL_ANY_RE = re.compile("[가-힯]")

# Vendor/boilerplate URL blocklist — the P3/P4 analog of the reference's
# ~120 vendored-path globs (src/filters/vendor.rs, documentation.rs),
# compiled to ONE regex alternation so it is a single pushed-down
# predicate. Java- and RE2-safe (no lookaround). Categories mirror the
# reference's: third-party asset dirs, minified bundles, tracking,
# admin/infra paths, and boilerplate/legal sections (the doc-filter
# analog).
_VENDOR_PATH_DIRS = (
    # ad/tracking infrastructure
    "ads?", "adserver", "adsense", "advert(?:s|ising)?", "banners?",
    "tracking", "trackers?", "analytics", "pixel", "beacons?",
    "doubleclick", "googletagmanager", "googleads", "adsbygoogle",
    "outbrain", "taboola", "criteo", "quantcast", "scorecardresearch",
    "chartbeat", "hotjar", "mouseflow", "crazyegg", "piwik", "matomo",
    "statcounter", "metrika",
    # CMS internals / admin
    "cdn-cgi", "wp-admin", "wp-includes", "wp-json", "xmlrpc",
    "wp-content/plugins", "wp-content/themes", "wp-content/cache",
    "typo3temp", "typo3conf", "bitrix", "administrator", "phpmyadmin",
    "umbraco", "sites/all/modules", "sites/default/files/js",
    "misc/jquery", "modules/contrib", "media/system", "media/jui",
    "skin/frontend", "js/mage", "pub/static", "static/version[0-9]*",
    # vendored assets
    "assets/vendor", "static/vendor", "node_modules", "bower_components",
    "third[_-]party", "vendor/bundles?", "dist/min", "min/js", "min/css",
    "cgi-bin", "__media__", "plesk-stat", "webstat", "awstats",
)
_TRACKING_PARAMS = (
    "utm_[a-z]+", "gclid", "fbclid", "mc_eid", "ref_src", "igshid",
    "msclkid", "dclid", "twclid", "yclid", "wbraid", "gbraid",
    "_hsenc", "_hsmi", "mkt_tok", "vero_id", "s_kwcid", "ncid",
)
_BOILERPLATE_SECTIONS = (
    "privacy-policy", "privacy_policy", "terms-of-service", "terms-of-use",
    "terms-and-conditions", "cookie-policy", "cookie-notice",
    "legal-notice", "impressum", "disclaimer", "unsubscribe",
    "login", "signin", "signup", "register", "password-reset",
    "forgot-password", "my-account", "account/settings", "order-history",
    "track-order", "cart", "checkout", "wishlist",
    "refund-policy", "return-policy", "shipping-policy",
    "accessibility-statement", "gdpr", "newsletter-signup",
    "print-preview", "under-construction", "coming-soon",
    "sitemap\\.xml", "robots\\.txt", "favicon\\.ico", "feed\\.xml",
    "rss\\.xml", "atom\\.xml", "opensearch\\.xml", "ads\\.txt",
    "humans\\.txt", "browserconfig\\.xml", "manifest\\.webmanifest",
)
_BOILERPLATE_FILES = (
    r"[^/]*\.min\.(?:js|css)", r"jquery[^/]*\.js", r"bootstrap[^/]*\.(?:js|css)",
    r"modernizr[^/]*\.js", r"gtag\.js", r"fbevents\.js", r"ga\.js",
    r"analytics\.js", r"piwik\.js", r"matomo\.js", r"hotjar[^/]*\.js",
    r"adsbygoogle\.js", r"beacon(?:\.min)?\.js", r"clarity\.js",
    r"plausible\.js", r"angular[^/]*\.js", r"react(?:-dom)?[^/]*\.js",
    r"vue[^/]*\.js", r"ember[^/]*\.js", r"backbone[^/]*\.js",
    r"underscore[^/]*\.js", r"lodash[^/]*\.js", r"prototype\.js",
    r"mootools[^/]*\.js", r"swfobject\.js", r"require[^/]*\.js",
    r"polyfill[^/]*\.js", r"webfont[^/]*\.js",
)
# ~120 vendor/boilerplate patterns (the vendor.rs:3-364 breadth analog)
# compiled into ONE alternation so the filter is a single pushed-down
# rlike predicate.
VENDOR_URL_RE = (
    "(?:/(?:" + "|".join(_VENDOR_PATH_DIRS) + ")/"
    "|[?&](?:" + "|".join(_TRACKING_PARAMS) + ")="
    "|/(?:" + "|".join(_BOILERPLATE_SECTIONS) + ")(?:/|$)"
    "|/(?:" + "|".join(_BOILERPLATE_FILES) + ")(?:$|[?#])"
    ")"
)
_VENDOR_URL_COMPILED = re.compile(VENDOR_URL_RE)

# --- thresholds (the ordered rule table) ------------------------------
MIN_CHARS = 200
# spaceless scripts carry ~2.5x information per char (each han char is
# a word): the length floor for spaceless-dominant docs is lower
MIN_CHARS_SPACELESS = 80
MAX_CHARS = 40_000
MAX_SYMBOL_RATIO = 0.30
MAX_REP3_RATIO = 0.50
MIN_STOPWORD_DENSITY = 0.05
# KenLM-style LM threshold: kept fixture prose scores ppl <= ~7 under
# the per-language char-3-gram LM; scrambled/word-salad text scores
# 20-50+ (measured, tests/test_perplexity.py pins the separation).
MAX_PPL = 10.0

# Char-trigram repetition threshold for spaceless docs: normal zh/ja
# prose has distinct-trigram ratio ~0.7-0.95 (rep ~0.05-0.3); a
# repeated phrase block collapses it (rep 0.9+). Measured on the
# fixture strata (tests/test_spec_functions.py).
MAX_REP_CHAR_RATIO = 0.60

# (rule_id, signal, op) — order IS the spec (first match wins).
# The *_gated signals are NULL/None for the script class where the
# word-based form is meaningless (see _SPACELESS_CLASS above); a NULL
# signal never fires its rule, so each rule applies exactly to the
# script class it measures.
RULES: tuple[tuple[str, str, str, float], ...] = (
    ("url_blocklist", "is_vendor_url", ">=", 1.0),
    ("too_short", "n_chars_gated", "<", float(MIN_CHARS)),
    ("too_short_spaceless", "n_chars_spaceless_gated", "<", float(MIN_CHARS_SPACELESS)),
    ("too_long", "n_chars", ">", float(MAX_CHARS)),
    ("symbol_ratio", "symbol_ratio", ">", MAX_SYMBOL_RATIO),
    ("repetition", "rep3_gated", ">", MAX_REP3_RATIO),
    ("repetition_char", "rep_char_gated", ">", MAX_REP_CHAR_RATIO),
    ("stopword_density", "stop_density_gated", "<", MIN_STOPWORD_DENSITY),
)

# The perplexity rule is LAST by design (classifier-dodge economics,
# X5): the LM scores only docs every cheap rule already passed. It
# needs lang_pred, so it joins the table where the pipeline has both
# (plans/pipeline.py, RULES_WITH_PPL); a missing/None signal never
# fires a rule (a <3-char doc has no LM events).
PPL_RULE = ("perplexity", "perplexity", ">", MAX_PPL)
RULES_WITH_PPL: tuple[tuple[str, str, str, float], ...] = RULES + (PPL_RULE,)


# ======================================================================
# vectorized char-class scanning
# ======================================================================
# The per-doc Python floor's next lever (VERDICT r3 #7): replace the
# re-engine scans of single-char classes with one utf-32 decode plus
# boolean-mask gathers. Masks are built LAZILY, once per process, by
# running the SPEC regex over the full codepoint alphabet — parity with
# the regex path is by construction, and pinned by tests. ~1 MB per
# mask; only classes actually scanned get one.

_ALPHABET: str | None = None
_MASK_CACHE: dict[tuple[str, int], "object"] = {}
_ALPHA_MASK = None


def _alphabet() -> str:
    global _ALPHABET
    if _ALPHABET is None:
        import itertools

        _ALPHABET = "".join(
            map(chr, itertools.chain(range(0xD800), range(0xE000, 0x110000)))
        )
    return _ALPHABET


def char_mask(rx: "re.Pattern[str]"):
    """Boolean codepoint-lookup for a compiled single-char-class regex,
    derived from the regex itself (findall over the alphabet)."""
    import numpy as np

    key = (rx.pattern, rx.flags)
    got = _MASK_CACHE.get(key)
    if got is None:
        hit = "".join(rx.findall(_alphabet()))
        arr = np.zeros(0x110000, dtype=bool)
        if hit:
            arr[np.frombuffer(hit.encode("utf-32-le"), dtype="<u4")] = True
        _MASK_CACHE[key] = got = arr
    return got


def alpha_mask():
    """Codepoint lookup for str.isalpha (langid's letter counting)."""
    global _ALPHA_MASK
    if _ALPHA_MASK is None:
        import numpy as np

        a = _alphabet()
        m = np.zeros(0x110000, dtype=bool)
        hit = "".join(c for c in a if c.isalpha())
        m[np.frombuffer(hit.encode("utf-32-le"), dtype="<u4")] = True
        _ALPHA_MASK = m
    return _ALPHA_MASK


def text_codes(text: str):
    """Codepoint array of ``text``, or None when the text cannot be
    utf-32-encoded (lone surrogates — regex fallback path)."""
    import numpy as np

    try:
        return np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
    except UnicodeEncodeError:
        return None


def _scan_counts(text: str) -> tuple[int, int, bool]:
    """(n_symbols, n_spaceless, has_hangul) — mask fast path with the
    spec regexes as fallback; identical results either way."""
    codes = text_codes(text)
    if codes is None:
        return (
            len(_SYMBOL_RE.findall(text)),
            len(_SPACELESS_RE.findall(text)),
            _HANGUL_ANY_RE.search(text) is not None,
        )
    return (
        int(char_mask(_SYMBOL_RE)[codes].sum()),
        int(char_mask(_SPACELESS_RE)[codes].sum()),
        bool(char_mask(_HANGUL_ANY_RE)[codes].any()),
    )


# ======================================================================
# pure-Python spec (oracle mode)
# ======================================================================

# py_words fast path: extraction collapses all whitespace to single
# spaces, so pipeline text never contains the other four class chars —
# one C-level scan decides, and str.split(" ") + the existing
# empty-filter is exactly _WS_SPLIT_RE.split for such text (runs of
# spaces produce empty strings either way, and both are filtered).
_WS_OTHER_RE = re.compile(r"[\t\n\r\f\x0b]")


def py_words(text: str) -> list[str]:
    if _WS_OTHER_RE.search(text) is None:
        return [w for w in text.split(" ") if w]
    return [w for w in _WS_SPLIT_RE.split(text) if w]


def py_signals(text: str, url: str = "") -> dict[str, float]:
    # r6 noisy-encoding fix: quality signals normalize their input the
    # same way the scorers do (langid.normalize_scoring_text) — ZWSP-
    # littered / NBSP-spaced real prose otherwise fails stopword
    # density and word splitting (measured: 75/102 clean passages in
    # the noisy stratum wrongly dropped). The STORED text stays
    # byte-identical; only the signal computation normalizes.
    text = normalize_scoring_text(text)
    words = py_words(text)
    n_chars = len(text)
    n_words = len(words)
    n_sym, n_spaceless, has_hangul = _scan_counts(text)
    # distinct word-triples == distinct "a b c" strings (words contain
    # no whitespace); tuples avoid n_words string joins
    n_grams = max(0, n_words - 2)
    rep3 = (
        0.0
        if not n_grams
        else 1.0 - len(set(zip(words, words[1:], words[2:]))) / n_grams
    )
    # exact stopword match OR hangul-particle suffix (agglutinative ko).
    # The particle regex can only match words containing Hangul
    # syllables, so gate it on ONE doc-level scan; the common
    # (non-Korean) case is then a pure C-level map/sum pipeline.
    if not has_hangul:
        n_stop = sum(map(ALL_STOPWORDS.__contains__, map(str.lower, words)))
    else:
        lows = list(map(str.lower, words))
        n_stop = sum(map(ALL_STOPWORDS.__contains__, lows))
        search = _HANGUL_PARTICLE_RE.search
        n_stop += sum(
            1
            for w, lw in zip(words, lows)
            if lw not in ALL_STOPWORDS and search(w) is not None
        )
    spaceless_ratio = n_spaceless / max(1, n_chars)
    spaceless = spaceless_ratio > SPACELESS_THRESHOLD
    # char-trigram repetition over the capped text (the spaceless
    # analog of rep3) — computed ONLY for spaceless docs (it is None
    # outside its script class anyway, and the 2000-slice set build is
    # the kind of per-row cost the hot path must not pay for nothing)
    rep_char = None
    if spaceless:
        t = text[:_REP_CHAR_CAP]
        n_ctri = max(0, len(t) - _REP_CHAR_N + 1)
        rep_char = (
            0.0
            if not n_ctri
            else 1.0
            - len({t[i : i + _REP_CHAR_N] for i in range(n_ctri)}) / n_ctri
        )
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "symbol_ratio": n_sym / max(1, n_chars),
        "rep3_ratio": rep3,
        "stop_density": n_stop / max(1, n_words),
        "spaceless_ratio": spaceless_ratio,
        "n_chars_gated": None if spaceless else float(n_chars),
        "n_chars_spaceless_gated": float(n_chars) if spaceless else None,
        "rep3_gated": None if spaceless else rep3,
        "rep_char_gated": rep_char,
        "stop_density_gated": None if spaceless else n_stop / max(1, n_words),
        "is_vendor_url": 1.0 if _VENDOR_URL_COMPILED.search(url) else 0.0,
    }


def _cmp(val: float, op: str, thr: float) -> bool:
    if op == "<":
        return val < thr
    if op == ">":
        return val > thr
    if op == ">=":
        return val >= thr
    raise ValueError(op)


def py_keep_drop(
    text: str,
    url: str = "",
    signals: dict[str, float] | None = None,
    rules: tuple[tuple[str, str, str, float], ...] = RULES,
) -> tuple[bool, str | None]:
    """First-match-wins over ``rules``; no match -> keep (default rule).
    Pass precomputed ``signals`` to avoid recomputing them. A signal
    that is absent or None never fires its rule (SQL-null semantics,
    same as the column ladder)."""
    sig = signals if signals is not None else py_signals(text, url)
    for rule_id, signal, op, thr in rules:
        val = sig.get(signal)
        if val is not None and _cmp(val, op, thr):
            return False, rule_id
    return True, None


# ======================================================================
# Spark column expressions (the distributed implementation)
# ======================================================================

_STOP_ARRAY = None  # built lazily so import works without a session


def _stop_array() -> Column:
    """The stopword set as an ARRAY literal, consumed by array_intersect.

    NOT a map literal probed per word: Spark's GetMapValue on a literal
    map is a LINEAR key scan, so at 102 languages (~2.9k stopwords) a
    per-word probe cost 2.9k comparisons x words x rows — the 24->102
    widening made the ladder 4x slower. array_intersect instead builds
    one hash set per ROW (O(stops + words)), and per-word membership
    then scans only the <=dozens matched stopwords."""
    global _STOP_ARRAY
    if _STOP_ARRAY is None:
        _STOP_ARRAY = F.array(*[F.lit(w) for w in sorted(ALL_STOPWORDS)])
    return _STOP_ARRAY


def words_col(text: Column) -> Column:
    return F.filter(F.split(text, r"[ \t\n\r\f\x0B]+"), lambda w: w != "")


def with_quality_signals(
    df: DataFrame, text_col: str = "text", url_col: str | None = None
) -> DataFrame:
    """Append signal columns. Pure built-ins, no shuffle, no Python.

    Heavy intermediates (the words array, the 3-gram array) are
    materialized as real columns first so each is evaluated ONCE per
    row — expression trees passed to several downstream columns would
    otherwise be re-evaluated per reference (no CSE across projections
    for interpreted higher-order functions)."""
    # r6: same invisible-char normalization as py_signals. r07:
    # materialized as a real column — the inlined expression form was
    # re-evaluated by every consumer (the executed docs_keep_drop plan
    # carried 32 copies of translate(text), one per signal reference);
    # as a multiply-referenced non-cheap alias it survives
    # CollapseProject, so the translate now runs once per row.
    df = df.withColumn(
        "_t", F.translate(F.col(text_col), NORM_FROM, NORM_TO)
    )
    t = F.col("_t")
    df = df.withColumn("_w", words_col(t))
    nw = F.size("_w")
    # 3-grams as zipped word triples — three O(n) slices + one zip,
    # never a per-gram lambda. Distinct-triple count == distinct
    # "a b c" string count because words contain no whitespace.
    n3 = nw - F.lit(2)
    zip3 = F.arrays_zip(
        F.slice("_w", 1, n3), F.slice("_w", 2, n3), F.slice("_w", 3, n3)
    )
    rep3 = F.when(
        nw >= 3,
        1.0 - F.size(F.array_distinct(zip3)) / n3.cast("double"),
    ).otherwise(F.lit(0.0))
    n_chars = F.length(t)
    n_sym = n_chars - F.length(F.regexp_replace(t, _SYMBOL_CLASS, ""))
    # stopword hits with token multiplicity: intersect the lowered
    # words with the stopword set ONCE per row (hash set, not a
    # per-word linear probe), then count words in the (small) matched
    # array. The per-word Hangul-particle rlike runs only for docs
    # that contain a Hangul syllable at all — same doc-level gate as
    # the python spec's fast path.
    df = df.withColumn("_lw", F.transform("_w", F.lower))
    df = df.withColumn(
        "_stopm", F.array_intersect(_stop_array(), F.col("_lw"))
    )
    stop_hits = F.when(
        t.rlike("[가-힯]"),
        F.size(
            F.filter(
                "_w",
                lambda x: F.array_contains(F.col("_stopm"), F.lower(x))
                | x.rlike(_HANGUL_PARTICLE_RE_S),
            )
        ),
    ).otherwise(
        F.size(
            F.filter("_lw", lambda x: F.array_contains(F.col("_stopm"), x))
        )
    )
    is_vendor = (
        F.col(url_col).rlike(VENDOR_URL_RE).cast("double")
        if url_col
        else F.lit(0.0)
    )
    n_spaceless = n_chars - F.length(
        F.regexp_replace(t, _SPACELESS_CLASS, "")
    )
    spaceless_ratio = (
        n_spaceless.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    )
    is_spaceless = spaceless_ratio > F.lit(SPACELESS_THRESHOLD)
    # char-trigram distinct ratio over the capped text: explode an int
    # sequence + substr (the exploded_grams trick) is for bulk aggs;
    # per-row a transform over <= 2000 elements is the right shape
    tc = F.substring(t, 1, _REP_CHAR_CAP)
    tclen = F.length(tc)
    n_ctri = F.greatest(tclen - F.lit(_REP_CHAR_N - 1), F.lit(0))
    ctri = F.when(
        tclen >= _REP_CHAR_N,
        F.transform(
            F.sequence(F.lit(1), tclen - F.lit(_REP_CHAR_N - 1)),
            lambda i: tc.substr(i, F.lit(_REP_CHAR_N)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rep_char = F.when(
        n_ctri > 0,
        1.0 - F.size(F.array_distinct(ctri)) / n_ctri.cast("double"),
    ).otherwise(F.lit(0.0))
    stop_density = stop_hits.cast("double") / F.greatest(
        F.size("_w"), F.lit(1)
    ).cast("double")
    null_d = F.lit(None).cast("double")
    return (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_words", F.size("_w").cast("long"))
        .withColumn(
            "symbol_ratio",
            n_sym.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"),
        )
        .withColumn("rep3_ratio", rep3.cast("double"))
        .withColumn("stop_density", stop_density)
        .withColumn("spaceless_ratio", spaceless_ratio.cast("double"))
        .withColumn(
            "n_chars_gated",
            F.when(~is_spaceless, n_chars.cast("double")).otherwise(null_d),
        )
        .withColumn(
            "n_chars_spaceless_gated",
            F.when(is_spaceless, n_chars.cast("double")).otherwise(null_d),
        )
        .withColumn(
            "rep3_gated", F.when(~is_spaceless, rep3.cast("double")).otherwise(null_d)
        )
        .withColumn(
            "rep_char_gated",
            F.when(is_spaceless, rep_char.cast("double")).otherwise(null_d),
        )
        .withColumn(
            "stop_density_gated",
            F.when(~is_spaceless, stop_density).otherwise(null_d),
        )
        .withColumn("is_vendor_url", is_vendor)
        .drop("_t", "_w", "_lw", "_stopm")
    )


def with_keep_drop(
    df: DataFrame,
    rules: tuple[tuple[str, str, str, float], ...] = RULES,
) -> DataFrame:
    """First-match-wins when/otherwise ladder over ``rules`` -> (keep,
    drop_rule). Requires signal columns from with_quality_signals (and
    a perplexity column, via with_perplexity, when rules includes
    PPL_RULE — a NULL signal falls through, like the py spec)."""
    expr = F.lit(None).cast("string")
    for rule_id, signal, op, thr in reversed(rules):
        col = F.col(signal)
        cond = (
            col < thr if op == "<" else col > thr if op == ">" else col >= thr
        )
        expr = F.when(cond, F.lit(rule_id)).otherwise(expr)
    df = df.withColumn("drop_rule", expr)
    return df.withColumn("keep", F.col("drop_rule").isNull())
