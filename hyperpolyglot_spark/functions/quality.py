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

# Chars that count as "symbols": not alnum, not whitespace, and not a
# letter of any script in the 24-language universe. Same class compiles
# under Python re and Java regex (explicit literal ranges, no \w).
_SYMBOL_CLASS = (
    "[^A-Za-z0-9\\s"
    "À-ɏ"  # latin-1 supplement + extended A/B (diacritics)
    "Ͱ-Ͽ"  # greek
    "Ѐ-ӿ"  # cyrillic
    "֐-׿"  # hebrew
    "؀-ۿ"  # arabic
    "ऀ-ॿ"  # devanagari
    "Ḁ-ỿ"  # latin extended additional (vietnamese)
    "぀-ヿ"  # hiragana + katakana
    "一-鿿"  # cjk unified ideographs
    "가-힯"  # hangul syllables
    "]"
)
_SYMBOL_RE = re.compile(_SYMBOL_CLASS)
_WS_SPLIT_RE = re.compile(r"[ \t\n\r\f\x0b]+")

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
MAX_CHARS = 40_000
MAX_SYMBOL_RATIO = 0.30
MAX_REP3_RATIO = 0.50
MIN_STOPWORD_DENSITY = 0.05
# KenLM-style LM threshold: kept fixture prose scores ppl <= ~7 under
# the per-language char-3-gram LM; scrambled/word-salad text scores
# 20-50+ (measured, tests/test_perplexity.py pins the separation).
MAX_PPL = 10.0

# (rule_id, signal, op) — order IS the spec (first match wins).
RULES: tuple[tuple[str, str, str, float], ...] = (
    ("url_blocklist", "is_vendor_url", ">=", 1.0),
    ("too_short", "n_chars", "<", float(MIN_CHARS)),
    ("too_long", "n_chars", ">", float(MAX_CHARS)),
    ("symbol_ratio", "symbol_ratio", ">", MAX_SYMBOL_RATIO),
    ("repetition", "rep3_ratio", ">", MAX_REP3_RATIO),
    ("stopword_density", "stop_density", "<", MIN_STOPWORD_DENSITY),
)

# The perplexity rule is LAST by design (classifier-dodge economics,
# X5): the LM scores only docs every cheap rule already passed. It
# needs lang_pred, so it joins the table where the pipeline has both
# (plans/pipeline.py, RULES_WITH_PPL); a missing/None signal never
# fires a rule (a <3-char doc has no LM events).
PPL_RULE = ("perplexity", "perplexity", ">", MAX_PPL)
RULES_WITH_PPL: tuple[tuple[str, str, str, float], ...] = RULES + (PPL_RULE,)


# ======================================================================
# pure-Python spec (oracle mode)
# ======================================================================

def py_words(text: str) -> list[str]:
    return [w for w in _WS_SPLIT_RE.split(text) if w]


def py_signals(text: str, url: str = "") -> dict[str, float]:
    words = py_words(text)
    n_chars = len(text)
    n_words = len(words)
    n_sym = len(_SYMBOL_RE.findall(text))
    # distinct word-triples == distinct "a b c" strings (words contain
    # no whitespace); tuples avoid n_words string joins
    n_grams = max(0, n_words - 2)
    rep3 = (
        0.0
        if not n_grams
        else 1.0 - len(set(zip(words, words[1:], words[2:]))) / n_grams
    )
    # C-level loop: identical to sum(1 for w in words if w.lower() in S)
    n_stop = sum(map(ALL_STOPWORDS.__contains__, map(str.lower, words)))
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "symbol_ratio": n_sym / max(1, n_chars),
        "rep3_ratio": rep3,
        "stop_density": n_stop / max(1, n_words),
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

_STOP_MAP = None  # built lazily so import works without a session


def _stop_map() -> Column:
    """Stopword membership as a MAP literal: per-word lookup is a hash
    probe, not a 150-way array scan (higher-order-function lambdas are
    interpreted, not codegen'd — keep per-element work O(1))."""
    global _STOP_MAP
    if _STOP_MAP is None:
        pairs = []
        for w in sorted(ALL_STOPWORDS):
            pairs.extend([F.lit(w), F.lit(True)])
        _STOP_MAP = F.create_map(*pairs)
    return _STOP_MAP


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
    t = F.col(text_col)
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
    stop_hits = F.size(
        F.filter("_w", lambda x: _stop_map()[F.lower(x)].isNotNull())
    )
    is_vendor = (
        F.col(url_col).rlike(VENDOR_URL_RE).cast("double")
        if url_col
        else F.lit(0.0)
    )
    return (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_words", F.size("_w").cast("long"))
        .withColumn(
            "symbol_ratio",
            n_sym.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"),
        )
        .withColumn("rep3_ratio", rep3.cast("double"))
        .withColumn(
            "stop_density",
            stop_hits.cast("double")
            / F.greatest(F.size("_w"), F.lit(1)).cast("double"),
        )
        .withColumn("is_vendor_url", is_vendor)
        .drop("_w")
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
