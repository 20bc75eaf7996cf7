"""Char-n-gram naive-Bayes language identifier (fastText-style).

Mirrors the reference token-NB classifier semantics exactly
(src/detectors/classifier.rs:18-49), generalized from code tokens to
character 3-grams for web text:

  - score(candidate) = sum over doc grams of log P(gram | lang),
    missing gram -> DEFAULT_LOG_PROB = -19 (classifier.rs:10),
    language absent from model -> -inf (classifier.rs:36).
  - empty candidate list -> score ALL languages (classifier.rs:19-22).
  - argmax with STABLE tie-break: earlier candidate in candidate-list
    order wins (classifier.rs:42-48 stable sort) — reproduced by
    Python's stable sort, never by Spark max_by (SURVEY.md §2.5 O3).
  - per-row compute is bounded: first MAX_SCORE_CHARS chars only
    (the 51200-byte cap analog, X6).

Training = the codegen analog (src/bin/codegen.rs:357-428): count grams
per (lang, gram), total per lang, emit ln(count/total). Two parity
implementations: pure Python (train_py) and a Spark aggregation job
(train_spark — groupBy + window, no UDF).

Scoring on Spark: ONE Arrow-batched pandas UDF over the broadcast model
(a few MB — classic broadcast-model scoring).
"""

from __future__ import annotations

import math
import random
import re
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .langdata import LANGUAGES, STOPWORDS, WORDS

DEFAULT_LOG_PROB = -19.0  # classifier.rs:10
MAX_SCORE_CHARS = 2000
NGRAM = 3

Model = dict[str, dict[str, float]]


def text_grams(text: str) -> list[str]:
    t = text[:MAX_SCORE_CHARS].lower()
    return [t[i : i + NGRAM] for i in range(max(0, len(t) - NGRAM + 1))]


# ----------------------------------------------------------------------
# scoring-time normalization (round 6, noisy-encoding robustness)
# ----------------------------------------------------------------------
# Real web text is littered with INVISIBLE formatting characters —
# zero-width spaces from CMS editors, BOMs, soft hyphens, direction
# marks, NBSP-class spaces. They carry no language signal but land in
# every trigram window: measured on the realtext noisy stratum, a
# ZWSP-every-7-chars variant collapsed hashed-NB accuracy 0.96 -> 0.09
# (90% gated as noise). Scoring therefore normalizes its INPUT — strip
# the purely-visual chars, map NBSP-class to a plain space — before
# capping. ZWNJ (U+200C) and ZWJ (U+200D) are deliberately KEPT: they
# are linguistically meaningful (Persian/Hindi orthography, emoji
# sequences) and appear in real prose the models should learn as-is.
# Training corpora are clean by construction, so this applies at
# SCORING time (classify/perplexity); the SQL-oracled in-query
# training-agg queries keep their raw-text semantics.
# ZWSP, BOM/ZWNBSP, word joiner, soft hyphen, LRM, RLM
_STRIP_CHARS = "\u200b\ufeff\u2060\u00ad\u200e\u200f"
# NBSP, narrow NBSP, figure space
_SPACE_CHARS = "\u00a0\u202f\u2007"
_NORM_TABLE = {ord(c): None for c in _STRIP_CHARS}
_NORM_TABLE.update({ord(c): " " for c in _SPACE_CHARS})
# fast-path guard: str.translate with a dict table walks the whole
# string through dict lookups (~15% of py_label_page in the r07
# profile), but clean text — the overwhelmingly common case — contains
# none of the 9 normalization chars. One C-level regex scan decides;
# translate runs only when a char is actually present (identical
# output either way: the class below is exactly the table's key set).
_NORM_ANY_RE = re.compile("[" + _STRIP_CHARS + _SPACE_CHARS + "]")


def normalize_scoring_text(text: str) -> str:
    """Strip invisible formatting chars / unify NBSP-class spaces —
    the pre-gram cleanup every scorer applies (spec above)."""
    if _NORM_ANY_RE.search(text) is None:
        return text
    return text.translate(_NORM_TABLE)


# translate()-form of the same table for the Spark column and DuckDB
# SQL implementations: chars in NORM_FROM beyond len(NORM_TO) are
# DELETED — identical semantics in Spark's translate and DuckDB's
# (both follow the SQL-standard deletion rule), so all three engines
# share one normalization spec.
NORM_FROM = _SPACE_CHARS + _STRIP_CHARS
NORM_TO = " " * len(_SPACE_CHARS)


# ----------------------------------------------------------------------
# deterministic training corpus (the samples/ analog)
# ----------------------------------------------------------------------

# scripts written WITHOUT spaces between words: training docs for these
# join words directly, like real prose — otherwise every real zh/ja/th
# trigram crosses a space the model never saw and the scorer
# degenerates to the all-DEFAULT_LOG_PROB tie (measured on the
# real-text fixture: zh/ja dict-NB accuracy 0 -> 1 with this fix)
_NO_SPACE_SCRIPTS = frozenset(
    ("han", "kanji_kana", "thai", "khmer", "lao", "myanmar", "tibetan")
)


def _lang_sep(lang: str) -> str:
    from .langdata import LANG_INFO

    info = LANG_INFO.get(lang)
    return "" if info and info["script"] in _NO_SPACE_SCRIPTS else " "


def training_corpus(
    docs_per_lang: int = 50, words_per_doc: int = 80, seed: int = 1337
) -> list[tuple[str, str]]:
    """(lang, text) rows drawn from the per-language word pools with a
    seeded RNG — fully deterministic, mirrors reference samples/.
    Space-less scripts (zh/ja/th) join without separators, like the
    text they will be scored on."""
    rows = []
    for lang in LANGUAGES:
        rng = random.Random(f"{seed}:{lang}")
        pool = WORDS[lang]
        stop = STOPWORDS[lang]
        sep = _lang_sep(lang)
        for _ in range(docs_per_lang):
            words = []
            for _ in range(words_per_doc):
                # ~45% stopwords, like real prose
                src = stop if rng.random() < 0.45 else pool
                words.append(src[rng.randrange(len(src))])
            rows.append((lang, sep.join(words)))
    return rows


def train_py(corpus: list[tuple[str, str]]) -> Model:
    """Pure-Python trainer: lang -> gram -> ln(count/total)."""
    model: Model = {}
    for lang in sorted({l for l, _ in corpus}):
        counts: Counter[str] = Counter()
        for l, text in corpus:
            if l == lang:
                counts.update(text_grams(text))
        total = sum(counts.values())
        model[lang] = {g: math.log(c / total) for g, c in counts.items()}
    return model


def train_spark(df: DataFrame, lang_col: str = "lang", text_col: str = "text") -> Model:
    """Spark trainer — a pure DataFrame aggregation (codegen.rs:357-428
    analog): explode grams -> two-level hash agg -> log(cnt/total).
    Gram extraction is a JVM-side transform/sequence, not a UDF.

    Uses the length-gated exploded_grams: texts shorter than NGRAM chars
    emit NO grams (Spark's sequence(1, 0) yields a descending [1, 0],
    which would inject two spurious grams per short doc and break
    train_py parity)."""
    grams = exploded_grams(
        df.select(F.col(lang_col).alias("lang"), F.col(text_col).alias("text"))
    )
    counted = grams.groupBy("lang", "gram").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang")
    scored = counted.withColumn(
        "logp", F.log(F.col("cnt") / F.sum("cnt").over(w))
    )
    model: Model = {}
    for row in scored.collect():  # model table is small (dim data)
        model.setdefault(row["lang"], {})[row["gram"]] = row["logp"]
    return model


def save_model(spark: SparkSession, model: Model, path: str) -> None:
    """Persist the trained model as a (lang, gram, logp) parquet table —
    the codegen-sink analog (reference codegen.rs:175-203 writes static
    map files; our offline fit job writes a model table that score time
    broadcasts)."""
    rows = [
        (lang, gram, logp)
        for lang, grams in sorted(model.items())
        for gram, logp in sorted(grams.items())
    ]
    from ..session import local_rows_df

    local_rows_df(
        spark, rows, "lang string, gram string, logp double", slices=4
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_model(spark: SparkSession, path: str) -> Model:
    model: Model = {}
    for row in spark.read.parquet(path).collect():
        model.setdefault(row["lang"], {})[row["gram"]] = row["logp"]
    return model


_DEFAULT_MODEL: Model | None = None


def default_model() -> Model:
    """The frozen model trained on the deterministic corpus (built once
    per process — the compiled-in phf-map analog)."""
    global _DEFAULT_MODEL
    if _DEFAULT_MODEL is None:
        _DEFAULT_MODEL = train_py(training_corpus())
    return _DEFAULT_MODEL


# ----------------------------------------------------------------------
# script-based candidate narrowing (round 5, short-text robustness)
# ----------------------------------------------------------------------
# The open-world terminal used to score ALL 102 languages when the
# cheap stages produced no candidates; on title-length text the NB has
# so few grams that a hangul query could lose to 'en' (every gram OOV
# everywhere, tie-break order wins). The writing system is evidence
# the cascade already trusts elsewhere (J4 candidate-intersect), so an
# EMPTY candidate list now narrows to the languages whose script
# covers >= 50% of the doc's letters before scoring — hangul -> ko,
# greek -> el, han -> {zh, ja, ...}. Explicit candidates always win
# (narrowing applies only where there was no evidence at all), the
# token-NB path is exempt (code files are ASCII — script carries no
# signal there), and the unresolved gate still keys off the ORIGINAL
# candidate list. Measured on the realtext short stratum: hashed
# 0.869 -> 0.889, dict 0.892 -> 0.899; full passages unchanged.
#
# Scale shape: one int8 codepoint->script-component lookup (built
# lazily once per worker) + np.bincount per doc — two gathers, no
# regex in the hot path.

SCRIPT_NARROW_MIN_LETTERS = 5
SCRIPT_NARROW_MIN_RATIO = 0.5

# SCRIPT_LETTER_CLASSES entries are pairwise disjoint EXCEPT
# kanji_kana ⊃ han, so the flat id table stores disjoint components
# and kanji_kana's coverage is summed from (kana, han).
_SCRIPT_COMPONENT_RANGES: dict[str, str] = {"kana": "぀-ヿ"}
_SCRIPT_COMPONENTS: dict[str, tuple[str, ...]] = {}
_SID_TABLE = None
_SID_NAMES: list[str] = []
_SID_RANGES: dict[str, str] = {}


def _script_tables():
    global _SID_TABLE, _SID_NAMES
    if _SID_TABLE is None:
        import re as _re

        import numpy as np

        from .langdata import SCRIPT_LETTER_CLASSES
        from .quality import alpha_mask, char_mask

        ranges = dict(_SCRIPT_COMPONENT_RANGES)
        for s, cls in SCRIPT_LETTER_CLASSES.items():
            if s == "kanji_kana":
                _SCRIPT_COMPONENTS[s] = ("kana", "han")
                continue
            ranges[s] = cls
            _SCRIPT_COMPONENTS[s] = (s,)
        _SID_RANGES.update(ranges)
        _SID_NAMES = sorted(ranges)
        table = np.full(0x110000, -1, dtype=np.int8)
        alpha = alpha_mask()
        for i, name in enumerate(_SID_NAMES):
            m = char_mask(_re.compile("[" + ranges[name] + "]")) & alpha
            table[m] = i
        _SID_TABLE = table
    return _SID_TABLE, _SID_NAMES


def script_candidates(text: str) -> list[str]:
    """Languages whose script covers >= SCRIPT_NARROW_MIN_RATIO of the
    doc's letters, in LANGUAGES order (tie-break stability). Empty when
    the doc has < SCRIPT_NARROW_MIN_LETTERS letters or no script
    qualifies — callers fall back to the full universe."""
    import numpy as np

    from .langdata import LANG_INFO
    from .quality import alpha_mask, text_codes

    table, names = _script_tables()
    codes = text_codes(text)
    if codes is None:  # lone surrogates: regex fallback, same semantics
        import re as _re

        letters = [c for c in text if c.isalpha()]
        n_alpha = len(letters)
        if n_alpha < SCRIPT_NARROW_MIN_LETTERS:
            return []
        counts = {
            name: sum(
                1
                for c in letters
                if _re.match("[" + _SID_RANGES[name] + "]", c)
            )
            for name in names
        }
    else:
        alpha = alpha_mask()[codes]
        n_alpha = int(alpha.sum())
        if n_alpha < SCRIPT_NARROW_MIN_LETTERS:
            return []
        sid = table[codes]
        bc = np.bincount(sid[sid >= 0], minlength=len(names))
        counts = {name: int(bc[i]) for i, name in enumerate(names)}
    qualified = set()
    for script, comps in _SCRIPT_COMPONENTS.items():
        hits = sum(counts.get(c, 0) for c in comps)
        if hits / n_alpha >= SCRIPT_NARROW_MIN_RATIO:
            qualified.add(script)
    if not qualified:
        return []
    return [l for l in LANGUAGES if LANG_INFO[l]["script"] in qualified]


def _narrowed_cands(text: str, candidates: list[str] | None) -> list[str]:
    """Shared candidate-defaulting for the char-gram scorers: explicit
    candidates verbatim; empty -> script narrowing -> full universe."""
    if candidates:
        return list(candidates)
    return script_candidates(text) or list(LANGUAGES)


# ----------------------------------------------------------------------
# scoring
# ----------------------------------------------------------------------

def classify_py(
    text: str, candidates: list[str] | None, model: Model | None = None
) -> str:
    """Pure-Python spec scorer, exact classifier.rs:18-49 semantics
    (plus the documented script narrowing for empty candidates)."""
    model = model or default_model()
    text = normalize_scoring_text(text)  # r6: invisible-char cleanup
    cands = _narrowed_cands(text, candidates)
    gram_counts = Counter(text_grams(text))
    best_lang, best_score = cands[0], float("-inf")
    first = True
    for lang in cands:  # candidate order = tie-break order
        lp = model.get(lang)
        if lp is None:
            score = float("-inf")
        else:
            score = sum(
                n * lp.get(g, DEFAULT_LOG_PROB) for g, n in gram_counts.items()
            )
        if first or score > best_score:  # strict > keeps earlier cand on tie
            best_lang, best_score, first = lang, score, False
    return best_lang


# ----------------------------------------------------------------------
# unknown-language outcome (VERDICT r3 missing #2): the reference's
# `detect` can return None (src/lib.rs:187-189) but the cascade used to
# force-argmax over all 102 languages, assigning a language-103 doc its
# nearest confusable. CCNet-style pipelines threshold the classifier;
# we gate on TWO per-gram-normalized signals so a doc is unresolved
# only when its decision is indistinguishable from noise on BOTH axes:
#   margin = (top1 - top2) / n_grams   (how decisive the argmax is)
#   top1   =  top1 / n_grams           (how plausible the winner is)
# Calibration (measured once, deterministic constants like
# HASH_BUCKETS): synthetic training docs score margin >= 1.49 and
# top1/gram >= -8.1; natural-prose transfer passages (realtext) have
# margin p5 = 0.32 and top1 p5 = -15.7; character-salad / alien-trigram
# text has margin median ~0.14-0.22 and top1 median ~ -16.6. The AND of
# (margin < 0.15, top1 < -15.0) keeps 176/180 realtext passages
# resolved (two of the four gated ones were already misclassified
# zh/ja / uk->ru confusions) while flagging ~half of near-Latin
# pronounceable gibberish and virtually all alien-script salad — the
# same recall/precision trade a fastText confidence cutoff makes.
UNRESOLVED_MARGIN = 0.15
UNRESOLVED_ABS = -15.0


def classify_margin_py(
    text: str,
    candidates: list[str] | None,
    model=None,
    with_gate_winner: bool = False,
):
    """(best_lang, margin_per_gram, top1_per_gram) — plus the
    gate-set winner as a 4th element when ``with_gate_winner``.

    best_lang follows classify_any's candidate/tie-break semantics —
    including script narrowing for empty candidate lists. The GATE
    statistics (margin, top1, gate winner) are always computed over
    the ORIGINAL candidate set (the full universe when empty): the
    noise-gate constants below were calibrated on full-universe
    margins, and a narrowed set mechanically inflates margins
    (dropping 40 languages from scoring widens top1-top2 even on pure
    noise — the alien-Latin fixture caught exactly this). The gate
    WINNER matters too: on OOV noise the full-universe argmax is the
    widest-bucket-coverage attractor (zh/ja), whose script
    incoherence with the document is itself a noise signal the
    unresolved gate checks — the narrowed winner is coherent by
    construction and carries no such signal. One matvec either way:
    winner and gate read different rows of the same score vector.

    A singleton EXPLICIT candidate list is 'resolved elsewhere' and
    reports +inf margin (never gated); an empty feature set returns
    margin 0.0 / top1 -inf only when there is genuinely no evidence."""

    def out(lang, margin, top1, gate_lang):
        if with_gate_winner:
            return lang, margin, top1, gate_lang
        return lang, margin, top1

    if candidates and len(candidates) == 1:
        return out(candidates[0], float("inf"), 0.0, candidates[0])
    cands = _narrowed_cands(text, candidates)  # winner set
    gate_cands = list(candidates) if candidates else list(LANGUAGES)
    if model is None:
        model = default_hashed_model()
    if isinstance(model, TokenModel) or (
        model and isinstance(next(iter(model.values()), None), dict)
    ):
        # dict-shaped scorers (char-gram dict NB / token NB): one pass
        # over the gate set tracking top-2, plus the best within the
        # (sub)set of winner candidates — same strict-> earlier-
        # candidate order in both
        if isinstance(model, TokenModel):
            feats = Counter(text_tokens(text))
        else:
            # r6: same invisible-char cleanup as the scorers (tokens
            # are ASCII code — exempt)
            feats = Counter(text_grams(normalize_scoring_text(text)))
        n = sum(feats.values())
        narrow = set(cands)
        best, second = float("-inf"), float("-inf")
        best_lang, gate_lang = cands[0], gate_cands[0]
        nbest = float("-inf")
        nfirst = True
        for lang in gate_cands:
            lp = model.get(lang)
            if lp is None:
                score = float("-inf")
            else:
                score = sum(
                    c * lp.get(f, DEFAULT_LOG_PROB) for f, c in feats.items()
                )
            if score > best:
                second = best
                best, gate_lang = score, lang
            elif score > second:
                second = score
            if lang in narrow and (nfirst or score > nbest):
                nbest, best_lang, nfirst = score, lang, False
        if not n or best == float("-inf"):
            return out(best_lang, 0.0, float("-inf"), gate_lang)
        if second == float("-inf"):
            return out(best_lang, float("inf"), best / n, gate_lang)
        return out(best_lang, (best - second) / n, best / n, gate_lang)
    # hashed model: vectorized — winner from the narrowed rows, top-2
    # and gate winner from the gate rows, one matvec
    if not model:
        return out(cands[0], 0.0, float("-inf"), gate_cands[0])
    packed = _packed_grams(text)
    if packed is None:
        lang = next((l for l in cands if l in model), cands[0])
        glang = next((l for l in gate_cands if l in model), gate_cands[0])
        return out(lang, 0.0, float("-inf"), glang)
    uk, cnts = packed
    idx = _keys_to_buckets(uk)
    mt, lidx = _hashed_matrix(model)
    all_scores = cnts @ mt[idx]
    rows = np.array([lidx.get(l, -1) for l in cands], dtype=np.int64)
    scores = np.where(rows >= 0, all_scores[np.maximum(rows, 0)], -np.inf)
    bi = int(np.argmax(scores))
    grows = np.array([lidx.get(l, -1) for l in gate_cands], dtype=np.int64)
    gscores = np.where(grows >= 0, all_scores[np.maximum(grows, 0)], -np.inf)
    gate_lang = gate_cands[int(np.argmax(gscores))]
    n = float(cnts.sum())
    finite = gscores[np.isfinite(gscores)]
    if finite.size == 0 or not n:
        return out(cands[bi], 0.0, float("-inf"), gate_lang)
    if finite.size == 1:
        return out(
            cands[bi], float("inf"), float(np.max(gscores)) / n, gate_lang
        )
    top2 = np.partition(finite, -2)[-2:]
    return out(
        cands[bi], float(top2[1] - top2[0]) / n, float(top2[1]) / n, gate_lang
    )


# Unknown-script gate, checked BEFORE the margin gate: a doc whose
# letters mostly fall outside every known script's ranges (Cherokee,
# Yi, Tifinagh, Runic, ... — scripts with no language in the universe)
# has ZERO candidate languages, which is exactly the case where the
# reference's `detect` returns None (src/lib.rs:187-189). This catches
# what the margin gate can't: the hashed model's OOV grams land in
# arbitrary buckets, and the language with the widest bucket coverage
# (zh) can win with a confident-looking margin on pure alien script.
_KNOWN_LETTER_RE: "re.Pattern[str] | None" = None
_SCRIPT_RES: dict[str, "re.Pattern[str]"] = {}
MIN_SCRIPT_LETTERS = 10
KNOWN_SCRIPT_MIN_RATIO = 0.5
# a classifier prediction must be script-coherent: at least this
# fraction of the doc's letters must belong to the predicted
# language's script (a Latin-only doc predicted 'zh' is the OOV
# bucket attractor, not a detection)
PRED_SCRIPT_MIN_RATIO = 0.3


def _script_re(script: str):
    got = _SCRIPT_RES.get(script)
    if got is None:
        import re as _re

        from .langdata import SCRIPT_LETTER_CLASSES

        got = _re.compile("[" + SCRIPT_LETTER_CLASSES[script] + "]")
        _SCRIPT_RES[script] = got
    return got


def _known_letter_re():
    global _KNOWN_LETTER_RE
    if _KNOWN_LETTER_RE is None:
        import re as _re

        from .quality import KNOWN_LETTER_CLASS

        _KNOWN_LETTER_RE = _re.compile(KNOWN_LETTER_CLASS)
    return _KNOWN_LETTER_RE


def known_script_ratio(text: str) -> tuple[int, float]:
    """(n_letters, fraction of them inside known-script ranges).
    Both numerator and denominator count LETTERS only (class mask
    intersected with isalpha): the script ranges contain non-alphabetic
    codepoints (×/÷ in Latin-1, Hebrew niqqud, Greek punctuation), so a
    raw class count can exceed n_alpha and inflate the ratio for
    mark-heavy docs, weakening the unknown-script gate. Mask fast path
    (quality.char_mask — one utf-32 decode, two gathers); regex/isalpha
    fallback keeps identical semantics."""
    from .quality import alpha_mask, char_mask, text_codes

    codes = text_codes(text)
    if codes is None:
        n_alpha = sum(c.isalpha() for c in text)
        if not n_alpha:
            return 0, 1.0
        known = sum(c.isalpha() for c in _known_letter_re().findall(text))
        return n_alpha, known / n_alpha
    alpha = alpha_mask()[codes]
    n_alpha = int(alpha.sum())
    if not n_alpha:
        return 0, 1.0
    known = char_mask(_known_letter_re())[codes]
    return n_alpha, int((known & alpha).sum()) / n_alpha


def classify_or_none_py(
    text: str,
    candidates: list[str] | None,
    model=None,
    margin_thr: float = UNRESOLVED_MARGIN,
    abs_thr: float = UNRESOLVED_ABS,
) -> str | None:
    """classify_any with the unresolved gate: None when the script is
    unknown, when the NB decision is noise-like on both axes (see the
    calibration note above), or when the FULL-UNIVERSE argmax is
    script-incoherent with the document.

    The coherence check deliberately targets the gate-set winner, not
    the (script-narrowed) returned label: on OOV noise the full
    argmax is the widest-bucket-coverage attractor (zh/ja) and its
    script mismatch with the document is the noise signal — the
    narrowed winner is coherent by construction, so checking it would
    silence the gate (the alien-Latin fixture pins this)."""
    gate = candidates is None or len(candidates) != 1
    n_alpha = 0
    if gate:
        n_alpha, ratio = known_script_ratio(text)
        if n_alpha >= MIN_SCRIPT_LETTERS and ratio < KNOWN_SCRIPT_MIN_RATIO:
            return None
    lang, margin, top1, gate_lang = classify_margin_py(
        text, candidates, model, with_gate_winner=True
    )
    if margin < margin_thr and top1 < abs_thr:
        return None
    if gate and n_alpha >= MIN_SCRIPT_LETTERS:
        from .langdata import LANG_INFO
        from .quality import char_mask, text_codes

        info = LANG_INFO.get(gate_lang)
        if info is not None:
            # same letters-only counting as known_script_ratio: the
            # script classes include non-alphabetic codepoints, and
            # the denominator n_alpha counts letters
            rx = _script_re(info["script"])
            codes = text_codes(text)
            if codes is None:
                hits = sum(c.isalpha() for c in rx.findall(text))
            else:
                from .quality import alpha_mask

                hits = int(
                    (char_mask(rx)[codes] & alpha_mask()[codes]).sum()
                )
            if hits / n_alpha < PRED_SCRIPT_MIN_RATIO:
                return None
    return lang


def classify_any(
    text: str, candidates: list[str] | None, model=None
) -> str:
    """Dispatch on model representation: None -> the default HASHED
    model (the production scorer — bounded broadcast size); TokenModel
    -> the tokenizer-feature NB (the reference's F2->F4 path); dict-of-
    dicts -> the explicit-vocabulary char-gram NB; HashedModel ->
    hashed. Identical candidate/tie-break semantics in every case."""
    if model is None:
        return classify_hashed_py(text, candidates, default_hashed_model())
    if isinstance(model, TokenModel):
        return classify_tokens_py(text, candidates, model)
    first = next(iter(model.values()), None)
    if isinstance(first, dict):
        return classify_py(text, candidates, model)
    return classify_hashed_py(text, candidates, model)


def make_classify_udf(spark: SparkSession, model=None, unresolved: bool = False):
    """Arrow-batched pandas UDF (text, candidates) -> lang.

    The model (hashed by default) ships to executors via sc.broadcast —
    one copy per worker, the broadcast-variable analog of the
    reference's compiled-in map. Rows whose candidate list is already a
    singleton are passed through without scoring (early-exit X1 inside
    the batch). With ``unresolved=True`` a noise-like decision returns
    NULL (classify_or_none_py) instead of a forced argmax.
    """
    if model is not None:
        bc = spark.sparkContext.broadcast(model)
    else:  # default model: broadcast once per application, then reuse
        from ..session import cached_broadcast

        bc = cached_broadcast(
            spark, "langid.default_hashed_model", default_hashed_model
        )
    score = classify_or_none_py if unresolved else classify_any

    @F.pandas_udf(T.StringType())
    def classify_udf(texts: pd.Series, cands: pd.Series) -> pd.Series:
        m = bc.value
        out = []
        for text, cand in zip(texts, cands):
            cand_list = list(cand) if cand is not None else []
            if len(cand_list) == 1:
                out.append(cand_list[0])
            else:
                out.append(score(text or "", cand_list, m))
        return pd.Series(out, dtype=object)

    return classify_udf


def exploded_grams(
    df: DataFrame,
    text_col: str = "text",
    n: int = NGRAM,
    cap: int = MAX_SCORE_CHARS,
    keep: tuple[str, ...] = ("lang",),
    out: str = "gram",
) -> DataFrame:
    """One row per char-n-gram of the capped lowercased text.

    Explodes an INT sequence and slices with substr AFTERWARDS — both
    whole-stage-codegen'd — instead of building a string array through
    an interpreted transform() lambda (measured 3.8x faster on the
    sf0.1 training agg). Length-gated: texts shorter than n emit no
    rows (sequence(1, 0) would descend).

    Cap BEFORE lower — mirrors the frozen Python spec text[:cap].lower()
    exactly. The reverse order shifts the gram stream when a
    case-expanding char ('İ' -> 'i̇') appears before the cap in a
    longer-than-cap text (tests/test_hashed_langid.py boundary case)."""
    t = F.lower(F.substring(F.col(text_col), 1, cap))
    length = F.length("_t")
    seq = F.when(
        length >= n, F.sequence(F.lit(1), length - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(*keep, t.alias("_t"))
        .select(*keep, "_t", F.explode(seq).alias("_i"))
        .select(*keep, F.col("_t").substr(F.col("_i"), F.lit(n)).alias(out))
    )


def grams_col(text: Column | str, n: int = NGRAM, cap: int = MAX_SCORE_CHARS) -> Column:
    """JVM-side char-n-gram array (for per-row gram ARRAYS; bulk
    explode paths should use exploded_grams instead). Cap before lower,
    like the Python spec (see exploded_grams)."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.lower(F.substring(c, 1, cap))
    length = F.length(t)
    return F.when(
        length >= n,
        F.transform(
            F.sequence(F.lit(1), length - F.lit(n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# ----------------------------------------------------------------------
# hashed n-gram features (the north-star's "hashed character-n-gram
# features"): the fastText hashing trick. The model is a FIXED-WIDTH
# (n_langs x HASH_BUCKETS) log-prob matrix — broadcast size is bounded
# by bucket count, not vocabulary, so it stays O(MB) at 100+ languages.
# ----------------------------------------------------------------------

# 16384 buckets: at 60 languages with space-less CJK training the
# no-space scripts occupy thousands of distinct grams, and at 4096
# buckets zh covered ~60% of the hash space — every out-of-vocabulary
# gram of ANY language collided into a zh bucket at logp ~ -8 vs the
# -19 miss penalty, so broad-coverage languages became attractors
# (real-text fixture accuracy 0.47). 16384 cuts coverage 4x
# (accuracy 0.95, tests/test_realtext.py); broadcast stays bounded:
# 60 langs x 16384 x 8B = 7.9 MB.
HASH_BUCKETS = 16384

# lang -> float64[HASH_BUCKETS] of logp (DEFAULT_LOG_PROB where empty)
HashedModel = dict[str, np.ndarray]


_BUCKET_CACHE: dict[str, int] = {}


def gram_bucket(gram: str, buckets: int = HASH_BUCKETS) -> int:
    """Deterministic gram -> bucket: first 15 hex digits of md5, mod B.
    Chosen because BOTH sides can compute it exactly — Python hashlib
    here, and `conv(substring(md5(g),1,15),16,10) % B` in Spark SQL /
    DuckDB (the oracle path). Never builtin hash() (salted).

    Grams repeat massively across documents, so default-width lookups
    are memoized (bounded at 200k entries ~ 20MB per python worker;
    md5 runs only on first sight of a gram)."""
    if buckets == HASH_BUCKETS:
        b = _BUCKET_CACHE.get(gram)
        if b is None:
            import hashlib

            if len(_BUCKET_CACHE) > 200_000:
                _BUCKET_CACHE.clear()
            b = (
                int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16)
                % buckets
            )
            _BUCKET_CACHE[gram] = b
        return b
    import hashlib

    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16) % buckets


def bucket_col(gram: Column, buckets: int = HASH_BUCKETS) -> Column:
    """JVM-side gram_bucket: same md5-prefix arithmetic, built-ins only."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
        % F.lit(buckets)
    ).cast("int")


def train_hashed_py(
    corpus: list[tuple[str, str]], buckets: int = HASH_BUCKETS
) -> HashedModel:
    """lang -> logp vector over hashed buckets. Collisions merge counts
    (the standard hashing-trick tradeoff); empty buckets score
    DEFAULT_LOG_PROB, exactly like a missing gram in the dict model."""
    model: HashedModel = {}
    for lang in sorted({l for l, _ in corpus}):
        counts = np.zeros(buckets, dtype=np.float64)
        total = 0
        for l, text in corpus:
            if l == lang:
                for g in text_grams(text):
                    counts[gram_bucket(g, buckets)] += 1
                    total += 1
        vec = np.full(buckets, DEFAULT_LOG_PROB, dtype=np.float64)
        if total:
            nz = counts > 0
            vec[nz] = np.log(counts[nz] / total)
        model[lang] = vec
    return model


def train_hashed_spark(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    buckets: int = HASH_BUCKETS,
) -> HashedModel:
    """Spark trainer: explode grams -> count per RAW gram (partial agg
    absorbs the volume) -> md5-bucket only the distinct (lang, gram)
    groups -> final agg -> collect (lang, bucket, cnt) into vectors.
    Hashing the distinct grams instead of every occurrence is ~30x
    fewer md5s at sf0.1 and amortizes to zero per doc at corpus scale
    (distinct grams plateau). Sum-before-bucket == sum-after-bucket,
    so parity with train_hashed_py is exact
    (tests/test_hashed_langid.py)."""
    grams = exploded_grams(
        df.select(F.col(lang_col).alias("lang"), F.col(text_col).alias("text"))
    )
    counted = (
        grams.groupBy("lang", "gram")
        .agg(F.count("*").alias("c1"))
        .select("lang", bucket_col(F.col("gram"), buckets).alias("b"), "c1")
        .groupBy("lang", "b")
        .agg(F.sum("c1").cast("long").alias("cnt"))
        .collect()
    )
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in counted:
        by_lang.setdefault(r["lang"], []).append((r["b"], r["cnt"]))
    model: HashedModel = {}
    for lang, pairs in by_lang.items():
        counts = np.zeros(buckets, dtype=np.float64)
        for b, c in pairs:
            counts[b] = c
        total = counts.sum()
        vec = np.full(buckets, DEFAULT_LOG_PROB, dtype=np.float64)
        nz = counts > 0
        vec[nz] = np.log(counts[nz] / total)
        model[lang] = vec
    return model


_DEFAULT_HASHED_MODEL: HashedModel | None = None


def default_hashed_model() -> HashedModel:
    global _DEFAULT_HASHED_MODEL
    if _DEFAULT_HASHED_MODEL is None:
        _DEFAULT_HASHED_MODEL = train_hashed_py(training_corpus())
    return _DEFAULT_HASHED_MODEL


_KEY_MASK = (1 << 21) - 1

# gram-key -> bucket memo, two tiers: a SORTED numpy snapshot (warm
# lookups are one vectorized searchsorted, no Python loop) plus a dict
# overlay for keys seen since the last merge. Bounded at ~200k entries
# (~20 MB/worker) like the round-2 dict cache it replaces.
_KB_SORTED_KEYS: np.ndarray = np.empty(0, dtype=np.int64)
_KB_SORTED_VALS: np.ndarray = np.empty(0, dtype=np.int64)
_KB_OVERLAY: dict[int, int] = {}
_KB_MERGE_AT = 4096
_KB_MAX = 200_000


def _packed_grams(text: str) -> tuple[np.ndarray, np.ndarray] | None:
    """Distinct trigrams of the capped lowercased text as int64-packed
    keys + counts — the all-numpy replacement for Counter(text_grams)."""
    t = normalize_scoring_text(text)[:MAX_SCORE_CHARS].lower()
    if len(t) < NGRAM:
        return None
    a = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    keys = (a[:-2] << 42) | (a[1:-1] << 21) | a[2:]
    uk, cnt = np.unique(keys, return_counts=True)
    return uk, cnt.astype(np.float64)


def _keys_to_buckets(uk: np.ndarray) -> np.ndarray:
    """Packed gram keys -> hashed buckets, memoized on the int key (the
    md5 runs only on first sight of a gram). Warm keys resolve with one
    searchsorted against the sorted snapshot; only misses fall to the
    Python loop, and the overlay merges into the snapshot in bulk."""
    global _KB_SORTED_KEYS, _KB_SORTED_VALS
    out = np.empty(len(uk), dtype=np.int64)
    n = len(_KB_SORTED_KEYS)
    if n:
        pos = np.minimum(np.searchsorted(_KB_SORTED_KEYS, uk), n - 1)
        hit = _KB_SORTED_KEYS[pos] == uk
        out[hit] = _KB_SORTED_VALS[pos[hit]]
        miss = np.nonzero(~hit)[0]
    else:
        miss = np.arange(len(uk))
    if len(miss):
        ov = _KB_OVERLAY
        for i in miss:
            k = int(uk[i])
            b = ov.get(k)
            if b is None:
                g = chr(k >> 42) + chr((k >> 21) & _KEY_MASK) + chr(k & _KEY_MASK)
                b = gram_bucket(g)
                ov[k] = b
            out[i] = b
        if len(ov) > _KB_MERGE_AT:
            if n + len(ov) > _KB_MAX:
                n = 0  # drop the old snapshot; keep the recent overlay
                _KB_SORTED_KEYS = _KB_SORTED_KEYS[:0]
                _KB_SORTED_VALS = _KB_SORTED_VALS[:0]
            ks = np.fromiter(ov.keys(), np.int64, len(ov))
            vs = np.fromiter(ov.values(), np.int64, len(ov))
            allk = np.concatenate([_KB_SORTED_KEYS, ks])
            allv = np.concatenate([_KB_SORTED_VALS, vs])
            order = np.argsort(allk, kind="stable")
            _KB_SORTED_KEYS = allk[order]
            _KB_SORTED_VALS = allv[order]
            ov.clear()
    return out


_HM_MATRIX: tuple[HashedModel, np.ndarray, dict[str, int]] | None = None


def _hashed_matrix(model: HashedModel) -> tuple[np.ndarray, dict[str, int]]:
    """Stack the model's per-lang vectors ONCE into a (buckets x
    n_langs) transposed matrix, cached on model IDENTITY (the cache
    holds the model reference, so an `is` hit can never be a recycled
    address — the perplexity scorer-cache pattern): per-doc scoring is
    then one contiguous row-gather + one matvec for ALL languages
    instead of a Python loop of per-lang gathers."""
    global _HM_MATRIX
    c = _HM_MATRIX
    if c is not None and c[0] is model:
        return c[1], c[2]
    langs = sorted(model)
    mt = np.ascontiguousarray(np.stack([model[l] for l in langs], axis=1))
    lidx = {l: i for i, l in enumerate(langs)}
    _HM_MATRIX = (model, mt, lidx)
    return mt, lidx


def classify_hashed_py(
    text: str, candidates: list[str] | None, model: HashedModel | None = None
) -> str:
    """classify_py semantics over hashed features: same candidate
    handling, same stable earlier-candidate tie-break (numpy argmax
    returns the FIRST max). Scores all model languages in one
    gather+matvec over the transposed bucket matrix, then selects the
    candidate rows; languages absent from the model score -inf."""
    model = model if model is not None else default_hashed_model()
    cands = _narrowed_cands(text, candidates)
    if not model:
        return cands[0]  # every candidate scores -inf; earliest wins
    packed = _packed_grams(text)
    if packed is None:
        # no grams: every present language scores 0.0, absent -inf;
        # the earliest present candidate wins (or cands[0] if none)
        for lang in cands:
            if lang in model:
                return lang
        return cands[0]
    uk, cnts = packed
    idx = _keys_to_buckets(uk)
    mt, lidx = _hashed_matrix(model)
    all_scores = cnts @ mt[idx]
    rows = np.array([lidx.get(l, -1) for l in cands], dtype=np.int64)
    scores = np.where(rows >= 0, all_scores[np.maximum(rows, 0)], -np.inf)
    return cands[int(np.argmax(scores))]


# ----------------------------------------------------------------------
# token naive-Bayes: the reference's ACTUAL feature path (F2 tokenizer
# -> F3 get_key_tokens <=32B -> F4 NB scorer, src/detectors/
# classifier.rs:24-48) wired to the same train/score machinery. The
# production cascade defaults to char-grams (documented north-star
# choice); this closes the last semantic gap as a selectable option.
# ----------------------------------------------------------------------

class TokenModel(dict):
    """Marker type: lang -> token -> logp trained on classifier tokens
    (idents+symbols, <=32 UTF-8 bytes). Distinguishes the token model
    from the char-gram dict model in classify_any dispatch."""


def text_tokens(text: str) -> list[str]:
    """F2 -> F3 on the capped text: tokenize, keep idents+symbols,
    drop tokens over 32 UTF-8 bytes (classifier.rs:24-26)."""
    from .tokenizer import get_classifier_tokens

    return get_classifier_tokens(text[:MAX_SCORE_CHARS])


def train_token_py(corpus: list[tuple[str, str]]) -> TokenModel:
    """classifier.rs/codegen.rs:357-428 trainer over token features.
    A language yielding ZERO classifier tokens (e.g. spaceless-CJK
    prose lexes into idents over the 32-byte cap) is ABSENT from the
    model, like train_ppl_py — it then scores -inf, never a spurious
    tie winner. The token-NB is the reference's CODE-classifier path;
    spaceless prose is outside its feature domain by construction."""
    model = TokenModel()
    for lang in sorted({l for l, _ in corpus}):
        counts: Counter[str] = Counter()
        for l, text in corpus:
            if l == lang:
                counts.update(text_tokens(text))
        total = sum(counts.values())
        if not total:
            continue
        model[lang] = {t: math.log(c / total) for t, c in counts.items()}
    return model


def _tokens_arr_udf():
    """Arrow-batched (text) -> array<string> of classifier tokens. The
    lexer is a stateful char machine — genuinely not expressible with
    built-ins, the documented Pandas-UDF case."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokens_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([text_tokens(t or "") for t in texts])

    return tokens_udf


def train_token_spark(
    df: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> TokenModel:
    """Spark trainer: ONE tokenizer UDF pass -> explode -> two-level
    hash agg -> log(cnt/total). Exact train_token_py parity
    (tests/test_token_nb.py)."""
    toks = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(_tokens_arr_udf()(F.col(text_col))).alias("tok"),
    )
    counted = toks.groupBy("lang", "tok").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang")
    scored = counted.withColumn(
        "logp", F.log(F.col("cnt") / F.sum("cnt").over(w))
    )
    model = TokenModel()
    for row in scored.collect():  # model table is dim-sized
        model.setdefault(row["lang"], {})[row["tok"]] = row["logp"]
    return model


def classify_tokens_py(
    text: str, candidates: list[str] | None, model: TokenModel
) -> str:
    """classifier.rs:18-49 semantics over token features: same missing-
    token DEFAULT_LOG_PROB, same -inf for unknown langs, same stable
    earlier-candidate tie-break as classify_py."""
    cands = list(candidates) if candidates else list(LANGUAGES)
    tok_counts = Counter(text_tokens(text))
    best_lang, best_score = cands[0], float("-inf")
    first = True
    for lang in cands:
        lp = model.get(lang)
        if lp is None:
            score = float("-inf")
        else:
            score = sum(
                n * lp.get(t, DEFAULT_LOG_PROB) for t, n in tok_counts.items()
            )
        if first or score > best_score:
            best_lang, best_score, first = lang, score, False
    return best_lang
