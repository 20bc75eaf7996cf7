"""KenLM-style per-document perplexity under per-language char-n-gram
LMs (the north-star's "KenLM-style perplexity scores" stage).

Model: per language, an order-3 character LM with add-alpha smoothing —
the same broadcast-model scoring machinery as the reference's trained
TOKEN_LOG_PROBABILITIES path (src/detectors/classifier.rs:28-48),
pointed at a quality signal instead of a label:

    P(c | ctx)   = (cnt3(ctx+c) + ALPHA) / (cnt2(ctx) + ALPHA * V)
    cnt2(ctx)    = sum_c cnt3(ctx+c)      (derived from the trigram table)
    V            = |distinct event chars|  (distinct 3rd chars of the
                                            language's trigram events)
    logprob10    = sum over trigram events of log10 P
    perplexity   = 10 ** (-logprob10 / n_events)

Text prep is frozen: lowercase, first PPL_MAX_CHARS chars, events are
all contiguous 3-char windows (no BOS/EOS padding). A doc with fewer
than 3 chars has no events -> perplexity None (no rule fires).

Three implementations with identical semantics:
  - train_ppl_py / perplexity_py: the pure-Python spec (oracle mode,
    and the per-batch scorer inside the fused label UDF);
  - train_ppl_spark: DataFrame aggregation trainer (explode trigrams ->
    hash agg), the A4/codegen-analog offline fit job;
  - with_perplexity: Arrow-batched scoring of a DataFrame under the
    broadcast model — one python hop, no shuffle (the 10^12-doc path).

The in-query, fully-SQL-expressible variant (train on the corpus being
scored, score with built-in joins) lives in __spark_entry__.py's
``doc_perplexity`` so DuckDB can oracle the whole computation.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PPL_NGRAM = 3
PPL_ALPHA = 0.1
PPL_MAX_CHARS = 2000

# lang -> (tri_counts, ctx_counts, vocab_size)
PplModel = dict[str, tuple[dict[str, int], dict[str, int], int]]


def ppl_events(text: str) -> list[str]:
    """All 3-char windows of the lowercased, capped text."""
    t = text[:PPL_MAX_CHARS].lower()
    return [t[i : i + PPL_NGRAM] for i in range(max(0, len(t) - PPL_NGRAM + 1))]


def train_ppl_py(corpus: list[tuple[str, str]]) -> PplModel:
    """(lang, text) rows -> per-language smoothed trigram LM."""
    model: PplModel = {}
    for lang in sorted({l for l, _ in corpus}):
        tri: Counter[str] = Counter()
        for l, text in corpus:
            if l == lang:
                tri.update(ppl_events(text))
        if not tri:
            continue  # a lang with zero events has no LM (spec: absent)
        ctx: Counter[str] = Counter()
        vocab: set[str] = set()
        for g, c in tri.items():
            ctx[g[: PPL_NGRAM - 1]] += c
            vocab.add(g[PPL_NGRAM - 1])
        model[lang] = (dict(tri), dict(ctx), len(vocab))
    return model


# Vectorized scoring form, cached per model: trigrams are packed into
# int64 keys (c0<<42 | c1<<21 | c2 — codepoints < 2^21), the per-lang
# log10 tables become SORTED key/value arrays, and a document scores
# with numpy (unique + searchsorted + dot) instead of 2000 string
# slices + dict probes. log10 is evaluated once per MODEL entry, not
# once per document event. Same probabilities, ~10x less python time.
# id(model) -> (model, scorer). The model reference is held STRONGLY so
# the id can never be recycled by a different dict (id-reuse after GC
# would silently serve the wrong scorer); identity is re-checked on hit.
_SCORER_CACHE: dict[int, tuple[PplModel, dict]] = {}


def _pack3(g: str) -> int:
    return (ord(g[0]) << 42) | (ord(g[1]) << 21) | ord(g[2])


def _pack2(cx: str) -> int:
    return (ord(cx[0]) << 21) | ord(cx[1])


def _scorer(model: PplModel) -> dict:
    key = id(model)
    hit = _SCORER_CACHE.get(key)
    if hit is not None and hit[0] is model:
        return hit[1]
    if len(_SCORER_CACHE) > 8:
        _SCORER_CACHE.clear()
    sc = {}
    for lang, (tri, ctx, v) in model.items():
        denom = {cx: c2 + PPL_ALPHA * v for cx, c2 in ctx.items()}
        tri_items = sorted(
            (_pack3(g), math.log10((c3 + PPL_ALPHA) / denom[g[:2]]))
            for g, c3 in tri.items()
        )
        ctx_items = sorted(
            (_pack2(cx), math.log10(PPL_ALPHA / d))
            for cx, d in denom.items()
        )
        sc[lang] = (
            np.array([k for k, _ in tri_items], dtype=np.int64),
            np.array([p for _, p in tri_items], dtype=np.float64),
            np.array([k for k, _ in ctx_items], dtype=np.int64),
            np.array([p for _, p in ctx_items], dtype=np.float64),
            math.log10(PPL_ALPHA / (PPL_ALPHA * v)),
        )
    _SCORER_CACHE[key] = (model, sc)
    return sc


def logprob10_py(
    text: str, lang: str, model: PplModel
) -> tuple[float, int]:
    """(sum of log10 P over events, n_events); lang absent -> (0, 0).
    Events are grouped (np.unique) and scored count * logp against the
    precomputed sorted tables — all-C numpy path."""
    sc = _scorer(model).get(lang)
    if sc is None:
        return 0.0, 0
    # r6: same invisible-char cleanup as the NB scorers (langid spec) —
    # applied at SCORING time; training corpora are clean by
    # construction and the in-query SQL LM keeps raw-text semantics
    from .langid import normalize_scoring_text

    t = normalize_scoring_text(text)[:PPL_MAX_CHARS].lower()
    n = len(t) - PPL_NGRAM + 1
    if n <= 0:
        return 0.0, 0
    a = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    keys = (a[:-2] << 42) | (a[1:-1] << 21) | a[2:]
    uk, cnt = np.unique(keys, return_counts=True)
    tk, tl, ck, cl, dflt = sc
    pos = np.minimum(np.searchsorted(tk, uk), len(tk) - 1)
    hit = tk[pos] == uk
    lps = np.where(hit, tl[pos], 0.0)
    miss = ~hit
    if miss.any():
        cxk = uk[miss] >> 21
        posc = np.minimum(np.searchsorted(ck, cxk), len(ck) - 1)
        lps[miss] = np.where(ck[posc] == cxk, cl[posc], dflt)
    return float(lps @ cnt.astype(np.float64)), int(n)


def perplexity_py(text: str, lang: str, model: PplModel) -> float | None:
    lp, n = logprob10_py(text, lang, model)
    if n == 0:
        return None
    return 10.0 ** (-lp / n)


def ppl_grams_col(text: Column | str, n: int = PPL_NGRAM, cap: int = PPL_MAX_CHARS) -> Column:
    """JVM-side trigram-event array, length-gated (same guard as
    langid.grams_col: sequence(1, 0) descends, so short texts must emit
    an EMPTY array, not spurious grams)."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.lower(F.substring(c, 1, cap))  # cap BEFORE lower = text[:cap].lower()
    length = F.length(t)
    return F.when(
        length >= n,
        F.transform(
            F.sequence(F.lit(1), length - F.lit(n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_ppl_spark(
    df: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> PplModel:
    """DataFrame trainer: explode trigrams -> one partial+final hash
    agg -> collect the (small) model table driver-side. Parity with
    train_ppl_py is exact (tests/test_perplexity.py)."""
    from .langid import exploded_grams

    tri_rows = (
        exploded_grams(
            df.select(
                F.col(lang_col).alias("lang"), F.col(text_col).alias("text")
            ),
            n=PPL_NGRAM,
            cap=PPL_MAX_CHARS,
            out="g",
        )
        .groupBy("lang", "g")
        .agg(F.count("*").alias("c3"))
        .collect()
    )
    tri_by_lang: dict[str, dict[str, int]] = {}
    for r in tri_rows:
        tri_by_lang.setdefault(r["lang"], {})[r["g"]] = r["c3"]
    model: PplModel = {}
    for lang, tri in tri_by_lang.items():
        ctx: Counter[str] = Counter()
        vocab: set[str] = set()
        for g, c in tri.items():
            ctx[g[: PPL_NGRAM - 1]] += c
            vocab.add(g[PPL_NGRAM - 1])
        model[lang] = (tri, dict(ctx), len(vocab))
    return model


def save_ppl_model(spark: SparkSession, model: PplModel, path: str) -> None:
    """Persist as a (lang, gram, cnt) trigram table — ctx counts and
    vocab are derived on load, so the stored form is minimal."""
    rows = [
        (lang, g, int(c))
        for lang, (tri, _, _) in sorted(model.items())
        for g, c in sorted(tri.items())
    ]
    from ..session import local_rows_df

    local_rows_df(
        spark, rows, "lang string, gram string, cnt long", slices=4
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_ppl_model(spark: SparkSession, path: str) -> PplModel:
    tri_by_lang: dict[str, dict[str, int]] = {}
    for r in spark.read.parquet(path).collect():
        tri_by_lang.setdefault(r["lang"], {})[r["gram"]] = r["cnt"]
    model: PplModel = {}
    for lang, tri in tri_by_lang.items():
        ctx: Counter[str] = Counter()
        vocab: set[str] = set()
        for g, c in tri.items():
            ctx[g[: PPL_NGRAM - 1]] += c
            vocab.add(g[PPL_NGRAM - 1])
        model[lang] = (tri, dict(ctx), len(vocab))
    return model


_DEFAULT_PPL_MODEL: PplModel | None = None


def default_ppl_model() -> PplModel:
    """LM trained on the deterministic training corpus (the same
    samples/-analog the NB classifier trains on) — built once per
    process, broadcast at score time."""
    global _DEFAULT_PPL_MODEL
    if _DEFAULT_PPL_MODEL is None:
        from .langid import training_corpus

        _DEFAULT_PPL_MODEL = train_ppl_py(training_corpus())
    return _DEFAULT_PPL_MODEL


def make_perplexity_udf(spark: SparkSession, model: PplModel | None = None):
    """Arrow-batched (text, lang) -> perplexity under the broadcast
    model. One python hop, no shuffle — the corpus-scale scorer."""
    if model is not None:
        bc = spark.sparkContext.broadcast(model)
    else:  # default model: broadcast once per application, then reuse
        from ..session import cached_broadcast

        bc = cached_broadcast(
            spark, "perplexity.default_ppl_model", default_ppl_model
        )

    @F.pandas_udf(T.DoubleType())
    def ppl_udf(texts: pd.Series, langs: pd.Series) -> pd.Series:
        m = bc.value
        return pd.Series(
            [
                perplexity_py(t or "", l, m) if l is not None else None
                for t, l in zip(texts, langs)
            ],
            dtype="float64",
        )

    return ppl_udf


def with_perplexity(
    df: DataFrame,
    spark: SparkSession,
    lang_col: str = "lang_pred",
    text_col: str = "text",
    model: PplModel | None = None,
    out_col: str = "perplexity",
) -> DataFrame:
    return df.withColumn(
        out_col, make_perplexity_udf(spark, model)(F.col(text_col), F.col(lang_col))
    )


# ----------------------------------------------------------------------
# per-language threshold calibration (the CCNet lesson): one global
# MAX_PPL cannot serve every script — char-trigram entropy differs by
# an order of magnitude between Latin prose (clean ~3) and spaceless
# CJK (clean ~26-44, because each character is a word and the trigram
# space is undersampled at any fixed corpus size). Thresholds are
# derived deterministically from the SAME word pools the model trains
# on: per language, the geometric mean of the held-out-clean median
# and the word-salad median — the midpoint of the measured separation.
# ----------------------------------------------------------------------

_CAL_DOCS = 8
_CAL_WORDS = 200
_SALAD_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _cal_clean(lang: str, seed: int) -> str:
    """Held-out clean doc: same pools/mix as training_corpus but a
    disjoint seed namespace — measures unseen-but-in-distribution ppl."""
    import random

    from .langid import STOPWORDS, WORDS, _lang_sep

    rng = random.Random(f"ppl-cal-clean:{seed}:{lang}")
    pool, stop = WORDS[lang], STOPWORDS[lang]
    sep = _lang_sep(lang)
    words = []
    for _ in range(_CAL_WORDS):
        src = stop if rng.random() < 0.45 else pool
        words.append(src[rng.randrange(len(src))])
    return sep.join(words)


def _cal_salad(lang: str, seed: int) -> str:
    """The 'perplexed' fixture stratum shape: genuine stopwords mixed
    with ascii gibberish — what the ppl rule exists to catch."""
    import random

    from .langid import STOPWORDS, _lang_sep

    rng = random.Random(f"ppl-cal-salad:{seed}:{lang}")
    stop = STOPWORDS[lang]
    sep = _lang_sep(lang)
    out = []
    for _ in range(_CAL_WORDS):
        if rng.random() < 0.45:
            out.append(stop[rng.randrange(len(stop))])
        else:
            out.append(
                "".join(
                    rng.choice(_SALAD_ALPHABET)
                    for _ in range(rng.randint(4, 9))
                )
            )
    return sep.join(out)


def ppl_thresholds(model: PplModel, langs=None) -> dict[str, float]:
    """lang -> drop threshold: sqrt(median(clean) * median(salad)).
    Deterministic (seeded calibration docs); a language missing from
    the model gets no entry (callers fall back to quality.MAX_PPL)."""
    import statistics

    from .langid import LANGUAGES

    out: dict[str, float] = {}
    for lang in langs if langs is not None else LANGUAGES:
        if lang not in model:
            continue
        clean = [
            p
            for s in range(_CAL_DOCS)
            if (p := perplexity_py(_cal_clean(lang, s), lang, model)) is not None
        ]
        salad = [
            p
            for s in range(_CAL_DOCS)
            if (p := perplexity_py(_cal_salad(lang, s), lang, model)) is not None
        ]
        if not clean or not salad:
            continue
        out[lang] = float(
            (statistics.median(clean) * statistics.median(salad)) ** 0.5
        )
    return out


# id(model) -> (model, thresholds). The model reference is held
# STRONGLY and identity is re-checked on hit, mirroring _SCORER_CACHE:
# without it, a garbage-collected model whose address is reused by a
# new PplModel would silently serve the OLD model's thresholds —
# wrong per-language drop cutoffs with no error.
_THRESHOLD_CACHE: dict[int, tuple[PplModel, dict[str, float]]] = {}


def ppl_thresholds_for(model: PplModel) -> dict[str, float]:
    """Memoized-by-identity thresholds (the default model computes its
    calibration once per process, like the model itself)."""
    key = id(model)
    hit = _THRESHOLD_CACHE.get(key)
    if hit is not None and hit[0] is model:
        return hit[1]
    if len(_THRESHOLD_CACHE) > 8:
        _THRESHOLD_CACHE.clear()
    got = ppl_thresholds(model)
    _THRESHOLD_CACHE[key] = (model, got)
    return got
