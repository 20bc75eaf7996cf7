"""Text analysis columns for training-data pipelines: token counting,
type-token ratio, document fingerprinting (rolling hash), and a
composite quality score. All pure built-ins (JVM, codegen) — designed
to be DuckDB-oracle-expressible for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FP_MOD = 1_000_000_007
FP_BASE = 31


def words_col(text: Column) -> Column:
    return F.filter(F.split(text, r"[ \t\n\r]+"), lambda w: w != "")


def token_count_col(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_col(text)).cast("long")


BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish subword proxy: count of letter runs + digit runs +
    single other non-space chars — the standard cheap token estimate
    when no real tokenizer is shipped. Lookaround-free so the same
    pattern runs under Java regex and RE2 (DuckDB oracle)."""
    return F.regexp_count(text, F.lit(BPE_ISH_RE)).cast("long")


def distinct_token_ratio_col(text: Column) -> Column:
    w = words_col(text)
    return F.size(F.array_distinct(w)).cast("double") / F.greatest(
        F.size(w), F.lit(1)
    ).cast("double")


def fingerprint_col(text: Column) -> Column:
    """Polynomial rolling hash over code points:
    h = (h*31 + codepoint) mod 1e9+7. Stays far below int64 overflow at
    every step (ANSI-safe); identical arithmetic is expressible in
    DuckDB list_reduce for the oracle."""
    chars = F.filter(F.split(text, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )


# Script character classes (literal ranges — compile identically under
# Java regex, RE2/DuckDB, and python re). Used for per-doc script-mix
# ratios: the standard multilingual-corpus signal for detecting mixed
# CJK/Latin boilerplate, transliteration spam, or mislabeled docs.
SCRIPT_CLASSES: dict[str, str] = {
    "latin": "A-Za-zÀ-ɏḀ-ỿ",
    "cjk": "一-鿿぀-ヿ가-힯",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "devanagari": "ऀ-ॿ",
}


def script_ratio_col(text: Column, script: str) -> Column:
    """Fraction of characters in the given script's ranges."""
    cls = SCRIPT_CLASSES[script]
    n = F.length(text)
    kept = n - F.length(F.regexp_replace(text, f"[{cls}]", ""))
    return kept.cast("double") / F.greatest(n, F.lit(1)).cast("double")


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality score: length (saturating at 500 chars),
    lexical diversity, and word-shape sanity (mean word length 3-12)."""
    n = F.length(text).cast("double")
    len_score = F.least(n / 500.0, F.lit(1.0))
    ttr = distinct_token_ratio_col(text)
    w = words_col(text)
    mean_wlen = n / F.greatest(F.size(w), F.lit(1)).cast("double")
    shape_score = F.when(
        (mean_wlen >= 3.0) & (mean_wlen <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round((len_score + ttr + shape_score) / 3.0, 6)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count_col(t))
        .withColumn("n_subtokens", bpe_ish_token_count_col(t))
        .withColumn("ttr", F.round(distinct_token_ratio_col(t), 6))
        .withColumn("fingerprint", fingerprint_col(t))
        .withColumn("quality_score", quality_score_col(t))
    )
