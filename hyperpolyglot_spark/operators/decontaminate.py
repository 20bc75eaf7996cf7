"""Benchmark decontamination: flag training documents that share
verbatim word n-grams with an evaluation set.

The standard LLM-training-data hygiene stage (GPT-3 appendix C /
PaLM-style 13-gram overlap, generalized to a configurable n): the
benchmark side is tiny (thousands of eval items), the corpus side is
the 10^12-document crawl — so the scale shape is a BROADCAST hash
semi-join of exploded corpus n-grams against the distinct benchmark
n-gram set, followed by one per-doc aggregation. No shuffle touches
the corpus until the (doc_id, matched-gram) pairs — output-sized, not
corpus-sized.

N-gram construction stays whole-stage-codegen'd: explode an INT
sequence and slice/array_join AFTERWARDS (slice/array_join are
catalyst expressions, not interpreted HOF lambdas — the same 3.8x
lesson as langid.exploded_grams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_N = 8  # documents here are ~100 words; 13 suits web-scale text


def py_word_ngrams(text: str, n: int = DEFAULT_N) -> set[str]:
    """Pure-Python spec: distinct space-joined word n-grams."""
    words = text.split()
    return {
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    }


def doc_word_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, gram) — one row per distinct word n-gram per document.

    Tokenization must match ``py_word_ngrams`` (``text.split()``) and
    the DuckDB oracle (``list_filter(..., x <> '')``): Spark's
    ``split`` keeps the empty strings that leading/trailing
    whitespace produces, and ``F.trim`` strips only ASCII spaces (not
    tabs/newlines) — so empty tokens are filtered explicitly here or
    dirty whitespace would shift every n-gram window.  ``F.filter``
    with a ``!=`` predicate is a catalyst ArrayFilter expression, not
    an interpreted python lambda — still codegen-friendly."""
    w = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    out = (
        df.select(
            F.col(id_col),
            w.alias("_w"),
        )
        # length gate BEFORE the int-sequence: sequence(1, 0) DESCENDS
        # in Spark (same pitfall as langid.exploded_grams)
        .filter(F.size("_w") >= n)
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.size("_w") - (n - 1))
            ).alias("_i"),
            "_w",
        )
        .select(
            id_col,
            F.array_join(F.expr(f"slice(_w, _i, {n})"), " ").alias("gram"),
        )
        .distinct()
    )
    return out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits) for every document sharing at least one word
    n-gram with the benchmark set. The benchmark gram table is
    broadcast; the corpus-side distinct() dedupes per (doc, gram) so
    n_hits counts DISTINCT overlapping n-grams (repeats of one leaked
    phrase don't inflate the score)."""
    bgrams = (
        doc_word_ngrams(
            benchmark.select(F.col(bench_text_col).alias("text"), F.lit(0).alias("_id")),
            "text",
            n,
            "_id",
        )
        .select("gram")
        .distinct()
    )
    dgrams = doc_word_ngrams(docs, text_col, n, id_col)
    return (
        dgrams.join(F.broadcast(bgrams), "gram")
        .groupBy(id_col)
        .agg(F.countDistinct("gram").alias("n_hits"))
    )
