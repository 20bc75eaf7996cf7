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

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_N = 8  # documents here are ~100 words; 13 suits web-scale text

# GPT-3 appendix-C style span removal: the contaminated n-gram plus
# this many characters either side is REMOVED, not the whole document.
PAD_CHARS = 200

# span/rewrite operators normalize whitespace with this EXPLICIT class
# so Python re, Java regex, and RE2/DuckDB agree byte-for-byte (\s
# differs per engine: Python's is unicode-aware, Java/RE2's are ASCII)
_WS_CLASS = r"[ \t\n\r]+"
_WS_RE = re.compile(_WS_CLASS)


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
    distinct: bool = True,
) -> DataFrame:
    """(id, gram) — one row per (distinct, by default) word n-gram per
    document. Corpus-side callers that follow with a selective
    broadcast join pass ``distinct=False``: the pre-join distinct was a
    CORPUS-sized shuffle of every gram string, while the join drops
    almost every row — filter first, dedupe the survivors (r07,
    guide §2.3 shuffle-fewer-bytes).

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
    )
    return out.distinct() if distinct else out


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
    # distinct=False: countDistinct below dedupes the (tiny) matched
    # set; the corpus gram stream flows map-side into the broadcast
    # join without ever shuffling
    dgrams = doc_word_ngrams(docs, text_col, n, id_col, distinct=False)
    return (
        dgrams.join(F.broadcast(bgrams), "gram")
        .groupBy(id_col)
        .agg(F.countDistinct("gram").alias("n_hits"))
    )


# ----------------------------------------------------------------------
# span extraction + rewrite (round 5): GPT-3-style pipelines REMOVE the
# contaminated span (the matched n-gram ± PAD_CHARS), not the document
# ----------------------------------------------------------------------

def py_norm(text: str) -> str:
    """Whitespace-normalized text — the coordinate system every span
    refers to (positions in raw bytes would differ per engine once
    tabs/newlines collapse)."""
    return " ".join(t for t in _WS_RE.split(text) if t)


def py_contamination_spans(
    text: str, bench_grams: set[str], n: int = DEFAULT_N, pad: int = PAD_CHARS
) -> list[tuple[int, int]]:
    """Merged contamination regions of the NORMALIZED text as 1-based
    [start, end) intervals: the FIRST occurrence of each matched
    benchmark n-gram, padded ±pad chars, overlapping/adjacent regions
    merged."""
    T = py_norm(text)
    words = T.split(" ") if T else []
    grams = {
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    }
    raw = []
    for g in sorted(grams & bench_grams):
        p = T.find(g) + 1  # 1-based; >= 1 by construction
        s = max(1, p - pad)
        e = min(len(T) + 1, p + len(g) + pad)
        raw.append([s, e])
    raw.sort()
    merged: list[list[int]] = []
    for s, e in raw:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [(s, e) for s, e in merged]


def py_decontaminate_rewrite(
    text: str, spans: list[tuple[int, int]]
) -> str:
    """Normalized text with the spans cut out; surviving pieces joined
    with a single space (direct concatenation would glue the word
    fragments at the cut edges together)."""
    T = py_norm(text)
    pieces = []
    prev = 1
    for s, e in spans:
        pieces.append(T[prev - 1 : s - 1])
        prev = e
    pieces.append(T[prev - 1 :])
    return " ".join(p for p in pieces if p)


def _norm_col(c) -> F.Column:
    return F.trim(F.regexp_replace(c, _WS_CLASS, " "))


def _hit_positions(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int,
    pad: int,
    text_col: str,
    id_col: str,
    bench_text_col: str,
) -> DataFrame:
    """(id, _t, s, e) raw padded intervals per matched gram.

    Scale shape: the corpus never carries its text through the gram
    explode (that would duplicate ~n x the corpus). Matched doc ids
    (output-sized) are broadcast back to prune the corpus scan to the
    contaminated docs, and only those few texts join the hit grams —
    the same candidates-only trick as the dedup index probe."""
    norm_docs = docs.select(
        F.col(id_col), _norm_col(F.col(text_col)).alias("_t")
    )
    bgrams = (
        doc_word_ngrams(
            benchmark.select(
                F.col(bench_text_col).alias("text"), F.lit(0).alias("_id")
            ),
            "text",
            n,
            "_id",
        )
        .select("gram")
        .distinct()
    )
    # grams from the NORMALIZED text so every located gram is
    # guaranteed to occur verbatim in the coordinate system spans use
    # (raw-text \s+ tokenization could split on chars the normalizer
    # collapses differently, e.g. \f)
    # distinct=False + post-join distinct: dedupe only the matched
    # (id, gram) survivors instead of shuffling every corpus gram
    hits = (
        doc_word_ngrams(norm_docs, "_t", n, id_col, distinct=False)
        .join(F.broadcast(bgrams), "gram")
        .distinct()
    )
    texts = norm_docs.join(
        F.broadcast(hits.select(id_col).distinct()), id_col
    )
    p = F.expr("locate(gram, _t)")
    g = F.broadcast(hits).join(texts, id_col).withColumn("_p", p)
    return g.select(
        id_col,
        "_t",
        F.greatest(F.lit(1), F.col("_p") - pad).alias("s"),
        F.least(
            F.length("_t") + 1, F.col("_p") + F.length("gram") + pad
        ).alias("e"),
    )


def _merged_spans(raw: DataFrame, id_col: str) -> DataFrame:
    """Classic gaps-and-islands merge, all JVM window functions — the
    identical algorithm the DuckDB oracle runs. Partitions are per
    contaminated doc (output-sized), so the windows are tiny."""
    w = Window.partitionBy(id_col).orderBy("s", "e")
    prev_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = raw.withColumn(
        "_new", F.when(prev_e.isNull() | (F.col("s") > prev_e), 1).otherwise(0)
    ).withColumn("_isl", F.sum("_new").over(w))
    return isl.groupBy(id_col, "_isl").agg(
        F.min("s").alias("span_start"),
        (F.max("e") - F.min("s")).alias("span_len"),
        F.max("e").alias("_end"),
        F.first("_t").alias("_t"),
    )


def contamination_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_N,
    pad: int = PAD_CHARS,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, span_start, span_len) merged contamination regions —
    py_contamination_spans distributed."""
    raw = _hit_positions(
        docs, benchmark, n, pad, text_col, id_col, bench_text_col
    )
    return _merged_spans(raw, id_col).select(
        id_col, "span_start", "span_len"
    )


def decontaminate_rewrite(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_N,
    pad: int = PAD_CHARS,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, cleaned_text) for CONTAMINATED docs: normalized text
    with the merged spans removed, pieces joined by one space —
    py_decontaminate_rewrite distributed. Untouched docs are not
    returned (the caller unions them unchanged — no reason to rewrite
    10^12 clean rows). The piece-stitching runs over the per-doc
    sorted span array with F.aggregate: an interpreted HOF, but over
    output-sized arrays of a handful of structs, not corpus data."""
    raw = _hit_positions(
        docs, benchmark, n, pad, text_col, id_col, bench_text_col
    )
    merged = _merged_spans(raw, id_col)
    per_doc = merged.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "_end"))
        ).alias("_spans"),
        F.first("_t").alias("_t"),
    )
    stitched = F.aggregate(
        "_spans",
        F.struct(
            F.lit(1).cast("int").alias("pos"), F.lit("").alias("out")
        ),
        lambda acc, sp: F.struct(
            sp["_end"].cast("int").alias("pos"),
            F.concat(
                acc["out"],
                F.when(
                    (sp["span_start"] - acc["pos"] > 0)
                    & (acc["out"] != ""),
                    F.lit(" "),
                ).otherwise(F.lit("")),
                F.substring(
                    F.col("_t"), acc["pos"], sp["span_start"] - acc["pos"]
                ),
            ).alias("out"),
        ),
        lambda acc: acc,
    )
    tail = F.substring(F.col("_t"), F.col("_acc")["pos"], 0x7FFFFFFF)
    return (
        per_doc.withColumn("_acc", stitched)
        .withColumn(
            "cleaned_text",
            F.concat(
                F.col("_acc")["out"],
                F.when(
                    (tail != "") & (F.col("_acc")["out"] != ""), F.lit(" ")
                ).otherwise(F.lit("")),
                tail,
            ),
        )
        .select(id_col, "cleaned_text")
    )
