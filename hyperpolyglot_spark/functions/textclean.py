"""Within-document cleaning: C4-style duplicate-line removal.

Web pages repeat boilerplate lines (nav menus, cookie banners,
"subscribe" calls) inside one document; C4's cleaning removes exact
duplicate lines, keeping the FIRST occurrence in order. The operator
is a pure per-row array expression — no shuffle, no Python — and the
same formulation runs in DuckDB (list comprehension + list_position),
so the oracle is structural, not a frozen table.

Complexity note: first-occurrence via array_position is O(L^2) line
comparisons per doc. The quality ladder's too_long rule bounds docs at
40k chars (≈ low thousands of lines worst case), so the quadratic
term is bounded per row and stays embarrassingly parallel; for a
corpus of pathological line counts, switch to the posexplode +
row_number window form (one shuffle) instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NL = "\n"


def py_dedupe_lines(text: str) -> tuple[str, int]:
    """(cleaned_text, n_lines_removed) — first occurrence wins,
    order preserved. The pure-python spec of the column form."""
    lines = text.split(NL)
    seen: set[str] = set()
    keep = []
    for l in lines:
        if l not in seen:
            seen.add(l)
            keep.append(l)
    return NL.join(keep), len(lines) - len(keep)


def dedupe_lines_cols(text: Column) -> tuple[Column, Column]:
    """(cleaned_text, n_removed) column expressions: keep line i iff
    its FIRST occurrence index is i (array_position is 1-based)."""
    lines = F.split(text, NL)
    keep = F.filter(
        lines, lambda x, i: F.array_position(lines, x) == i + F.lit(1)
    )
    return F.array_join(keep, NL), F.size(lines) - F.size(keep)


def with_deduped_lines(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "cleaned_text",
    removed_col: str = "n_lines_removed",
) -> DataFrame:
    cleaned, removed = dedupe_lines_cols(F.col(text_col))
    return df.withColumn(out_col, cleaned).withColumn(removed_col, removed)


def dedupe_lines_sql(text_expr: str = "text") -> tuple[str, str]:
    """The identical semantics as DuckDB SQL expressions
    (cleaned, n_removed) over ``text_expr`` — generated here so both
    engines share one formulation."""
    ls = f"string_split({text_expr}, chr(10))"
    kept = (
        f"[{ls}[i] for i in range(1, len({ls})+1)"
        f" if list_position({ls}, {ls}[i]) = i]"
    )
    return (
        f"array_to_string({kept}, chr(10))",
        f"len({ls}) - len({kept})",
    )


def common_lines(
    df: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lines that occur in >= min_docs DISTINCT documents — the
    corpus-level boilerplate set (C4 removes lines appearing in >= 3
    docs: nav menus, cookie banners, footers repeat across a site's
    pages, content lines don't)."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), NL)).alias("line"),
    )
    return (
        lines.groupBy("line")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def common_line_filter(
    df: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove corpus-common lines from every document, preserving the
    remaining lines' order. Within-doc duplicates of a NON-common line
    survive (that is ``with_deduped_lines``'s job — the two filters
    compose).

    Scale shape: two shuffles, both unavoidable for a cross-doc
    operator — (1) the line-count aggregation (map-side combine, the
    per-line partial counts are tiny), (2) the per-doc rebuild. The
    common-line set is broadcast back (boilerplate sets are small by
    nature — bounded by lines-per-site, not corpus size), so the
    corpus-sized side never joins shuffled. Docs whose every line is
    common still emit a row (empty cleaned text) — dropping them
    silently would desync row counts downstream.
    """
    pos_lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), NL)).alias("pos", "line"),
    )
    common = common_lines(df, min_docs, text_col, id_col).select("line")
    kept = pos_lines.join(F.broadcast(common), "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            NL,
        ).alias("cleaned_text"),
        F.count("*").alias("_kept"),
    )
    n_lines = F.size(F.split(F.col(text_col), NL))
    return (
        df.select(F.col(id_col), n_lines.alias("_n"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias(
                "cleaned_text"
            ),
            (F.col("_n") - F.coalesce(F.col("_kept"), F.lit(0))).alias(
                "n_lines_removed"
            ),
        )
    )
