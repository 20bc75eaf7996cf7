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
