"""Regex PII / toxicity scrubbing with per-pattern counts.

Generalizes the reference's regex rule machinery (heuristics.rs
Positive patterns) into rewrite rules. The pattern table is ORDERED and
applied sequentially to the running text — order is part of the spec
(e.g. credit-card before phone, so a card number is never half-eaten by
the phone rule). All patterns are RE2/Java/Python-compatible (no
lookaround, no backrefs) so the same table drives the Spark pipeline,
the pure-Python oracle, and DuckDB oracle SQL.

Regexes are compiled once at module import — once per Python worker —
not per call (the reference recompiles PCRE per match call,
heuristics.rs:24-39; SURVEY.md §4 X7 says do better, so we do).

Spark side: one Arrow-batched pandas UDF returning a struct of
(scrubbed_text, counts...) — counting + rewriting in a single pass per
batch instead of 2xN regexp passes over the text column.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (name, pattern, replacement) — ordered.
SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("credit_card", r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\+?\d{1,3}[ .-]\d{3}[ .-]\d{3,4}[ .-]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # fictional-expletive toxicity lexicon (deterministic stand-in for a
    # real lexicon; the machinery is what matters)
    ("toxicity", r"\b(?:frak|frakking|gorram|smeg|feldercarb|drokk)\b", "<TOXIC>"),
)

SCRUB_NAMES: tuple[str, ...] = tuple(name for name, _, _ in SCRUB_PATTERNS)

_COMPILED: tuple[tuple[str, re.Pattern[str], str], ...] = tuple(
    (name, re.compile(pat, re.IGNORECASE if name == "toxicity" else 0), rep)
    for name, pat, rep in SCRUB_PATTERNS
)

_TOXIC_STEMS = ("frak", "gorram", "smeg", "felder", "drokk")

# Necessary condition for card/ssn/phone/ipv4: every one of those
# patterns contains 4+ digits each separated by at most one [ .-], so a
# text without such a run cannot match any of them. Replacements never
# create one (<EMAIL> carries no digits and '<'/'>' are not separators),
# so testing the ORIGINAL text once is an exact implication.
_DIGIT_RUN_RE = re.compile(r"\d(?:[ .\-]?\d){3}")


def py_scrub(text: str) -> tuple[str, dict[str, int]]:
    """Pure-Python spec: sequentially rewrite, count per pattern.

    Cheap necessary-condition guards skip regexes that cannot match
    (exact implications, so skipping never changes the result): email
    needs '@'; card/ssn/phone/ipv4 need a 4-digit run (_DIGIT_RUN_RE);
    toxicity needs a lexicon stem (tokens can't splice new stems
    together since substitution never joins adjacent chars). Guards are
    single C-speed scans — most clean documents run zero rewrite
    regexes."""
    counts: dict[str, int] = {}
    has_digit_run = _DIGIT_RUN_RE.search(text) is not None
    for name, rx, rep in _COMPILED:
        if name == "email":
            skip = "@" not in text
        elif name == "toxicity":
            low = text.lower()
            skip = not any(s in low for s in _TOXIC_STEMS)
        else:
            skip = not has_digit_run
        if skip:
            counts[name] = 0
            continue
        text, n = rx.subn(rep, text)
        counts[name] = n
    return text, counts


_SCRUB_SCHEMA = T.StructType(
    [T.StructField("scrubbed_text", T.StringType())]
    + [T.StructField(f"scrub_{n}", T.IntegerType()) for n in SCRUB_NAMES]
)


@F.pandas_udf(_SCRUB_SCHEMA)
def _scrub_udf(texts: pd.Series) -> pd.DataFrame:
    out_text = []
    out_counts: list[list[int]] = []
    for t in texts:
        if t is None:
            out_text.append(None)
            out_counts.append([0] * len(SCRUB_NAMES))
            continue
        s, c = py_scrub(t)
        out_text.append(s)
        out_counts.append([c[n] for n in SCRUB_NAMES])
    df = pd.DataFrame({"scrubbed_text": out_text})
    for i, n in enumerate(SCRUB_NAMES):
        df[f"scrub_{n}"] = [row[i] for row in out_counts]
    return df


def with_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append scrubbed_text + scrub_<pattern> count columns.

    Runs AFTER keep/drop so dropped docs never pay for it: callers pass
    only kept rows, or we mask here — scrub only where keep, else pass
    text through untouched (cheap branch, no Python for dropped rows).
    """
    s = _scrub_udf(F.col(text_col))
    df = df.withColumn("_scrub", s)
    df = df.withColumn("scrubbed_text", F.col("_scrub.scrubbed_text"))
    for n in SCRUB_NAMES:
        df = df.withColumn(f"scrub_{n}", F.col(f"_scrub.scrub_{n}"))
    return df.drop("_scrub")
