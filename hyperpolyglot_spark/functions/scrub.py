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

# A hextet (1-4 hex chars) that contains at least one DIGIT — used by
# the compressed-ipv6 branches so a bare all-letter token before '::'
# ('DB::Fetch', 'a::b in perl', 'dead::', 'fe::') is never scrubbed:
# those are code identifiers far more often than addresses. Spelled as
# an enumeration (digit at position 0/1/2/3) because the table must
# stay lookaround-free for RE2/DuckDB.
_DIGIT_HEXTET = (
    "(?:[0-9][0-9A-Fa-f]{0,3}|[A-Fa-f][0-9][0-9A-Fa-f]{0,2}"
    "|[A-Fa-f]{2}[0-9][0-9A-Fa-f]?|[A-Fa-f]{3}[0-9])"
)
_HEXTET = "[0-9A-Fa-f]{1,4}"
# optional right side after '::' (trailing '::' is legal, e.g. 'fe80::')
_IP6_TAIL = r"(?:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,5}\b)?"

# (name, pattern, replacement) — ordered. Order is spec: iban before
# credit_card (a card-shaped digit span inside an IBAN must not be
# half-eaten), ssn before phone, ipv6 before ipv4, shape rules before
# lexicon rules. Names starting with 'toxicity' compile IGNORECASE.
SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IBAN shape: 2-letter country + 2 check digits + 8-31 alnum BBAN,
    # optionally space-grouped by 4 (public ISO 13616 shape)
    (
        "iban",
        r"\b[A-Z]{2}\d{2}(?: ?[A-Z0-9]{4}){2,7}(?: ?[A-Z0-9]{1,3})?\b",
        "<IBAN>",
    ),
    ("credit_card", r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
    # US SSN variants: dashed or spaced groups
    ("ssn", r"\b\d{3}[ -]\d{2}[ -]\d{4}\b", "<SSN>"),
    ("phone", r"\b\+?\d{1,3}[ .-]\d{3}[ .-]\d{3,4}[ .-]\d{4}\b", "<PHONE>"),
    # international/NANP parenthesized area code: (212) 555-0143,
    # (020) 7946 0958
    ("phone_paren", r"\(\d{2,4}\)[ .-]?\d{3,4}[ .-]\d{3,4}\b", "<PHONE>"),
    # ipv6: full/partial form, then the common :: compressions —
    # '2001:db8::1', 'fe80::8a2e:370:7334', trailing 'fe80::', leading
    # '::1'. Compressed branches require >=2 leading hextet groups OR a
    # digit in the leading/first hextet (r6 ADVICE): a lone all-letter
    # hex-looking token around '::' is code ('DB::Fetch', 'a::b',
    # 'dead::'), so those — and the rare all-letter addresses like
    # 'a::b' or '::beef' — are deliberately NOT scrubbed (precision
    # over recall on code-bearing web text). \b placement: a trailing
    # '::' ends at a non-word char (no \b possible there), and a
    # LEADING '::' cannot take \b either, hence the un-anchored-left
    # branch; inside it the multi-group alternative precedes the
    # single-digit-hextet one so leftmost-FIRST matching still takes
    # the longest address ('::10ab:cd' scrubs whole, not '::10ab').
    # KNOWN residual (ADVICE r6, accepted): the un-anchored leading-::
    # branch still fires mid-identifier when the RIGHT side looks
    # hex-with-digit — 'std::f1' scrubs to 'std<IP6>' — because
    # rejecting it needs lookbehind, which RE2 (the shared
    # Spark/DuckDB dialect) does not support; same precision trade as
    # the 'DB::Fetch' class above, documented rather than half-fixed.
    (
        "ipv6",
        rf"\b(?:{_HEXTET}:){{4,7}}{_HEXTET}\b"
        rf"|\b(?:{_HEXTET}:){{2,6}}:{_IP6_TAIL}"
        rf"|\b{_DIGIT_HEXTET}::{_IP6_TAIL}"
        rf"|::(?:{_HEXTET}(?::{_HEXTET}){{1,6}}\b|{_DIGIT_HEXTET}\b)",
        "<IP6>",
    ),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # street-address shape: house number + capitalized street name +
    # suffix word
    (
        "address",
        r"\b\d{1,5} [A-Z][a-z]+ "
        r"(?:Street|Avenue|Boulevard|Road|Lane|Drive|Court|Place|Terrace"
        r"|Way|St|Ave|Blvd|Rd|Ln|Dr)\b",
        "<ADDR>",
    ),
    # fictional toxicity lexicons (deterministic stand-ins for real
    # lexicon classes; the machinery — ordered classes, per-class
    # counts, guards — is what matters): expletives, slurs, threats
    (
        "toxicity",
        r"\b(?:frak|frakking|gorram|smeg|feldercarb|drokk)\b",
        "<TOXIC>",
    ),
    (
        "toxicity_slur",
        r"\b(?:clanker|meatbag|mudblood|skinjob|wirehead)s?\b",
        "<TOXIC>",
    ),
    (
        "toxicity_threat",
        r"\b(?:frag|airlock|vape)(?:ging|ing)? (?:you|him|her|them)\b",
        "<TOXIC>",
    ),
)

SCRUB_NAMES: tuple[str, ...] = tuple(name for name, _, _ in SCRUB_PATTERNS)

_COMPILED: tuple[tuple[str, re.Pattern[str], str], ...] = tuple(
    (
        name,
        re.compile(pat, re.IGNORECASE if name.startswith("toxicity") else 0),
        rep,
    )
    for name, pat, rep in SCRUB_PATTERNS
)

_TOXIC_STEMS = ("frak", "gorram", "smeg", "felder", "drokk")
_SLUR_STEMS = ("clanker", "meatbag", "mudblood", "skinjob", "wirehead")
_THREAT_STEMS = ("frag", "airlock", "vape")

# Necessary conditions, each tested against the ORIGINAL text — exact
# implications because no replacement tag carries a digit, a colon, or
# a lexicon stem, and substitution can never join adjacent characters
# into a new match ('<'/'>' break \b-delimited stems and separators):
#   card/ssn/phone/phone_paren/ipv4 -> a 4+ digit run with <=1 [ .-]
#   separator between digits; iban -> [A-Z]{2}\d{2}; ipv6 -> >=4 ':'
#   or a '::' (compressed forms); address -> any digit; toxicity
#   classes -> a stem substring.
_DIGIT_RUN_RE = re.compile(r"\d(?:[ .\-]?\d){3}")
_IBAN_HINT_RE = re.compile(r"[A-Z]{2}\d\d")
_ANY_DIGIT_RE = re.compile(r"\d")

# The three toxicity classes use disjoint \b-delimited word sets, and
# a rewrite can never create or destroy another class's match ('<'/'>'
# break stems), so the sequential per-class scans are equivalent to ONE
# combined scan with per-class attribution — a 3x cut on lexicon-
# bearing docs. Built from SCRUB_PATTERNS so the table (and the
# generated sequential DuckDB oracle) stays the single source of truth.
_TOX_NAMES = tuple(n for n, _, _ in SCRUB_PATTERNS if n.startswith("toxicity"))
_TOX_COMBINED = re.compile(
    "|".join(
        f"(?P<{name}>{pat})"
        for name, pat, _ in SCRUB_PATTERNS
        if name.startswith("toxicity")
    ),
    re.IGNORECASE,
)
_TOX_REPLACEMENT = "<TOXIC>"
_TOX_STEMS_BY_NAME = {
    "toxicity": _TOXIC_STEMS,
    "toxicity_slur": _SLUR_STEMS,
    "toxicity_threat": _THREAT_STEMS,
}


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
    tox_done = False
    for name, rx, rep in _COMPILED:
        if name.startswith("toxicity"):
            if not tox_done:
                text = _scrub_toxicity(text, counts)
                tox_done = True
            continue
        if name == "email":
            skip = "@" not in text
        elif name == "iban":
            skip = _IBAN_HINT_RE.search(text) is None
        elif name == "ipv6":
            # exact implication: every branch needs >=4 ':' (full
            # form) or a '::' (compressed forms)
            skip = text.count(":") < 4 and "::" not in text
        elif name == "address":
            skip = _ANY_DIGIT_RE.search(text) is None
        else:  # card/ssn/phone/phone_paren/ipv4
            skip = not has_digit_run
        if skip:
            counts[name] = 0
            continue
        text, n = rx.subn(rep, text)
        counts[name] = n
    return text, counts


def _scrub_toxicity(text: str, counts: dict[str, int]) -> str:
    """One combined scan for all toxicity classes (see _TOX_COMBINED
    note) — identical output to the sequential per-class scans."""
    for n in _TOX_NAMES:
        counts[n] = 0
    low = text.lower()
    active = [
        n
        for n, stems in _TOX_STEMS_BY_NAME.items()
        if any(s in low for s in stems)
    ]
    if not active:
        return text

    def _sub(m: "re.Match[str]") -> str:
        counts[m.lastgroup] += 1
        return _TOX_REPLACEMENT

    return _TOX_COMBINED.sub(_sub, text)


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
