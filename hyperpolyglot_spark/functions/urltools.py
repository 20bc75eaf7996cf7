"""URL canonicalization — the crawl-dedup stage upstream of content
dedup (a Common-Crawl-style pipeline dedupes by canonical URL before
it ever hashes content).

Semantics (ordered, each step is part of the spec):
  1. strip the fragment
  2. lowercase scheme://host[:port] (the authority is case-insensitive;
     the PATH IS case-sensitive and is left alone)
  3. drop default ports :80/:443
  4. remove tracking query params (utm_*, fbclid, gclid, ref),
     repairing separators so real params survive in order
  5. collapse duplicate slashes in the path
  6. strip trailing slashes (a bare root '/' is kept)

Three implementations with identical results, all generated from the
SAME step table so they cannot drift:
  - ``py_canonical_url``     — pure-Python spec (oracle mode)
  - ``canonical_url_col``    — Spark Column (JVM regexp built-ins via
    F.expr; whole-stage codegen, no UDF — at 10^12 urls this runs
    inside the scan projection)
  - ``canonical_url_sql``    — DuckDB SQL string (oracle side)

Param REORDERING is deliberately out of scope (sorting a query string
is not expressible as a regexp chain and servers may be order-
sensitive); the step list handles the high-volume dup sources.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# sentinel for removed params — cannot appear in a URL (generator
# guarantees; real crawl urls are ASCII after percent-encoding)
_S = "§"

TRACKING_PARAMS = ("utm_[A-Za-z0-9_]*", "fbclid", "gclid", "ref")

_HEAD_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_TRACK_PAT = r"[?&](?:%s)=[^&#]*" % "|".join(TRACKING_PARAMS)

# (pattern, replacement) applied IN ORDER to the path+query part.
REST_STEPS: tuple[tuple[str, str], ...] = (
    (_TRACK_PAT, _S),  # mark tracking params
    (_S + "+", _S),  # collapse adjacent marks
    (r"\?" + _S + "&", "?"),  # removed first param: next one leads
    (_S + "&", "&"),  # removed middle param
    (r"[?&]?" + _S + "$", ""),  # removed last param(s)
    (_S, ""),  # stray marks (mid-string runs already merged)
    (r"/{2,}", "/"),  # duplicate slashes
)


def py_canonical_url(url: str) -> str:
    """Pure-Python spec."""
    s = re.sub(r"#.*$", "", url)
    m = re.match(_HEAD_PAT, s)
    head = m.group(0) if m else ""
    rest = s[len(head):]
    head = re.sub(r":(80|443)$", "", head.lower())
    for pat, rep in REST_STEPS:
        rest = re.sub(pat, rep, rest)
    stripped = re.sub(r"/+$", "", rest)
    if stripped == "" and rest != "":
        stripped = "/"
    return head + stripped


def _sql_quote(pat: str) -> str:
    return "'" + pat.replace("\\", "\\\\").replace("'", "''") + "'"


def _canonical_expr(col_sql: str, dialect: str) -> str:
    """One expression text per dialect, generated from the shared
    steps. Differences handled: DuckDB regexp_replace needs the 'g'
    flag for replace-all (Spark's is global by default), and pattern
    literals are escaped per backslash convention."""
    g = ", 'g'" if dialect == "duckdb" else ""

    def q(pat: str) -> str:
        if dialect == "duckdb":
            return "'" + pat.replace("'", "''") + "'"
        # Spark SQL string literals process backslash escapes
        return "'" + pat.replace("\\", "\\\\").replace("'", "''") + "'"

    def rr(expr: str, pat: str, rep: str) -> str:
        return f"regexp_replace({expr}, {q(pat)}, '{rep}'{g})"

    nofrag = rr(col_sql, r"#.*$", "")
    head_raw = f"regexp_extract({nofrag}, {q(_HEAD_PAT)}, 0)"
    head = rr(f"lower({head_raw})", r":(80|443)$", "")
    rest = f"substr({nofrag}, length({head_raw}) + 1)"
    for pat, rep in REST_STEPS:
        rest = rr(rest, pat, rep)
    stripped = rr(rest, r"/+$", "")
    tail = (
        f"CASE WHEN {stripped} = '' AND {rest} <> '' THEN '/' "
        f"ELSE {stripped} END"
    )
    return f"concat({head}, {tail})"


def canonical_url_col(col_sql: str = "url") -> Column:
    """Spark Column over a column NAME (or SQL sub-expression) — pure
    JVM regexp built-ins, codegen'd, no Python in the path."""
    return F.expr(_canonical_expr(col_sql, "spark"))


def canonical_url_sql(col_sql: str = "url") -> str:
    """The identical expression as DuckDB SQL (oracle side)."""
    return _canonical_expr(col_sql, "duckdb")
