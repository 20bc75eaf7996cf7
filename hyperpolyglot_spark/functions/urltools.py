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
  5. collapse duplicate slashes in the PATH (the query is opaque —
     '?next=https://b//x' and '?q=a/' are preserved verbatim)
  6. strip trailing slashes from the PATH (a bare root '/' is kept;
     a trailing '/' in a query value is data, not structure)

Three implementations with identical results, all generated from the
SAME step table so they cannot drift:
  - ``py_canonical_url``     — pure-Python spec (oracle mode)
  - ``canonical_url_col``    — Spark Column (JVM regexp built-ins via
    F.expr; whole-stage codegen, no UDF — at 10^12 urls this runs
    inside the scan projection)
  - ``canonical_url_sql``    — DuckDB SQL string (oracle side)

The tracking-param mark CAPTURES its leading delimiter and re-emits it
(``\\1§``) rather than consuming it: consuming the '?' made
'?utm_a=1&b=2' canonicalize to '&b=2' (the '\\?§&' repair could never
match) so the same page with/without a leading tracking param missed
dedup, and a literal path '/p&b=2' falsely merged with it. Group
references in the REPLACEMENT are portable across Python re, Java
(``$1``), and RE2/DuckDB (``\\1``) — unlike lookbehind, which RE2
lacks — so the generator translates the convention per dialect.

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
# capture the delimiter so the repair steps still see it (see module
# docstring); replacement uses python \1 convention, translated per
# dialect by the generator.
_TRACK_PAT = r"([?&])(?:%s)=[^&#]*" % "|".join(TRACKING_PARAMS)

# (pattern, replacement) applied IN ORDER to the whole path+query part
# — every pattern here anchors on '?'/'&'/the sentinel, so the path is
# untouched unless it literally contains those (same as a real crawl
# canonicalizer operating on the request target).
QUERY_STEPS: tuple[tuple[str, str], ...] = (
    (_TRACK_PAT, "\\1" + _S),  # mark tracking params, keep delimiter
    (_S + "(?:&" + _S + ")+", _S),  # collapse runs of removed params
    (r"\?" + _S + "&", "?"),  # removed first param: next one leads
    ("&" + _S, ""),  # removed middle/last param
    (r"\?" + _S + "$", ""),  # every param was tracking
    (_S, ""),  # stray marks (defensive; generator invariant says none)
)

# applied to the PATH only, after the query is split off.
_PATH_DUP_SLASH = (r"/{2,}", "/")


def py_canonical_url(url: str) -> str:
    """Pure-Python spec."""
    s = re.sub(r"#.*$", "", url)
    m = re.match(_HEAD_PAT, s)
    head = m.group(0) if m else ""
    rest = s[len(head):]
    head = re.sub(r":(80|443)$", "", head.lower())
    for pat, rep in QUERY_STEPS:
        rest = re.sub(pat, rep, rest)
    qpos = rest.find("?")
    path, query = (rest, "") if qpos < 0 else (rest[:qpos], rest[qpos:])
    path = re.sub(*_PATH_DUP_SLASH, path)
    stripped = re.sub(r"/+$", "", path)
    if stripped == "" and path != "":
        stripped = "/"
    return head + stripped + query


def _sql_quote(pat: str) -> str:
    return "'" + pat.replace("\\", "\\\\").replace("'", "''") + "'"


def _canonical_expr(col_sql: str, dialect: str) -> str:
    """One expression text per dialect, generated from the shared
    steps. Differences handled: DuckDB regexp_replace needs the 'g'
    flag for replace-all (Spark's is global by default), pattern
    literals are escaped per backslash convention, and replacement
    group refs are ``$1`` in Java/Spark vs ``\\1`` in RE2/DuckDB."""
    g = ", 'g'" if dialect == "duckdb" else ""

    def q(pat: str) -> str:
        if dialect == "duckdb":
            return "'" + pat.replace("'", "''") + "'"
        # Spark SQL string literals process backslash escapes
        return "'" + pat.replace("\\", "\\\\").replace("'", "''") + "'"

    def qrep(rep: str) -> str:
        if dialect == "duckdb":
            return "'" + rep.replace("'", "''") + "'"  # RE2 rewrite: \1
        return "'" + rep.replace("\\1", "$1").replace("'", "''") + "'"

    def rr(expr: str, pat: str, rep: str) -> str:
        return f"regexp_replace({expr}, {q(pat)}, {qrep(rep)}{g})"

    nofrag = rr(col_sql, r"#.*$", "")
    head_raw = f"regexp_extract({nofrag}, {q(_HEAD_PAT)}, 0)"
    head = rr(f"lower({head_raw})", r":(80|443)$", "")
    rest = f"substr({nofrag}, length({head_raw}) + 1)"
    for pat, rep in QUERY_STEPS:
        rest = rr(rest, pat, rep)
    path = f"regexp_extract({rest}, {q(r'^[^?]*')}, 0)"
    query = f"regexp_extract({rest}, {q(r'[?].*$')}, 0)"
    path = rr(path, *_PATH_DUP_SLASH)
    stripped = rr(path, r"/+$", "")
    tail = (
        f"CASE WHEN {stripped} = '' AND {path} <> '' THEN '/' "
        f"ELSE {stripped} END"
    )
    return f"concat({head}, {tail}, {query})"


def canonical_url_col(col_sql: str = "url") -> Column:
    """Spark Column over a column NAME (or SQL sub-expression) — pure
    JVM regexp built-ins, codegen'd, no Python in the path."""
    return F.expr(_canonical_expr(col_sql, "spark"))


def canonical_url_sql(col_sql: str = "url") -> str:
    """The identical expression as DuckDB SQL (oracle side)."""
    return _canonical_expr(col_sql, "duckdb")
