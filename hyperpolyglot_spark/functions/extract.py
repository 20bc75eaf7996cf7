"""Deterministic HTML -> text extraction (library-free, version-pinned).

The per-row invariant (BASELINE.json input_hint) is byte-identical
extracted text per url, so extraction is a pure function of the html
bytes with no external parser dependency (SURVEY.md §7.3). Decode
policy: UTF-8 with errors="replace" — documented here as THE policy
(the reference differs by code path: detect() errors on invalid UTF-8,
src/lib.rs:169-171, while training coerces to "", codegen.rs:390; we
pick one and apply it everywhere).

Content is capped at MAX_CONTENT_BYTES=51200 at a char boundary after
extraction, mirroring reference MAX_CONTENT_SIZE_BYTES
(src/lib.rs:22,198-207).
"""

from __future__ import annotations

import re

MAX_CONTENT_BYTES = 51200  # reference src/lib.rs:22

# Boilerplate containers dropped wholesale (vendor/doc filter analog at
# the intra-document level); then all remaining tags are stripped.
_DROP_BLOCK_RE = re.compile(
    r"<(script|style|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

# Fixed, closed entity table — no library drift.
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so "&amp;lt;" -> "&lt;" (no double decode)
)


def truncate_to_char_boundary(s: str, max_bytes: int = MAX_CONTENT_BYTES) -> str:
    """Byte-cap a str at a UTF-8 char boundary (src/lib.rs:198-207)."""
    raw = s.encode("utf-8")
    if len(raw) <= max_bytes:
        return s
    cut = raw[:max_bytes]
    # back off continuation bytes (0b10xxxxxx) to the char boundary
    end = max_bytes
    while end > 0 and (cut[end - 1] & 0xC0) == 0x80:
        end -= 1
    if end > 0 and cut[end - 1] >= 0xC0:  # leading byte of a cut char
        end -= 1
    return raw[:end].decode("utf-8")


def extract_text(html: bytes | str) -> str:
    """Pure function html-bytes -> extracted text. THE reference impl.

    Steps (order is part of the spec):
      1. decode utf-8, errors="replace"
      2. drop <!-- comments -->
      3. drop script/style/nav/header/footer/aside blocks
      4. strip all remaining tags
      5. decode the fixed entity table
      6. collapse whitespace runs to single spaces, strip ends
      7. byte-cap at 51200 on a char boundary
    """
    if isinstance(html, bytes):
        text = html.decode("utf-8", errors="replace")
    else:
        text = html
    text = _COMMENT_RE.sub(" ", text)
    text = _DROP_BLOCK_RE.sub(" ", text)
    text = _TAG_RE.sub(" ", text)
    for ent, rep in _ENTITIES:
        text = text.replace(ent, rep)
    text = _WS_RE.sub(" ", text).strip()
    return truncate_to_char_boundary(text)


_META_LANG_RE = re.compile(
    r"<html\b[^>]*?\blang\s*=\s*[\"']([A-Za-z-]{2,16})[\"']", re.IGNORECASE
)


def meta_lang_tag(html: bytes | str) -> str | None:
    """Declared <html lang="..."> tag, lowercased (shebang-parse analog,
    reference src/detectors/interpreters.rs:8-59 — reads only the head
    of the content)."""
    if isinstance(html, bytes):
        head = html[:2048].decode("utf-8", errors="replace")
    else:
        head = html[:2048]
    m = _META_LANG_RE.search(head)
    return m.group(1).lower() if m else None
