"""Language-agnostic tokenizer — Python re-expression of the reference
``polyglot_tokenizer`` state machine (crates/polyglot_tokenizer/src/
tokenizer.rs:242-396; backlog mechanism :84-239; numeric closure
:399-409). Semantics follow the crate's doctests and unit tests
(tokenizer.rs:411-809), which are the authoritative spec.

Token kinds: ident, number, line_comment, block_comment, string,
symbol. Unterminated strings / block comments backtrack via a backlog
queue: the opening char is emitted as a symbol and the consumed tail is
re-lexed char by char (tokenizer.rs:84-118, 226-238).

This feeds classifier training and scoring for code-like text, so
determinism matters more than speed; it runs inside Arrow-batched
pandas UDFs (one compiled module per Python worker).
"""

from __future__ import annotations

from collections import deque
from typing import Iterator, NamedTuple

MAX_KEY_TOKEN_BYTES = 32  # reference src/detectors/classifier.rs:9


class Tok(NamedTuple):
    kind: str  # ident|number|line_comment|block_comment|string|symbol
    text: str  # full lexeme (includes delimiters, like the Rust slices)


_ASCII_PUNCT = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")


class _Lexer:
    def __init__(self, content: str) -> None:
        self.s = content
        self.n = len(content)
        self.i = 0                      # next index in content
        self.backlog: deque[int] = deque()  # indices to re-lex first

    # -- char stream with backlog (tokenizer.rs:84-118) --------------
    def _peek_idx(self) -> int | None:
        if self.backlog:
            return self.backlog[0]
        return self.i if self.i < self.n else None

    def _advance(self) -> int | None:
        if self.backlog:
            return self.backlog.popleft()
        if self.i < self.n:
            idx = self.i
            self.i += 1
            return idx
        return None

    def _push_backlog(self, start: int, end: int) -> None:
        for idx in range(end - 1, start - 1, -1):
            self.backlog.appendleft(idx)

    def _peek(self) -> str | None:
        idx = self._peek_idx()
        return self.s[idx] if idx is not None else None

    # -- helpers ------------------------------------------------------
    def _take_while(self, cond) -> int:
        """Consume chars while cond holds; return index after last taken
        (tokenizer.rs:145-160 take_if)."""
        while True:
            idx = self._peek_idx()
            if idx is None:
                return self.n
            if not cond(self.s[idx]):
                return idx
            self._advance()

    def _eat_whitespace(self) -> None:
        self._take_while(str.isspace)

    def _eat_non_newline_ws(self) -> int:
        return self._take_while(lambda c: c.isspace() and c not in "\r\n")

    def _line_comment(self, start: int, marker_char: str) -> Tok:
        """``//``-style comment: all marker chars, leading ws eaten,
        content to EOL (tokenizer.rs:283-296)."""
        self._take_while(lambda c: c == marker_char)
        self._eat_non_newline_ws()
        end = self._take_while(lambda c: c not in "\r\n")
        return Tok("line_comment", self.s[start:end])

    def _take_block(self, tok_start: int, end_seq: str, kind: str) -> Tok:
        """Consume until end_seq; on EOF backtrack: emit the opening
        char as symbol and re-lex the rest (take_block semantics per
        the crate's tests — unterminated constructs backtrack)."""
        window = ""
        while True:
            if window.endswith(end_seq):
                return Tok(kind, self.s[tok_start : self._pos()])
            idx = self._advance()
            if idx is None:
                # unterminated: backlog everything after the first char
                self._push_backlog(tok_start + 1, self.n)
                return Tok("symbol", self.s[tok_start : tok_start + 1])
            window = (window + self.s[idx])[-len(end_seq) :]

    def _pos(self) -> int:
        if self.backlog:
            return self.backlog[0]
        return self.i

    def _block_comment(self, tok_start: int, start_seq: str, end_seq: str) -> Tok:
        """Match the rest of start_seq (first char already consumed);
        partial match backtracks (tokenizer.rs:177-203)."""
        consumed = 1
        for expected in start_seq[1:]:
            if self._peek() == expected:
                self._advance()
                consumed += 1
            else:
                self._push_backlog(tok_start + 1, tok_start + consumed)
                return Tok("symbol", self.s[tok_start : tok_start + 1])
        return self._take_block(tok_start, end_seq, "block_comment")

    def _numeric(self, start: int) -> Tok:
        seen_decimal = False

        def cond(c: str) -> bool:
            nonlocal seen_decimal
            if c.isnumeric() or c == "_":
                return True
            if c == "." and not seen_decimal:
                seen_decimal = True
                return True
            return False

        end = self._take_while(cond)
        return Tok("number", self.s[start:end])

    def _string(self, start: int, q: str) -> Tok:
        # The char stream is always index-contiguous (backlog ranges are
        # contiguous and resume exactly where the main stream left off),
        # so slicing s[start:take_while_end] is safe everywhere.
        run_end = self._take_while(lambda c: c == q)
        run = self.s[start:run_end]
        if len(run) == 1:
            # single-line string, escape-aware (tokenizer.rs:326-360)
            is_escaped = False

            def cond(c: str) -> bool:
                nonlocal is_escaped
                take = not ((c == q and not is_escaped) or c == "\n")
                is_escaped = c == "\\" and not is_escaped
                return take

            end = self._take_while(cond)
            if self._peek() == q:
                self._advance()
                return Tok("string", self.s[start : end + 1])
            # unterminated: backlog content, opening quote is a symbol
            self._push_backlog(start + 1, end)
            return Tok("symbol", self.s[start : start + 1])
        if len(run) == 2:
            return Tok("string", run)  # empty string
        return self._take_block(start, run, "string")

    # -- main loop (tokenizer.rs:242-396) -----------------------------
    def tokens(self) -> Iterator[Tok]:
        while True:
            self._eat_whitespace()
            idx = self._advance()
            if idx is None:
                return
            ch = self.s[idx]
            if ch.isalpha() or ch == "_":
                end = self._take_while(lambda c: c.isalnum() or c == "_")
                yield Tok("ident", self.s[idx:end])
            elif ch == "0" and self._peek() in ("b", "o", "x"):
                base = self._peek()
                self._advance()
                digits = {
                    "b": set("01_"),
                    "o": set("01234567_"),
                    "x": set("0123456789abcdefABCDEF_"),
                }[base]
                end = self._take_while(lambda c: c in digits)
                yield Tok("number", self.s[idx:end])
            elif ch in "+-":
                nxt = self._peek()
                if nxt is not None and nxt.isnumeric():
                    yield self._numeric(idx)
                elif ch == "-" and nxt == "-":
                    yield self._line_comment(idx, "-")
                else:
                    yield Tok("symbol", ch)
            elif ch.isnumeric():
                yield self._numeric(idx)
            elif ch == "/":
                nxt = self._peek()
                if nxt == "/":
                    yield self._line_comment(idx, "/")
                elif nxt == "*":
                    yield self._block_comment(idx, "/*", "*/")
                else:
                    yield Tok("symbol", ch)
            elif ch == "{":
                if self._peek() == "-":
                    yield self._block_comment(idx, "{-", "-}")
                else:
                    yield Tok("symbol", ch)
            elif ch == "(":
                if self._peek() == "*":
                    yield self._block_comment(idx, "(*", "*)")
                else:
                    yield Tok("symbol", ch)
            elif ch == "<":
                yield self._block_comment(idx, "<!--", "-->")
            elif ch in "#%":
                yield self._line_comment(idx, ch)
            elif ch in "\"'`":
                yield self._string(idx, ch)
            elif ch in _ASCII_PUNCT:
                yield Tok("symbol", ch)
            else:
                yield Tok("symbol", ch)


def tokenize(content: str) -> list[Tok]:
    """All tokens (py_polyglot_tokenizer binding analog,
    crates/py_polyglot_tokenizer/src/lib.rs:5-18)."""
    return list(_Lexer(content).tokens())


def get_key_tokens(content: str) -> list[str]:
    """Idents + symbols only (crates/polyglot_tokenizer/src/lib.rs:13-18):
    numbers, comments, and terminated strings drop out entirely."""
    return [t.text for t in _Lexer(content).tokens() if t.kind in ("ident", "symbol")]


def get_classifier_tokens(content: str) -> list[str]:
    """Key tokens capped at 32 UTF-8 bytes (classifier.rs:24-26)."""
    return [
        t
        for t in get_key_tokens(content)
        if len(t.encode("utf-8")) <= MAX_KEY_TOKEN_BYTES
    ]
