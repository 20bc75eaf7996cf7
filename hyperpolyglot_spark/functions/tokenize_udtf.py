"""Python UDTF surface: the polyglot tokenizer as a table-valued
function (SURVEY.md §2.8 — the one UDF-surface row that was missing).

``TokenizeUDTF`` explodes a document into one row per token
(pos, kind, token) via LATERAL join:

    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    SELECT d.doc_id, t.* FROM docs d, LATERAL tokenize_udtf(d.text) t

The token stream is the exact reference-parity tokenizer
(functions/tokenizer.py, transcribed from
crates/polyglot_tokenizer/src/tokenizer.rs) — deterministic, so the
``doc_tokens`` query is oracle-checked against a frozen expected table
computed from the same pure-python spec (tools/gen_expected.py).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, kind string, token string")
class TokenizeUDTF:
    def eval(self, text: str):  # noqa: D102 - UDTF contract
        from .tokenizer import tokenize

        for i, tok in enumerate(tokenize(text or "")):
            yield i, tok.kind, tok.text


def register(spark) -> None:
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
