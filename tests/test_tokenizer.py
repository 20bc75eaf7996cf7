"""Tokenizer golden tests — cases transcribed from the reference suite
crates/polyglot_tokenizer/src/tokenizer.rs:411-809 (FIXTURES.md §4).
Expected values are (kind, full-lexeme) pairs; the reference's
three-part String/BlockComment tokens are compared by concatenation.
"""

from hyperpolyglot_spark.functions.tokenizer import (
    get_classifier_tokens,
    get_key_tokens,
    tokenize,
)


def toks(content):
    return [(t.kind, t.text) for t in tokenize(content)]


def test_idents_symbols():  # tokenizer.rs:416-456
    sample = """
        fn main() {
            let x_x2 = 京y;
            let _ = 4;
            println!("{}", x_x2);
        }
        """
    assert toks(sample) == [
        ("ident", "fn"), ("ident", "main"), ("symbol", "("), ("symbol", ")"),
        ("symbol", "{"), ("ident", "let"), ("ident", "x_x2"), ("symbol", "="),
        ("ident", "京y"), ("symbol", ";"), ("ident", "let"), ("ident", "_"),
        ("symbol", "="), ("number", "4"), ("symbol", ";"),
        ("ident", "println"), ("symbol", "!"), ("symbol", "("),
        ("string", '"{}"'), ("symbol", ","), ("ident", "x_x2"),
        ("symbol", ")"), ("symbol", ";"), ("symbol", "}"),
    ]


def test_numbers():  # tokenizer.rs:458-500
    sample = "1; 1_000; -1; -1_000; 1.5; .1.5; 1.1.4; 0b1010; 0o700; 0xFFFFFFFFFFFFFFFFF;"
    got = toks(sample)
    nums = [t for t in got if t[0] == "number"]
    assert nums == [
        ("number", "1"), ("number", "1_000"), ("number", "-1"),
        ("number", "-1_000"), ("number", "1.5"), ("number", "1.5"),
        ("number", "1.1"), ("number", "4"), ("number", "0b1010"),
        ("number", "0o700"), ("number", "0xFFFFFFFFFFFFFFFFF"),
    ]
    assert ("symbol", ".") in got


def test_line_comments():  # tokenizer.rs:502-526
    sample = (
        "// this is a line comment\n/// this is also one\n//\n"
        "--Another line\n## Python here\n% anotha one\n"
    )
    assert toks(sample) == [
        ("line_comment", "// this is a line comment"),
        ("line_comment", "/// this is also one"),
        ("line_comment", "//"),
        ("line_comment", "--Another line"),
        ("line_comment", "## Python here"),
        ("line_comment", "% anotha one"),
    ]


def test_strings():  # tokenizer.rs:528-545
    sample = "\"Hello, World\"\n'Heyyy, single quotes'\n`Back ticks`\n"
    assert toks(sample) == [
        ("string", '"Hello, World"'),
        ("string", "'Heyyy, single quotes'"),
        ("string", "`Back ticks`"),
    ]


def test_string_multiline():  # tokenizer.rs:547-562
    sample = '""" Hey there\n        this is a multiliner"""'
    assert toks(sample) == [
        ("string", '""" Hey there\n        this is a multiliner"""')
    ]


def test_string_multiline_other():  # tokenizer.rs:564-579
    sample = "''' hey single quotes '''\n``` hey backticks ```"
    assert toks(sample) == [
        ("string", "''' hey single quotes '''"),
        ("string", "``` hey backticks ```"),
    ]


def test_string_unterminated_multiline():  # tokenizer.rs:581-592
    assert toks('\n        """\n        ') == [
        ("symbol", '"'),
        ("string", '""'),
    ]


def test_incomplete_string():  # tokenizer.rs:594-608
    assert toks('\n  "Hello\n  10\n') == [
        ("symbol", '"'),
        ("ident", "Hello"),
        ("number", "10"),
    ]


def test_escaped_quote():  # tokenizer.rs:610-620
    assert toks('"Hello\\" World"') == [("string", '"Hello\\" World"')]


def test_mismatched_string_identifiers():  # tokenizer.rs:622-633
    assert toks("\"Hello World'\n") == [
        ("symbol", '"'),
        ("ident", "Hello"),
        ("ident", "World"),
        ("symbol", "'"),
    ]


def test_block_comments():  # tokenizer.rs:635-656
    sample = "/* Comment Here */\n/*    */\n/**/\n/*\n * Multi line*/"
    assert toks(sample) == [
        ("block_comment", "/* Comment Here */"),
        ("block_comment", "/*    */"),
        ("block_comment", "/**/"),
        ("block_comment", "/*\n * Multi line*/"),
    ]


def test_other_block_comments():  # tokenizer.rs:658-673
    assert toks("{-comment-}\n(*block*)") == [
        ("block_comment", "{-comment-}"),
        ("block_comment", "(*block*)"),
    ]


def test_html_comment():  # tokenizer.rs:675-702
    sample = "<!-- Comment Here-->\n<!---->\n<!--       -->"
    assert toks(sample) == [
        ("block_comment", "<!-- Comment Here-->"),
        ("block_comment", "<!---->"),
        ("block_comment", "<!--       -->"),
    ]


def test_unterminated_html_comment():  # tokenizer.rs:704-715
    assert toks("\n  <!-- hey\n") == [
        ("symbol", "<"),
        ("symbol", "!"),
        ("line_comment", "-- hey"),
    ]


def test_lt_not_comment():  # tokenizer.rs:717-728
    assert toks("< let x\n") == [
        ("symbol", "<"),
        ("ident", "let"),
        ("ident", "x"),
    ]
    assert toks("<") == [("symbol", "<")]


def test_unterminated_block_comment():  # tokenizer.rs:741-752
    assert toks("/* let x\n") == [
        ("symbol", "/"),
        ("symbol", "*"),
        ("ident", "let"),
        ("ident", "x"),
    ]


def test_random_chars():  # tokenizer.rs:754-764
    assert toks("\n    →\n") == [("symbol", "→")]


def test_nested_backlog():  # tokenizer.rs:766-787
    sample = "/* `helloworldwhat\n let x = 5\n"
    assert toks(sample) == [
        ("symbol", "/"),
        ("symbol", "*"),
        ("symbol", "`"),
        ("ident", "helloworldwhat"),
        ("ident", "let"),
        ("ident", "x"),
        ("symbol", "="),
        ("number", "5"),
    ]


def test_escaped_string_suite():  # tokenizer.rs:789-808
    sample = '"Hello \\"World"\n"Hello World\\\\"\n"Hello World\\" x\n'
    assert toks(sample) == [
        ("string", '"Hello \\"World"'),
        ("string", '"Hello World\\\\"'),
        ("symbol", '"'),
        ("ident", "Hello"),
        ("ident", "World"),
        ("symbol", "\\"),
        ("symbol", '"'),
        ("ident", "x"),
    ]


def test_get_key_tokens():  # lib.rs:6-12 doctest
    assert get_key_tokens('let x = [5, "hello"];') == [
        "let", "x", "=", "[", ",", "]", ";",
    ]


def test_classifier_token_cap():  # classifier.rs:9,24-26
    long_ident = "a" * 33
    assert get_classifier_tokens(f"x {long_ident} y") == ["x", "y"]
    # 32-byte multibyte boundary: 11 CJK chars = 33 bytes -> dropped
    assert get_classifier_tokens("京" * 11) == []
    assert get_classifier_tokens("京" * 10) == ["京" * 10]
