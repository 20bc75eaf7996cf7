"""Shebang detector + rule-engine combinator tests — transcribed from
reference interpreters.rs:67-158 and heuristics.rs:74-171 (FIXTURES.md
§5-6)."""

from hyperpolyglot_spark.functions.rules import (
    And,
    Negative,
    Or,
    Positive,
    Rule,
    apply_rules,
)
from hyperpolyglot_spark.functions.shebang import (
    get_languages_from_shebang,
    parse_shebang_interpreter,
)


# --- shebang (interpreters.rs:67-158) ---------------------------------
def test_shebang_basic():
    assert get_languages_from_shebang("#!/usr/bin/python") == ["Python"]


def test_shebang_env():
    assert get_languages_from_shebang("#!/usr/bin/env node") == ["JavaScript"]


def test_shebang_multiple():
    langs = sorted(get_languages_from_shebang("#!/usr/bin/parrot"))
    assert langs == ["Parrot Assembly", "Parrot Internal Representation"]


def test_shebang_minor_version():
    assert get_languages_from_shebang("#!/usr/bin/python2.6") == ["Python"]
    assert parse_shebang_interpreter("#!/usr/bin/python2.6.3") == "python"


def test_shebang_empty_cases():
    for content in ("#!/usr/bin/env", "#!", "", "aslkdfjas;ldk",
                    " #!/usr/bin/python", " #!/usr/bin/ ", " #!/usr/bin"):
        assert get_languages_from_shebang(content) == [], repr(content)


def test_shebang_sh_exec_hack():
    content = '#!/bin/sh\n   exec scala "$0" "$@"\n!#\n'
    assert get_languages_from_shebang(content) == ["Scala"]


def test_shebang_sh_plain():
    assert get_languages_from_shebang("#!/bin/sh\necho hi\n") == ["Shell"]


# --- rule engine combinators (heuristics.rs:74-171) --------------------
RULES = [
    Rule(("A",), Positive(r"^alpha")),
    Rule(("B",), Negative(r"beta")),
    Rule(("C",), And((Positive(r"see"), Positive(r"cee")))),
    Rule(("D",), And((Positive(r"dee"), Negative(r"nope")))),
    Rule(("E",), Or((Positive(r"ee!"), Positive(r"eh\?")))),
    Rule(("F", "G")),  # pattern-less default
]
CANDS = ["A", "B", "C", "D", "E", "F", "G"]


def test_positive_multiline_anchor():
    assert apply_rules(RULES, ["A"], "x\nalpha starts this line") == ["A"]
    assert apply_rules(RULES, ["A"], "not alpha anywhere at start") == []


def test_negative():
    assert apply_rules(RULES, ["B"], "clean text") == ["B"]
    assert apply_rules(RULES, ["B"], "contains beta here") == []


def test_and_of_positives():
    assert apply_rules(RULES, ["C"], "see and cee") == ["C"]
    assert apply_rules(RULES, ["C"], "only see") == []


def test_and_with_negative():
    assert apply_rules(RULES, ["D"], "dee yes") == ["D"]
    assert apply_rules(RULES, ["D"], "dee but nope") == []


def test_or():
    assert apply_rules(RULES, ["E"], "ee!") == ["E"]
    assert apply_rules(RULES, ["E"], "eh?") == ["E"]
    assert apply_rules(RULES, ["E"], "nah") == []


def test_default_rule_and_order():
    # first eligible matching rule wins; default always matches
    assert apply_rules(RULES, CANDS, "alpha") == ["A"]
    assert apply_rules(RULES, CANDS, "beta see cee") == ["C"]
    assert apply_rules(RULES, CANDS, "beta zzz") == ["F", "G"]


def test_rule_skipped_if_languages_not_subset():
    # heuristics.rs:53-57: rule eligible only if languages ⊆ candidates
    assert apply_rules(RULES, ["F"], "anything") == []  # F,G rule needs G too
    assert apply_rules(RULES, ["F", "G"], "anything") == ["F", "G"]


def test_no_rules_match_empty():
    assert apply_rules(RULES, [], "alpha") == []
