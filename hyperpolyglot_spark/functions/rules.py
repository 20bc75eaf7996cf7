"""Ordered disambiguation rule engine with Positive/Negative/And/Or
pattern combinators — reference src/detectors/heuristics.rs:7-72
re-expressed (tests mirror heuristics.rs:74-171).

Semantics:
  - rules are consulted in order, but a rule is ELIGIBLE only if all of
    its languages are among the current candidates (heuristics.rs:53-57);
  - the first eligible rule whose pattern matches returns its
    languages; a pattern-less rule matches unconditionally (the default
    rule — the `.h -> C` trick, codegen.rs:329-336);
  - no eligible rule matches -> [].

Patterns compile ONCE at table construction (the reference recompiles
PCRE per call, heuristics.rs:24-39 — SURVEY X7 says do better). All
patterns are MULTILINE ('^'/'$' per line, like the reference's
multi_line(true)).

This is the generic engine; the cascade's per-language marker stage
(operators/cascade.py) is its one-rule-per-language special case, and
the quality keep/drop table (functions/quality.py) is the same
first-match-wins shape over numeric signals.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class Pattern:
    def matches(self, content: str) -> bool:  # pragma: no cover
        raise NotImplementedError


@dataclass
class Positive(Pattern):
    pattern: str
    _rx: re.Pattern = field(init=False, repr=False)

    def __post_init__(self):
        self._rx = re.compile(self.pattern, re.MULTILINE)

    def matches(self, content: str) -> bool:
        return self._rx.search(content) is not None


@dataclass
class Negative(Pattern):
    pattern: str
    _rx: re.Pattern = field(init=False, repr=False)

    def __post_init__(self):
        self._rx = re.compile(self.pattern, re.MULTILINE)

    def matches(self, content: str) -> bool:
        return self._rx.search(content) is None


@dataclass
class And(Pattern):
    patterns: tuple

    def matches(self, content: str) -> bool:
        return all(p.matches(content) for p in self.patterns)


@dataclass
class Or(Pattern):
    patterns: tuple

    def matches(self, content: str) -> bool:
        return any(p.matches(content) for p in self.patterns)


@dataclass
class Rule:
    languages: tuple[str, ...]
    pattern: Pattern | None = None  # None = unconditional default


def apply_rules(
    rules: list[Rule], candidates: list[str], content: str
) -> list[str]:
    """heuristics.rs:46-72: first eligible matching rule wins."""
    for rule in rules:
        if not all(lang in candidates for lang in rule.languages):
            continue
        if rule.pattern is None or rule.pattern.matches(content):
            return list(rule.languages)
    return []


# ----------------------------------------------------------------------
# web-text disambiguation rule table (DISAMBIGUATIONS analog, keyed by
# the ambiguous candidate context instead of file extension)
# ----------------------------------------------------------------------

DISAMBIGUATION_RULES: dict[str, list[Rule]] = {
    # .es/.pt/.br TLD ambiguity
    "iberian": [
        Rule(("pt",), Positive(r"(?:^|\s)(?:não|você|também)(?:\s|$)")),
        Rule(("es",), Positive(r"(?:^|\s)(?:más|usted|también)(?:\s|$)")),
        Rule(("es", "pt")),  # default: stay ambiguous
    ],
    # .ch TLD
    "swiss": [
        Rule(("de",), And((Positive(r"(?:^|\s)und(?:\s|$)"),
                           Negative(r"(?:^|\s)het(?:\s|$)")))),
        Rule(("fr",), Positive(r"(?:^|\s)(?:les|avec)(?:\s|$)")),
        Rule(("it",), Positive(r"(?:^|\s)(?:della|perché)(?:\s|$)")),
    ],
    # .be TLD
    "benelux": [
        Rule(("nl",), Or((Positive(r"(?:^|\s)het(?:\s|$)"),
                          Positive(r"(?:^|\s)een(?:\s|$)")))),
        Rule(("fr",), Positive(r"(?:^|\s)(?:les|dans)(?:\s|$)")),
    ],
    # sloppy 'scandinavian' meta tag
    "scandinavian": [
        Rule(("da",), And((Positive(r"(?:^|\s)(?:og|af)(?:\s|$)"),
                           Negative(r"(?:^|\s)och(?:\s|$)")))),
        Rule(("sv",), Positive(r"(?:^|\s)(?:och|är|eftersom)(?:\s|$)")),
        Rule(("sv", "da")),  # default: stay ambiguous
    ],
    # .fi TLD (bilingual: Finnish/Swedish)
    "finnic": [
        Rule(("fi",), Positive(r"(?:^|\s)(?:että|myös|koska|on)(?:\s|$)")),
        Rule(("sv",), Positive(r"(?:^|\s)(?:och|är)(?:\s|$)")),
        Rule(("fi", "sv")),
    ],
    # .in TLD (Hindi/English)
    "india": [
        Rule(("hi",), Positive(r"[ऀ-ॿ]")),  # any devanagari char
        Rule(("en",), Positive(r"(?:^|\s)(?:the|with|they)(?:\s|$)")),
        Rule(("hi", "en")),
    ],
    # sloppy 'cjk' meta tag: script ranges disambiguate
    "cjk": [
        Rule(("ja",), Positive(r"[぀-ヿ]")),  # kana decides japanese
        Rule(("ko",), Positive(r"[가-힯]")),  # hangul decides korean
        Rule(("zh",), Positive(r"[的是了]")),
        Rule(("zh", "ja", "ko")),
    ],
}

# Dispatch: exact candidate-set -> rule table. The cascade consults the
# table for a known context and falls back to the per-language marker
# filter otherwise (operators/cascade.py). Keying on the EXACT set
# makes rule eligibility static (every rule's languages are within its
# context — asserted below), so the column form is a pure when-ladder.
RULE_CONTEXTS: dict[frozenset[str], str] = {
    frozenset(("es", "pt")): "iberian",
    frozenset(("de", "fr", "it")): "swiss",
    frozenset(("nl", "fr")): "benelux",
    frozenset(("sv", "da")): "scandinavian",
    frozenset(("fi", "sv")): "finnic",
    frozenset(("hi", "en")): "india",
    frozenset(("zh", "ja", "ko")): "cjk",
}

for _fs, _key in RULE_CONTEXTS.items():
    for _rule in DISAMBIGUATION_RULES[_key]:
        assert set(_rule.languages) <= _fs, (_key, _rule.languages)
