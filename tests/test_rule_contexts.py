"""Round-3 breadth: per-context decisive-sample tests for the 31
contexts added on top of the round-2 table (72 total vs the
reference's 69 heuristics.yml blocks). Each case is (context key,
text, expected languages); the last case per context exercises the
pattern-less default. Pure Python — the JVM column form is held to
the same spec by tests/test_jvm_parity.py's row-by-row cascade
parity."""

import pytest

from hyperpolyglot_spark.functions.rules import (
    DISAMBIGUATION_RULES,
    RULE_CONTEXTS,
    apply_rules,
)

CASES = [
    ("hellenic", "αυτό είναι ελληνικό κείμενο", ["el"]),
    ("hellenic", "the weather with them", ["en"]),
    ("hellenic", "1234 5678", ["el", "en"]),
    ("siam", "ภาษาไทยสวยงาม", ["th"]),
    ("siam", "the weather with them", ["en"]),
    ("annam", "tiếng việt của chúng tôi", ["vi"]),
    ("annam", "không có gì", ["vi"]),
    ("annam", "the weather report", ["en"]),
    ("pannonia", "és nem tudom hogy", ["hu"]),
    ("pannonia", "jól sikerült a műsor", ["hu"]),
    ("pannonia", "pentru că este bine", ["ro"]),
    ("eastromance", "și pentru toți", ["ro"]),
    ("eastromance", "della vita perché", ["it"]),
    ("westslavic", "żółta łódź", ["pl"]),
    ("westslavic", "se že ano", ["cs"]),
    ("westslavic", "řeka běží", ["cs"]),
    ("galicia", "це текст українською", ["uk"]),
    ("galicia", "to się jest nie", ["pl"]),
    ("illyrian", "dhe për të gjithë", ["sq"]),
    ("bengal", "বাংলা ভাষা", ["bn"]),
    ("andhra", "తెలుగు భాష", ["te"]),
    ("kerala", "മലയാളം ഭാഷ", ["ml"]),
    ("nippon", "これは日本語のテキストです", ["ja"]),
    ("hanguk", "한국어 텍스트입니다", ["ko"]),
    ("sino", "这是中文文本", ["zh"]),
    ("runet", "это русский текст", ["ru"]),
    ("mashreq", "هذا نص عربي", ["ar"]),
    ("anatolia", "bu bir türkçe metin ve daha fazlası", ["tr"]),
    ("iran", "این متن فارسی است", ["fa"]),
    ("israel", "זהו טקסט בעברית", ["he"]),
    ("nusantara", "teks yang ditulis dengan baik", ["id"]),
    ("nusantara", "the text with they", ["en"]),
    ("rhine", "die straße ist lang", ["de"]),
    ("rhine", "und so weiter", ["de"]),
    ("rhine", "het is een huis", ["nl"]),
    ("alpine", "dans les rues avec", ["fr"]),
    ("alpine", "della città perché", ["it"]),
    ("pyrenees", "más que usted pero", ["es"]),
    ("pyrenees", "avec les amis", ["fr"]),
    ("mediterranean", "usted pero más", ["es"]),
    ("mediterranean", "perché della vita", ["it"]),
    ("lusitalic", "você também não", ["pt"]),
    ("lusitalic", "che perché della", ["it"]),
    ("balticrim", "see on hõlpsasti võimalik", ["et"]),
    ("balticrim", "koska että myös", ["fi"]),
    ("balticrim", "och det är bra", ["sv"]),
    ("norse", "þetta er íslenska", ["is"]),
    ("norse", "av norge fordi ikke", ["no"]),
    ("aegean", "ελληνικά εδώ", ["el"]),
    ("aegean", "türkçe ve metin için", ["tr"]),
    ("laurentia", "dans les rues avec", ["fr"]),
    ("laurentia", "the road with them", ["en"]),
    ("southafrica", "dit is nie die einde van alles", ["af"]),
    ("southafrica", "the end with them", ["en"]),
    ("polesia", "гэта беларуская мова і не", ["be"]),
    ("polesia", "потому что это хорошо", ["ru"]),
    # 102-language universe contexts
    ("india12", "ਪੰਜਾਬੀ ਭਾਸ਼ਾ", ["pa"]),
    ("india12", "ગુજરાતી ભાષા", ["gu"]),
    ("india12", "ଓଡ଼ିଆ ଭାଷା", ["or"]),
    ("india12", "ಕನ್ನಡ ಭಾಷೆ", ["kn"]),
    ("india12", "தமிழ் மொழி", ["ta"]),
    ("india12", "यह हिंदी में है", ["hi"]),
    ("india12", "the text with them", ["en"]),
    ("india12", "12345", ["hi", "en"]),
    ("breizh", "n'eo ket brezhoneg gant an dud", ["br"]),
    ("breizh", "dans les rues avec", ["fr"]),
    ("letzebuerg", "awer et ass tëschent dem duerf", ["lb"]),
    ("letzebuerg", "die straße und so", ["de"]),
    ("letzebuerg", "dans les rues avec", ["fr"]),
    ("malta", "din hija ħaġa sabiħa", ["mt"]),
    ("malta", "the road with them", ["en"]),
    ("rwanda", "ariko cyangwa hagati yabyo", ["rw"]),
    ("lanka3", "සිංහල භාෂාව", ["si"]),
    ("lanka3", "தமிழ் மொழி", ["ta"]),
    ("lanka3", "the road with them", ["en"]),
    ("zimbabwe", "uye kuti asi zvakanaka", ["sn"]),
    ("khorasan", "دا ښار ډېر ښکلی دی", ["ps"]),
    ("khorasan", "این شهر بزرگ است", ["fa"]),
    ("kreyol", "mwen rete nan vil la anpil", ["ht"]),
    ("kreyol", "dans les rues avec", ["fr"]),
    ("madagascar", "izay tsy misy olona rehetra", ["mg"]),
    ("friesland", "dat is yn de wrâld", ["fy"]),
    ("friesland", "het is een huis", ["nl"]),
    ("naija", "àti pé ó dára", ["yo"]),
    ("naija", "ihe nke ọma mana ọ dị", ["ig"]),
    ("naija", "amma kuma yana da kyau ƙwarai", ["ha"]),
    ("latium", "sed quod est verum", ["la"]),
    ("latium", "della vita perché", ["it"]),
    ("kirghiz", "жана менен анткени жакшы", ["ky"]),
    ("kirghiz", "потому что это хорошо", ["ru"]),
    ("pamir", "ҷаҳон ва кӯҳҳо", ["tg"]),
    ("turkestan", "bu uchun yaxshi emas", ["uz"]),
    ("turkestan", "это русский текст", ["ru"]),
    ("slavic3", "это русский текст", ["ru"]),
    ("slavic3", "żółta łódź jest", ["pl"]),
    ("slavic3", "protože se řeka běží", ["cs"]),
    ("romance4", "você também não", ["pt"]),
    ("romance4", "más que usted pero", ["es"]),
    ("romance4", "dans les rues avec", ["fr"]),
    ("romance4", "della vita perché", ["it"]),
]


@pytest.mark.parametrize("key,text,expected", CASES)
def test_decisive_sample(key, text, expected):
    cands = sorted(
        next(fs for fs, k in RULE_CONTEXTS.items() if k == key)
    )
    assert apply_rules(DISAMBIGUATION_RULES[key], cands, text) == expected


def test_every_context_has_reachable_outcome():
    """On neutral text every table either stays ambiguous via its
    default rule or returns [] (falls through to the classifier) —
    no table may raise or return languages outside its context."""
    for fs, key in RULE_CONTEXTS.items():
        out = apply_rules(DISAMBIGUATION_RULES[key], sorted(fs), "0 1 2")
        assert set(out) <= fs, key


def test_every_multicandidate_tld_has_context():
    from hyperpolyglot_spark.functions.langdata import TLD_LANGS

    for tld, langs in TLD_LANGS.items():
        if len(langs) > 1:
            assert frozenset(langs) in RULE_CONTEXTS, tld


def test_every_multicandidate_meta_tag_has_context():
    from hyperpolyglot_spark.functions.langdata import META_LANG_CANDS

    for tag, langs in META_LANG_CANDS.items():
        if len(langs) > 1:
            assert frozenset(langs) in RULE_CONTEXTS, tag


def test_all_dim_tables_reference_known_languages():
    """Referential integrity across every dimension table: a hint that
    emits a code outside LANGUAGES silently poisons lang_pred (caught
    live: 'br'->'br-fr', 'tk'->'tk-tm', 'la'->'la-va' — the
    locale-suffixed KEY written as the VALUE; the oracle shares the
    table, so only this test can see it)."""
    from hyperpolyglot_spark.functions.langdata import (
        LANGUAGES,
        META_LANG_CANDS,
        TLD_LANGS,
        URL_LANG_HINTS,
    )

    known = set(LANGUAGES)
    assert set(URL_LANG_HINTS.values()) <= known
    for tag, langs in META_LANG_CANDS.items():
        assert set(langs) <= known, tag
    for tld, langs in TLD_LANGS.items():
        assert set(langs) <= known, tld
    for fs in RULE_CONTEXTS:
        assert set(fs) <= known, fs
    # INTERPRETER_LANGS is deliberately NOT checked here: it is the
    # reference's shebang domain (programming-language names), a
    # separate universe from the web-pipeline natural-language codes.


def test_every_reachable_stage4_set_has_a_context():
    """Coverage audit (VERDICT r3 #8, mirroring heuristics.yml's
    per-extension completeness): enumerate every candidate set that
    can reach stage 4 — each multi-language TLD entry, and each TLD
    set narrowed by each possible meta-tag candidate list — and assert
    it has a RULE_CONTEXTS entry, i.e. the cascade never silently
    falls back to the one-marker filter for a reachable context."""
    from hyperpolyglot_spark.functions.langdata import (
        META_LANG_CANDS,
        TLD_LANGS,
    )
    from hyperpolyglot_spark.functions.rules import RULE_CONTEXTS
    from hyperpolyglot_spark.operators.cascade import filter_candidates

    missing = set()
    for tld, cands in TLD_LANGS.items():
        s = list(cands)
        if len(s) > 1 and frozenset(s) not in RULE_CONTEXTS:
            missing.add((tld, "-", frozenset(s)))
        for meta, mc in META_LANG_CANDS.items():
            t = filter_candidates(s, list(mc))
            if len(t) > 1 and frozenset(t) not in RULE_CONTEXTS:
                missing.add((tld, meta, frozenset(t)))
    assert not missing, sorted(
        (tld, meta, sorted(fs)) for tld, meta, fs in missing
    )
