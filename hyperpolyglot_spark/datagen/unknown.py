"""Out-of-universe fixture documents for the unresolved-language gate.

The reference's ``detect`` returns ``None`` when zero candidate
languages remain (src/lib.rs:187-189); a web crawl's language tail (the
reference ships 553 languages — languages.yml — this universe 102)
needs the same open-world outcome. These documents exercise the three
stages of langid's unresolved gate:

  * ``UNKNOWN_SCRIPT`` — real languages written in scripts with no
    language in the 102-universe (Cherokee, Inuktitut syllabics, Yi,
    Vai, Tamazight/Tifinagh, Old Church Slavonic/Glagolitic, Deseret,
    Elder Futhark, Ogham): the known-script ratio stage fires, the
    exact analog of "0 candidates".
  * ``ALIEN_LATIN`` — Latin-script text with trigram statistics alien
    to every trained language: the NB margin/abs-score stage or the
    script-coherence stage fires (the hashed model's OOV grams land in
    arbitrary buckets, so the nominal argmax is usually 'zh'/'ja' —
    script-incoherent with a Latin doc).
  * ``RESOLVABLE_GIBBERISH`` — documented FALSE NEGATIVES: near-Latin
    pronounceable gibberish whose bucket collisions give a trained
    language a decisive margin. Kept in the fixture (and the oracled
    query) so the gate's recall limit is measured, not hidden — the
    same trade a fastText confidence cutoff makes.
  * ``REAL_OOV_LATIN`` — the hardest case: real languages outside the
    universe written in a KNOWN script, where only the NB noise gate
    can fire; per-doc outcomes (caught vs nearest-relative
    false-resolve) are pinned by the frozen oracle and
    tests/test_unresolved.py.

All content is original/hand-written for this repo (the non-Latin
passages are generic greetings/word lists, not copied prose).
"""

from __future__ import annotations

# (name, text) — doc_ids are assigned by fixture_rows() at 10_000+.
UNKNOWN_SCRIPT: tuple[tuple[str, str], ...] = (
    (
        "cherokee",
        "ᏣᎳᎩ ᎦᏬᏂᎯᏍᏗ ᎠᏂᏴᏫᏯ ᎤᎾᏕᏅᎢ ᎾᎿ ᏓᎾᏁᎶᎲᏍᎬ ᎤᏬᏪᎳᏅ ᎠᎴ ᏗᎪᏪᎵ "
        "ᏧᎾᏕᎶᏆᏍᏗ ᎤᏂᎸᏉᏗ ᎠᏂᏬᏂᏍᎩ ᎾᏍᎩ ᏥᏄᏍᏗ",
    ),
    (
        "syllabics",
        "ᓀᐦᐃᔭᐍᐏᐣ ᐊᐘᓯᓴᐠ ᒥᓯᐍ ᑭᔮᐢ ᐃᑘᐏᓇ ᓂᑲᒧᐏᐣ ᐱᒋᐦᑫᐏᓇᐣ ᑕᐸᐦᑌᔨᒧᐏᐣ "
        "ᐊᓯᓃᐘᐣ ᒪᒋᐦᑖᐏᐣ ᐚᐸᐦᑕᒧᐏᐣ",
    ),
    (
        "yi",
        "ꆈꌠꉙ ꁱꂷ ꄯꊸ ꅉꀋꁨ ꊿꂷ ꉬꄸ ꒈꃅ ꁧꀑ ꌕꇁ ꉆꈌ ꀉꂿ ꇬꅉ ꂴꄮ ꑞꋊ "
        "ꀊꄶ ꉈꀨ ꏦꏲ ꄡꑟ",
    ),
    (
        "vai",
        "ꕉꕜꕮ ꔔꘋ ꖸ ꔰ ꗋꘋ ꕮꕨ ꔔꘋ ꖸ ꕎ ꕉꖸꕊ ꕴꖃ ꕃꔤꘂ ꗱ ꕞꕯꕊ ꘃꖷ "
        "ꘉꔧ ꗠꖻ ꕪ ꗏ ꔳꕩ",
    ),
    (
        "tifinagh",
        "ⵜⴰⵎⴰⵣⵉⵖⵜ ⵜⴰⵏⵜⴰⵍⴰ ⵏ ⵉⵎⴰⵣⵉⵖⵏ ⴰⵙⴳⴰⵙ ⴰⵎⴰⵢⵏⵓ ⵜⴰⴳⵍⴷⵉⵜ ⵏ "
        "ⵍⵎⵖⵔⵉⴱ ⴰⵣⵓⵍ ⴼⵍⴰⵡⵏ ⵜⴰⵏⵎⵉⵔⵜ",
    ),
    (
        "glagolitic",
        "Ⰰⰸⱏ ⱄⰾⱁⰲⱑⱀⰵ ⰳⰾⰰⰳⱁⰾⰻⱌⰰ ⱂⰻⱄⰰⱀⰻⰵ ⰴⱁⰱⱃⱁ ⱍⱅⰵⱀⰻⰵ ⰽⱀⰻⰳⰰ "
        "ⱄⰾⱁⰲⱁ ⱏⰺ ⰸⰵⰿⰾⱑ",
    ),
    (
        "deseret",
        "𐐔𐐯𐑅𐐨𐑉𐐯𐐻 𐐲𐑊𐑁𐐰𐐺𐐯𐐻 𐐸𐐰𐑆 𐐻𐐭 𐐰𐑌𐐼 𐑁𐐫𐑉𐐻𐐨 𐑊𐐯𐐻𐐲𐑉𐑆 𐐮𐑌 𐐮𐐻𐑅 "
        "𐑁𐐲𐑊 𐑁𐐫𐑉𐑋",
    ),
    (
        "runic",
        "ᚠᚢᚦᚨᚱᚲ ᚷᚹᚺᚾᛁᛃ ᛇᛈᛉᛊ ᛏᛒᛖᛗ ᛚᛜᛞᛟ ᚠᛖᚺᚢ ᚢᚱᚢᛉ ᚦᚢᚱᛁᛊᚨᛉ "
        "ᚨᚾᛊᚢᛉ ᚱᚨᛁᛞᛟ ᚲᚨᚢᚾᚨ",
    ),
    (
        "ogham",
        "ᚁᚂᚃᚄᚅ ᚆᚇᚈᚉᚊ ᚋᚌᚍᚎᚏ ᚐᚑᚒᚓᚔ ᚕᚖᚗ ᚁᚓᚔᚈ ᚂᚒᚄ ᚃᚓᚐᚏᚅ ᚄᚐᚔᚂ ᚅᚔᚑᚅ",
    ),
)

ALIEN_LATIN: tuple[tuple[str, str], ...] = (
    (
        "alien_consonant",
        "zvrk qmx vtlqp zzds kfgh wrtq xczv bnmq plkj vvxz qqwr ttyy "
        "zxqv mnbq wert zxcq",
    ),
    (
        "alien_qxz",
        "qxq zqz xqx qzq zxz xzx qqz zzq xxq qzz zqq xqq qxz zqx xzq "
        "qzx zxq xqz",
    ),
    (
        "alien_syllables",
        "kvaq zubo xidre qofka vyzzu wexqa jipvo quzzy xavko zyqwe "
        "bivquxo dazzkel foqvyx guzzwi",
    ),
)

# Everything above is expected unresolved. RESOLVABLE_GIBBERISH would
# live here when a case is found that slips every stage; the fixture
# test pins the split so gate drift is caught immediately.
RESOLVABLE_GIBBERISH: tuple[tuple[str, str], ...] = ()

# The gate's HARDEST case: real languages outside the 102-universe
# written in a KNOWN script (Latin), so neither the unknown-script
# stage nor script-coherence can fire — only the NB noise gate can.
# Outcomes are text-dependent and pinned per doc by the frozen oracle
# and test_unresolved: some gate to None, some false-resolve to their
# nearest in-universe relative (Samoan/Maori -> a Romance/Austronesian
# confusable) — the same recall limit a fastText confidence cutoff
# has, kept in the fixture so it is measured, not hidden. Original
# everyday sentences (market / children reading), written for this
# repo.
REAL_OOV_LATIN: tuple[tuple[str, str], ...] = (
    (
        "quechua",
        "Paqarin tutamanta qatuman rinchik, t'antata chantapis "
        "challwata rantinapaq; warmakunaqa wasipi qillqasqakunata "
        "ñawinchanku, paramantam mana lluqsinkuchu.",
    ),
    (
        "samoan",
        "I le taeao uma e o atu matou i le maketi e faatau mai falaoa "
        "ma ia; e nonofo tamaiti i le fale e faitau a latou tusi pe a "
        "timu le aso atoa.",
    ),
    (
        "maori",
        "Ka haere matou ki te makete i te ata ki te hoko taro me te "
        "ika; ka noho nga tamariki ki te whare ki te panui pukapuka i "
        "te ua o te ra.",
    ),
    (
        "wolof",
        "Suba teel lanuy dem marse ngir jend mburu ak jen; xale yi "
        "dananu toog ci ker gi di jang teere yi ndax taw bi dafay "
        "wacc bes bi yepp.",
    ),
    (
        "hmong",
        "Thaum sawv ntxov peb mus tom khw yuav mov ci thiab ntses; "
        "cov menyuam nyob hauv tsev nyeem lawv cov ntawv vim los nag "
        "tas hnub.",
    ),
)

FIXTURE_BASE_ID = 10_000


def fixture_rows() -> list[tuple[int, str, str]]:
    """(doc_id, name, text), deterministic ids from FIXTURE_BASE_ID."""
    rows = []
    for i, (name, text) in enumerate(
        UNKNOWN_SCRIPT + ALIEN_LATIN + RESOLVABLE_GIBBERISH + REAL_OOV_LATIN
    ):
        rows.append((FIXTURE_BASE_ID + i, name, text))
    return rows
