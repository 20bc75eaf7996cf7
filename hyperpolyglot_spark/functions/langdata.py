"""Static language dimension data — the ``languages.yml`` analog.

The reference compiles languages.yml / heuristics.yml into static maps
at build time (reference src/bin/codegen.rs:188-355). Our analog is
this module: checked-in Python tables compiled into dicts at import.
Everything here is deterministic and self-contained (no external data).

Roles mirrored from the reference (SURVEY.md §1.1):
  - LANGUAGES            <- LANGUAGES flat list (codegen.rs:205-216)
  - URL_LANG_HINTS       <- FILENAMES exact map (filenames.rs:5-7): a hit
                            on a url path segment decides the language
                            outright, before the html is ever decoded.
  - TLD_LANGS            <- EXTENSIONS 1:N map (extensions.rs:5-14):
                            host TLD -> candidate languages.
  - META_LANG_CANDS      <- INTERPRETERS map (interpreters.rs:4-6): the
                            declared <html lang=".."> attribute (requires
                            reading content, like the shebang line).
  - MARKER_RULES         <- DISAMBIGUATIONS (heuristics.rs:7-19): per-
                            language positive regexes that disambiguate
                            between remaining candidates.
  - WORDS / STOPWORDS    <- samples/ training corpus analog: the word
                            pools the synthetic corpus is drawn from and
                            the classifier is trained on.
"""

from __future__ import annotations

# --- the closed language universe ------------------------------------
LANGUAGES: tuple[str, ...] = ("en", "de", "fr", "es", "it", "pt", "nl", "zh")

# Common words per language (function words first = stopwords).
# These drive BOTH the synthetic corpus generator and classifier
# training — the same train==fixture relationship the reference has
# (codegen.rs:361 trains on samples/, lib.rs:386 tests on samples/).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "it", "that", "was", "for",
           "on", "are", "with", "as", "his", "they", "at", "be", "this"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "auf", "sich", "des", "im", "dem", "auch", "als"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "un", "une", "dans",
           "que", "pour", "qui", "sur", "pas", "au", "par", "plus", "avec"),
    "es": ("el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
           "es", "por", "con", "para", "su", "al", "lo", "como", "más"),
    "it": ("il", "la", "di", "che", "e", "un", "una", "per", "non", "sono",
           "le", "si", "con", "del", "della", "i", "in", "ma", "anche"),
    "pt": ("o", "a", "os", "as", "de", "que", "e", "do", "da", "em", "um",
           "uma", "para", "com", "não", "no", "na", "por", "mais"),
    "nl": ("de", "het", "een", "van", "en", "dat", "is", "in", "te", "op",
           "zijn", "met", "voor", "niet", "aan", "er", "ook", "maar"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "他", "这", "就",
           "不", "人", "都", "一", "也", "很", "到", "说"),
}

CONTENT_WORDS: dict[str, tuple[str, ...]] = {
    "en": ("house", "water", "world", "people", "time", "government", "city",
           "history", "science", "market", "children", "music", "language",
           "between", "because", "through", "country", "question", "answer",
           "morning", "network", "village", "weather", "mountain", "library"),
    "de": ("haus", "wasser", "welt", "menschen", "zeit", "regierung", "stadt",
           "geschichte", "wissenschaft", "markt", "kinder", "musik", "sprache",
           "zwischen", "weil", "durch", "land", "frage", "antwort", "morgen",
           "netzwerk", "dorf", "wetter", "berg", "bibliothek"),
    "fr": ("maison", "eau", "monde", "gens", "temps", "gouvernement", "ville",
           "histoire", "science", "marché", "enfants", "musique", "langue",
           "entre", "parce", "travers", "pays", "question", "réponse",
           "matin", "réseau", "village", "météo", "montagne", "bibliothèque"),
    "es": ("casa", "agua", "mundo", "gente", "tiempo", "gobierno", "ciudad",
           "historia", "ciencia", "mercado", "niños", "música", "lengua",
           "entre", "porque", "través", "país", "pregunta", "respuesta",
           "mañana", "red", "pueblo", "clima", "montaña", "biblioteca"),
    "it": ("casa", "acqua", "mondo", "gente", "tempo", "governo", "città",
           "storia", "scienza", "mercato", "bambini", "musica", "lingua",
           "tra", "perché", "attraverso", "paese", "domanda", "risposta",
           "mattina", "rete", "paese", "tempo", "montagna", "biblioteca"),
    "pt": ("casa", "água", "mundo", "pessoas", "tempo", "governo", "cidade",
           "história", "ciência", "mercado", "crianças", "música", "língua",
           "entre", "porque", "através", "país", "pergunta", "resposta",
           "manhã", "rede", "aldeia", "clima", "montanha", "biblioteca"),
    "nl": ("huis", "water", "wereld", "mensen", "tijd", "regering", "stad",
           "geschiedenis", "wetenschap", "markt", "kinderen", "muziek",
           "taal", "tussen", "omdat", "door", "land", "vraag", "antwoord",
           "ochtend", "netwerk", "dorp", "weer", "berg", "bibliotheek"),
    "zh": ("房子", "水", "世界", "人们", "时间", "政府", "城市", "历史",
           "科学", "市场", "孩子", "音乐", "语言", "之间", "因为", "通过",
           "国家", "问题", "回答", "早上", "网络", "村庄", "天气", "山",
           "图书馆"),
}

WORDS: dict[str, tuple[str, ...]] = {
    lang: STOPWORDS[lang] + CONTENT_WORDS[lang] for lang in LANGUAGES
}

# --- stage-1 dim: url path segment -> language (FILENAMES analog) ----
URL_LANG_HINTS: dict[str, str] = {
    "en": "en", "en-us": "en", "english": "en",
    "de": "de", "de-de": "de", "deutsch": "de",
    "fr": "fr", "fr-fr": "fr", "francais": "fr",
    "es": "es", "es-es": "es", "espanol": "es",
    "it": "it", "it-it": "it", "italiano": "it",
    "pt": "pt", "pt-br": "pt", "portugues": "pt",
    "nl": "nl", "nl-nl": "nl", "nederlands": "nl",
    "zh": "zh", "zh-cn": "zh", "zhongwen": "zh",
}

# --- stage-2 dim: host TLD -> candidate languages (EXTENSIONS analog,
# 1:N; order matters — array_intersect keeps left order, J4) ----------
TLD_LANGS: dict[str, tuple[str, ...]] = {
    "uk": ("en",),
    "us": ("en",),
    "au": ("en",),
    "de": ("de",),
    "at": ("de",),
    "fr": ("fr",),
    "es": ("es", "pt"),        # ambiguous on purpose (like .h -> C/C++/ObjC)
    "it": ("it",),
    "pt": ("pt", "es"),
    "nl": ("nl", "de"),
    "br": ("pt", "es"),
    "cn": ("zh",),
    "tw": ("zh",),
    "ch": ("de", "fr", "it"),  # multi-candidate, needs later stages
    "be": ("nl", "fr"),
    "ca": ("en", "fr"),
    # com/org/net/io absent -> no candidates, like an unknown extension
}

# --- stage-3 dim: declared <html lang> -> candidates (INTERPRETERS
# analog; declared tags can be sloppy, so some are 1:N) ---------------
META_LANG_CANDS: dict[str, tuple[str, ...]] = {
    "en": ("en",), "en-us": ("en",), "en-gb": ("en",),
    "de": ("de",), "de-at": ("de",),
    "fr": ("fr",),
    "es": ("es",), "es-mx": ("es",),
    "it": ("it",),
    "pt": ("pt",), "pt-br": ("pt",),
    "nl": ("nl",),
    "zh": ("zh",), "zh-cn": ("zh",), "zh-tw": ("zh",),
    # sloppy CMS tags observed in the wild -> ambiguous candidate sets
    "iberian": ("es", "pt"),
    "germanic": ("de", "nl"),
    "romance": ("fr", "es", "it", "pt"),
}

# --- stage-4 dim: disambiguation marker regexes (DISAMBIGUATIONS
# analog, heuristics.rs:46-72). A language's rule fires if its marker
# matches; first-match-wins ordering is by candidate order. Markers are
# high-precision function words that do not collide across languages. -
MARKER_RULES: dict[str, str] = {
    "en": r"(?:^|\s)(?:the|with|they)(?:\s|$)",
    "de": r"(?:^|\s)(?:und|nicht|durch)(?:\s|$)",
    "fr": r"(?:^|\s)(?:les|avec|dans)(?:\s|$)",
    "es": r"(?:^|\s)(?:los|más|porque)(?:\s|$)",
    "it": r"(?:^|\s)(?:della|perché|anche)(?:\s|$)",
    "pt": r"(?:^|\s)(?:não|uma|através)(?:\s|$)",
    "nl": r"(?:^|\s)(?:het|zijn|omdat)(?:\s|$)",
    "zh": r"[的是了]",
}

# Union stopword set used by the quality rules (stopword-density check
# is language-agnostic so it can run before language ID resolves).
ALL_STOPWORDS: frozenset[str] = frozenset(
    w for lang in LANGUAGES for w in STOPWORDS[lang]
)

# --- language info dim (Language{name,type,color,group} analog,
# reference src/lib.rs:48-57 from languages.yml) -----------------------
LANG_INFO: dict[str, dict[str, str]] = {
    "en": {"family": "germanic", "script": "latin"},
    "de": {"family": "germanic", "script": "latin"},
    "nl": {"family": "germanic", "script": "latin"},
    "fr": {"family": "romance", "script": "latin"},
    "es": {"family": "romance", "script": "latin"},
    "it": {"family": "romance", "script": "latin"},
    "pt": {"family": "romance", "script": "latin"},
    "zh": {"family": "sinitic", "script": "han"},
}
