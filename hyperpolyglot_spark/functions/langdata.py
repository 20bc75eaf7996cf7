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
# 24 languages across 10 scripts — the languages.yml-breadth analog
# (reference ships 553 languages; the ENGINE here is shape-complete for
# any count, the dim tables carry a representative two-dozen).
LANGUAGES: tuple[str, ...] = (
    "en", "de", "fr", "es", "it", "pt", "nl", "zh",
    "sv", "da", "fi", "pl", "cs", "ro", "hu", "tr",
    "ru", "el", "ja", "ko", "ar", "hi", "id", "vi",
)

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
    "sv": ("och", "att", "det", "som", "en", "på", "är", "av", "för",
           "med", "den", "till", "inte", "om", "han", "de", "ett", "var"),
    "da": ("og", "i", "at", "det", "en", "den", "til", "er", "som", "på",
           "de", "med", "han", "af", "for", "ikke", "der", "et"),
    "fi": ("ja", "on", "ei", "se", "että", "hän", "oli", "mutta", "kun",
           "niin", "kuin", "myös", "jo", "vain", "sen", "joka", "mitä", "tai"),
    "pl": ("i", "w", "nie", "na", "się", "że", "z", "do", "to", "jest",
           "jak", "po", "co", "tak", "za", "od", "ale", "przez"),
    "cs": ("a", "se", "v", "na", "je", "že", "s", "z", "do", "to",
           "jako", "o", "ale", "i", "za", "k", "po", "protože"),
    "ro": ("și", "de", "la", "a", "în", "cu", "o", "pe", "este", "un",
           "care", "nu", "se", "mai", "din", "să", "ce", "pentru"),
    "hu": ("a", "az", "és", "hogy", "nem", "is", "egy", "ez", "de",
           "van", "meg", "volt", "ha", "el", "mint", "már", "csak", "mi"),
    "tr": ("ve", "bir", "bu", "da", "ne", "için", "ile", "o", "en",
           "gibi", "ama", "daha", "çok", "var", "olarak", "kadar",
           "sonra", "çünkü"),
    "ru": ("и", "в", "не", "на", "я", "что", "он", "с", "как", "это",
           "а", "по", "но", "из", "у", "за", "то", "же"),
    "el": ("και", "να", "το", "η", "ο", "που", "δεν", "με", "από",
           "για", "είναι", "τα", "σε", "την", "τον", "θα", "ένα", "μια"),
    "ja": ("の", "に", "は", "を", "た", "が", "で", "て", "と", "し",
           "れ", "さ", "ある", "いる", "も", "する", "です", "ます"),
    "ko": ("이", "그", "저", "것", "수", "들", "및", "에서", "의", "를",
           "은", "는", "가", "와", "과", "도", "로", "한"),
    "ar": ("في", "من", "على", "أن", "إلى", "عن", "مع", "هذا", "التي",
           "الذي", "كان", "ما", "لا", "هو", "هي", "قد", "كل", "أو"),
    "hi": ("के", "का", "एक", "में", "की", "है", "यह", "और", "से",
           "हैं", "को", "पर", "इस", "होता", "कि", "जो", "ने", "था"),
    "id": ("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini",
           "dari", "dalam", "akan", "pada", "juga", "saya", "ke",
           "karena", "ada", "mereka"),
    "vi": ("của", "và", "là", "có", "trong", "được", "cho", "không",
           "người", "với", "này", "đã", "các", "một", "những", "để",
           "khi", "tại"),
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
    "sv": ("hus", "vatten", "värld", "människor", "tid", "regering",
           "stad", "historia", "vetenskap", "marknad", "barn", "musik",
           "språk", "mellan", "eftersom", "genom", "land", "fråga",
           "svar", "morgon", "nätverk", "by", "väder", "berg", "bibliotek"),
    "da": ("hus", "vand", "verden", "mennesker", "tid", "regering", "by",
           "historie", "videnskab", "marked", "børn", "musik", "sprog",
           "mellem", "fordi", "gennem", "land", "spørgsmål", "svar",
           "morgen", "netværk", "landsby", "vejr", "bjerg", "bibliotek"),
    "fi": ("talo", "vesi", "maailma", "ihmiset", "aika", "hallitus",
           "kaupunki", "historia", "tiede", "markkinat", "lapset",
           "musiikki", "kieli", "välillä", "koska", "kautta", "maa",
           "kysymys", "vastaus", "aamu", "verkosto", "kylä", "sää",
           "vuori", "kirjasto"),
    "pl": ("dom", "woda", "świat", "ludzie", "czas", "rząd", "miasto",
           "historia", "nauka", "rynek", "dzieci", "muzyka", "język",
           "między", "ponieważ", "kraj", "pytanie", "odpowiedź", "rano",
           "sieć", "wieś", "pogoda", "góra", "biblioteka", "dzień"),
    "cs": ("dům", "voda", "svět", "lidé", "čas", "vláda", "město",
           "historie", "věda", "trh", "děti", "hudba", "jazyk", "mezi",
           "přes", "země", "otázka", "odpověď", "ráno", "síť",
           "vesnice", "počasí", "hora", "knihovna", "den"),
    "ro": ("casă", "apă", "lume", "oameni", "timp", "guvern", "oraș",
           "istorie", "știință", "piață", "copii", "muzică", "limbă",
           "între", "deoarece", "prin", "țară", "întrebare", "răspuns",
           "dimineață", "rețea", "sat", "vreme", "munte", "bibliotecă"),
    "hu": ("ház", "víz", "világ", "emberek", "idő", "kormány", "város",
           "történelem", "tudomány", "piac", "gyerekek", "zene",
           "nyelv", "között", "mert", "keresztül", "ország", "kérdés",
           "válasz", "reggel", "hálózat", "falu", "időjárás", "hegy",
           "könyvtár"),
    "tr": ("ev", "su", "dünya", "insanlar", "zaman", "hükümet", "şehir",
           "tarih", "bilim", "pazar", "çocuklar", "müzik", "dil",
           "arasında", "boyunca", "ülke", "soru", "cevap", "sabah",
           "ağ", "köy", "hava", "dağ", "kütüphane", "gün"),
    "ru": ("дом", "вода", "мир", "люди", "время", "правительство",
           "город", "история", "наука", "рынок", "дети", "музыка",
           "язык", "между", "потому", "через", "страна", "вопрос",
           "ответ", "утро", "сеть", "деревня", "погода", "гора",
           "библиотека"),
    "el": ("σπίτι", "νερό", "κόσμος", "άνθρωποι", "χρόνος", "κυβέρνηση",
           "πόλη", "ιστορία", "επιστήμη", "αγορά", "παιδιά", "μουσική",
           "γλώσσα", "μεταξύ", "επειδή", "μέσω", "χώρα", "ερώτηση",
           "απάντηση", "πρωί", "δίκτυο", "χωριό", "καιρός", "βουνό",
           "βιβλιοθήκη"),
    "ja": ("家", "水", "世界", "人々", "時間", "政府", "都市", "歴史",
           "科学", "市場", "子供", "音楽", "言語", "間", "理由", "国",
           "質問", "答え", "朝", "ネットワーク", "村", "天気", "山",
           "図書館", "今日"),
    "ko": ("집", "물", "세계", "사람들", "시간", "정부", "도시", "역사",
           "과학", "시장", "아이들", "음악", "언어", "사이", "때문에",
           "통해", "나라", "질문", "대답", "아침", "네트워크", "마을",
           "날씨", "산", "도서관"),
    "ar": ("بيت", "ماء", "عالم", "ناس", "وقت", "حكومة", "مدينة",
           "تاريخ", "علم", "سوق", "أطفال", "موسيقى", "لغة", "بين",
           "لأن", "عبر", "بلد", "سؤال", "جواب", "صباح", "شبكة",
           "قرية", "طقس", "جبل", "مكتبة"),
    "hi": ("घर", "पानी", "दुनिया", "लोग", "समय", "सरकार", "शहर",
           "इतिहास", "विज्ञान", "बाजार", "बच्चे", "संगीत", "भाषा",
           "बीच", "क्योंकि", "द्वारा", "देश", "प्रश्न", "उत्तर",
           "सुबह", "नेटवर्क", "गांव", "मौसम", "पहाड़", "पुस्तकालय"),
    "id": ("rumah", "air", "dunia", "orang", "waktu", "pemerintah",
           "kota", "sejarah", "ilmu", "pasar", "anak", "musik",
           "bahasa", "antara", "sebab", "melalui", "negara",
           "pertanyaan", "jawaban", "pagi", "jaringan", "desa",
           "cuaca", "gunung", "perpustakaan"),
    "vi": ("nhà", "nước", "giới", "thời", "gian", "chính", "phủ",
           "thành", "phố", "lịch", "sử", "khoa", "học", "chợ", "trẻ",
           "nhạc", "ngôn", "ngữ", "giữa", "quốc", "gia", "câu", "hỏi",
           "sáng", "núi"),
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
    "sv": "sv", "sv-se": "sv", "svenska": "sv",
    "da": "da", "da-dk": "da", "dansk": "da",
    "fi": "fi", "fi-fi": "fi", "suomi": "fi",
    "pl": "pl", "pl-pl": "pl", "polski": "pl",
    "cs": "cs", "cs-cz": "cs", "cesky": "cs",
    "ro": "ro", "ro-ro": "ro", "romana": "ro",
    "hu": "hu", "hu-hu": "hu", "magyar": "hu",
    "tr": "tr", "tr-tr": "tr", "turkce": "tr",
    "ru": "ru", "ru-ru": "ru", "russian": "ru",
    "el": "el", "el-gr": "el", "greek": "el",
    "ja": "ja", "ja-jp": "ja", "japanese": "ja",
    "ko": "ko", "ko-kr": "ko", "korean": "ko",
    "ar": "ar", "ar-sa": "ar", "arabic": "ar",
    "hi": "hi", "hi-in": "hi", "hindi": "hi",
    "id": "id", "id-id": "id", "indonesian": "id",
    "vi": "vi", "vi-vn": "vi", "vietnamese": "vi",
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
    "se": ("sv",),
    "dk": ("da",),
    "fi": ("fi", "sv"),        # bilingual ccTLD -> rule-engine context
    "pl": ("pl",),
    "cz": ("cs",),
    "sk": ("cs",),             # sloppy: sk content often labeled cs here
    "ro": ("ro",),
    "hu": ("hu",),
    "tr": ("tr",),
    "ru": ("ru",),
    "ua": ("ru",),
    "gr": ("el",),
    "jp": ("ja",),
    "kr": ("ko",),
    "sa": ("ar",),
    "ae": ("ar",),
    "eg": ("ar",),
    "in": ("hi", "en"),        # bilingual ccTLD -> rule-engine context
    "id": ("id",),
    "vn": ("vi",),
    "mx": ("es",),
    "ar": ("es",),             # Argentina ccTLD, Spanish content
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
    "sv": ("sv",), "sv-se": ("sv",),
    "da": ("da",), "da-dk": ("da",),
    "fi": ("fi",), "fi-fi": ("fi",),
    "pl": ("pl",), "pl-pl": ("pl",),
    "cs": ("cs",), "cs-cz": ("cs",),
    "ro": ("ro",), "ro-ro": ("ro",),
    "hu": ("hu",), "hu-hu": ("hu",),
    "tr": ("tr",), "tr-tr": ("tr",),
    "ru": ("ru",), "ru-ru": ("ru",),
    "el": ("el",), "el-gr": ("el",),
    "ja": ("ja",), "ja-jp": ("ja",),
    "ko": ("ko",), "ko-kr": ("ko",),
    "ar": ("ar",), "ar-sa": ("ar",),
    "hi": ("hi",), "hi-in": ("hi",),
    "id": ("id",), "id-id": ("id",),
    "vi": ("vi",), "vi-vn": ("vi",),
    # sloppy CMS tags observed in the wild -> ambiguous candidate sets
    "iberian": ("es", "pt"),
    "germanic": ("de", "nl"),
    "romance": ("fr", "es", "it", "pt"),
    "scandinavian": ("sv", "da"),
    "slavic": ("ru", "pl", "cs"),
    "cjk": ("zh", "ja", "ko"),
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
    "sv": r"(?:^|\s)(?:och|är|eftersom)(?:\s|$)",
    "da": r"(?:^|\s)(?:og|af|ikke)(?:\s|$)",
    "fi": r"(?:^|\s)(?:että|myös|koska)(?:\s|$)",
    "pl": r"(?:^|\s)(?:się|jest|przez)(?:\s|$)",
    "cs": r"(?:^|\s)(?:že|protože|mezi)(?:\s|$)",
    "ro": r"(?:^|\s)(?:și|pentru|este)(?:\s|$)",
    "hu": r"(?:^|\s)(?:hogy|és|mert)(?:\s|$)",
    "tr": r"(?:^|\s)(?:ve|için|çünkü)(?:\s|$)",
    "ru": r"(?:^|\s)(?:что|это|потому)(?:\s|$)",
    "el": r"(?:^|\s)(?:και|είναι|επειδή)(?:\s|$)",
    "ja": r"[のはを]",
    "ko": r"[의를은]",
    "ar": r"(?:^|\s)(?:في|من|على)(?:\s|$)",
    "hi": r"(?:^|\s)(?:के|में|है)(?:\s|$)",
    "id": r"(?:^|\s)(?:yang|dan|tidak)(?:\s|$)",
    "vi": r"(?:^|\s)(?:của|và|không)(?:\s|$)",
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
    "sv": {"family": "germanic", "script": "latin"},
    "da": {"family": "germanic", "script": "latin"},
    "fi": {"family": "uralic", "script": "latin"},
    "pl": {"family": "slavic", "script": "latin"},
    "cs": {"family": "slavic", "script": "latin"},
    "ro": {"family": "romance", "script": "latin"},
    "hu": {"family": "uralic", "script": "latin"},
    "tr": {"family": "turkic", "script": "latin"},
    "ru": {"family": "slavic", "script": "cyrillic"},
    "el": {"family": "hellenic", "script": "greek"},
    "ja": {"family": "japonic", "script": "kanji_kana"},
    "ko": {"family": "koreanic", "script": "hangul"},
    "ar": {"family": "semitic", "script": "arabic"},
    "hi": {"family": "indic", "script": "devanagari"},
    "id": {"family": "austronesian", "script": "latin"},
    "vi": {"family": "austroasiatic", "script": "latin"},
}
