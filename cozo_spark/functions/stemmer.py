"""Snowball English (Porter2) stemmer, pure Python.

Reference parity: cozo-core/src/fts/tokenizer/stemmer.rs wraps the
rust_stemmers Snowball family; the test suite exercises
``Stemmer('english')`` (runtime/tests.rs:824). We implement the English
algorithm fully here (the published Porter2 definition); the other 17
reference languages are implemented in snowball.py / snowball_ext.py and
dispatched from this module — the Spark-side plumbing (filter chain, UDF
batching, query-term stemming) is identical for all languages.

The stemmer runs either driver-side (query terms) or inside an
Arrow-batched pandas UDF over token arrays (index build) — never
row-at-a-time in a hot relational path.
"""

from __future__ import annotations

_VOWELS = "aeiouy"
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_END = "cdeghkmnrt"

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTION2 = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
))

_STEP2 = (
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
)
_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", ""), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
)
_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
)


def _regions(word: str) -> tuple[int, int]:
    """(p1, p2): start offsets of R1 and R2 on the prepared word."""
    p1 = len(word)
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            p1 = len(pre)
            break
    else:
        for i in range(1, len(word)):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                p1 = i + 1
                break
    p2 = len(word)
    for i in range(p1 + 1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            p2 = i + 1
            break
    return p1, p2


def _ends_short_syllable(word: str) -> bool:
    if len(word) >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        if b in _VOWELS and c not in _VOWELS and c not in "wxY" and a not in _VOWELS:
            return True
    return len(word) == 2 and word[0] in _VOWELS and word[1] not in _VOWELS


def stem_english(word: str) -> str:
    word = word.lower()
    if word.startswith("\x27"):
        word = word[1:]
    if len(word) <= 2:
        return word
    if word in _EXCEPTION1:
        return _EXCEPTION1[word]

    # mark consonant-y as Y (left to right, so yy -> Yy after a vowel)
    if word.startswith("y"):
        word = "Y" + word[1:]
    for i in range(1, len(word)):
        if word[i] == "y" and word[i - 1] in _VOWELS:
            word = word[:i] + "Y" + word[i + 1:]
    p1, p2 = _regions(word)

    def in_r1(suffix: str) -> bool:
        return len(word) - len(suffix) >= p1

    def in_r2(suffix: str) -> bool:
        return len(word) - len(suffix) >= p2

    # step 0: 's' / 's / '
    for s in ("'s'", "'s", "'"):
        if word.endswith(s):
            word = word[: -len(s)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith("s") and not word.endswith("us") and not word.endswith("ss"):
        if any(c in _VOWELS for c in word[:-2]):
            word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # step 1b
    if word.endswith("eedly") or word.endswith("eed"):
        n = 5 if word.endswith("eedly") else 3
        if in_r1(word[-n:]):
            word = word[: -n] + "ee"
    else:
        for s in ("ingly", "edly", "ing", "ed"):
            if word.endswith(s):
                stem_part = word[: -len(s)]
                if any(c in _VOWELS for c in stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _ends_short_syllable(word) and p1 >= len(word):
                        word += "e"
                break

    # step 1c: y -> i after a consonant that isn't the first letter
    if (len(word) > 2 and word[-1] in "yY"
            and word[-2] not in _VOWELS):
        word = word[:-1] + "i"

    # step 2 (longest match wins, THEN the region check decides)
    for s, rep in _STEP2:
        if word.endswith(s):
            if in_r1(s):
                if s == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif s == "li":
                    if len(word) > 2 and word[-3] in _LI_END:
                        word = word[:-2]
                else:
                    word = word[: -len(s)] + rep
            break

    # step 3
    for s, rep in _STEP3:
        if word.endswith(s):
            if in_r1(s):
                if s == "ative":
                    if in_r2(s):
                        word = word[: -len(s)]
                else:
                    word = word[: -len(s)] + rep
            break

    # step 4
    for s in _STEP4:
        if word.endswith(s):
            if in_r2(s):
                if s == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(s)]
            break

    # step 5
    if word.endswith("e"):
        if in_r2("e") or (in_r1("e") and not _ends_short_syllable(word[:-1])):
            word = word[:-1]
    elif word.endswith("l") and in_r2("l") and len(word) > 1 and word[-2] == "l":
        word = word[:-1]

    return word.replace("Y", "y")


def get_stemmer(language: str):
    """Language name -> stem function (stemmer.rs Language enum surface).

    11 of the reference's 18 Snowball languages are implemented from the
    published algorithm definitions (snowball.py); the rest raise with
    context."""
    from cozo_spark.functions import snowball as _sb
    from cozo_spark.functions import snowball_ext as _sbx

    lang = str(language).strip().lower()
    table = {
        "english": stem_english, "en": stem_english,
        "danish": _sb.stem_danish, "da": _sb.stem_danish,
        "norwegian": _sb.stem_norwegian, "no": _sb.stem_norwegian,
        "swedish": _sb.stem_swedish, "sv": _sb.stem_swedish,
        "german": _sb.stem_german, "de": _sb.stem_german,
        "dutch": _sb.stem_dutch, "nl": _sb.stem_dutch,
        "french": _sb.stem_french, "fr": _sb.stem_french,
        "spanish": _sb.stem_spanish, "es": _sb.stem_spanish,
        "italian": _sb.stem_italian, "it": _sb.stem_italian,
        "portuguese": _sb.stem_portuguese, "pt": _sb.stem_portuguese,
        "russian": _sb.stem_russian, "ru": _sb.stem_russian,
        "finnish": _sbx.stem_finnish, "fi": _sbx.stem_finnish,
        "hungarian": _sbx.stem_hungarian, "hu": _sbx.stem_hungarian,
        "romanian": _sbx.stem_romanian, "ro": _sbx.stem_romanian,
        "turkish": _sbx.stem_turkish, "tr": _sbx.stem_turkish,
        "arabic": _sbx.stem_arabic, "ar": _sbx.stem_arabic,
        "greek": _sbx.stem_greek, "el": _sbx.stem_greek,
        "tamil": _sbx.stem_tamil, "ta": _sbx.stem_tamil,
    }
    if lang in table:
        return table[lang]
    raise NotImplementedError(
        f"Stemmer language {language!r} not implemented (supported: all 18"
        " reference languages — english, danish, norwegian, swedish, german,"
        " dutch, french, spanish, italian, portuguese, russian, finnish,"
        " hungarian, romanian, turkish, arabic, greek, tamil; reference:"
        " fts/tokenizer/stemmer.rs:1-35)")
