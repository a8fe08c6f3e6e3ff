"""Snowball stemmers (non-English), pure Python, from the published
algorithm definitions at snowballstem.org.

Reference parity: cozo-core/src/fts/tokenizer/stemmer.rs wraps the
rust_stemmers Snowball family (18 languages). We implement the published
algorithms directly — NOT a port of rust_stemmers — for the languages a
multilingual corpus most commonly needs: Danish, Norwegian, Swedish,
German, Dutch, French, Spanish, Italian, Portuguese, Russian (English's
Porter2 lives in stemmer.py). The remaining seven reference languages
(Arabic, Finnish, Greek, Hungarian, Romanian, Tamil, Turkish) live in
snowball_ext.py; all 18 dispatch through stemmer.py.

Execution model matches stemmer.py: driver-side for query terms,
Arrow-batched pandas UDF over token arrays for index builds.
"""

from __future__ import annotations


def _standard_r(word: str, vowels: str, start: int = 0) -> int:
    """Offset of the standard Snowball region: after the first non-vowel
    following a vowel, scanning from ``start``."""
    for i in range(start + 1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            return i + 1
    return len(word)


def _r1_r2(word: str, vowels: str) -> tuple[int, int]:
    p1 = _standard_r(word, vowels)
    p2 = _standard_r(word, vowels, p1)
    return p1, p2


def _r1_min3(word: str, vowels: str) -> int:
    """Scandinavian/German variant: R1 is adjusted so that at least 3
    letters precede it."""
    p1 = _standard_r(word, vowels)
    return max(p1, 3) if p1 < len(word) or len(word) >= 3 else p1


def _longest_suffix(word: str, suffixes) -> str | None:
    best = None
    for s in suffixes:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# --------------------------------------------------------------------------
# Danish (snowballstem.org/algorithms/danish/stemmer.html)
# --------------------------------------------------------------------------

_DA_VOWELS = "aeiouyæåø"  # aeiouy æ å ø
_DA_S_END = "abcdfghjklmnoprtvyzå"
_DA_STEP1 = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
    "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
    "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
    "ers", "ets", "erets", "et", "eret",
)


def stem_danish(word: str) -> str:
    word = word.lower()
    p1 = _r1_min3(word, _DA_VOWELS)

    # step 1
    s = _longest_suffix(word[p1:], _DA_STEP1)
    if s is not None:
        word = word[: -len(s)]
    elif word.endswith("s") and len(word) >= p1 + 1 and len(word) >= 2 \
            and word[-2] in _DA_S_END:
        word = word[:-1]

    # step 2: remove last letter if R1 ends with gd dt gt kt
    if _longest_suffix(word[p1:], ("gd", "dt", "gt", "kt")) is not None:
        word = word[:-1]

    # step 3
    if word.endswith("igst"):
        word = word[:-2]
    s = _longest_suffix(word[p1:], ("ig", "lig", "elig", "els"))
    if s is not None:
        word = word[: -len(s)]
        if _longest_suffix(word[p1:], ("gd", "dt", "gt", "kt")) is not None:
            word = word[:-1]
    elif word[p1:].endswith("løst"):
        word = word[:-1]

    # step 4: undouble final consonants in R1
    if (len(word) >= 2 and len(word) - 1 >= p1 and word[-1] == word[-2]
            and word[-1] not in _DA_VOWELS):
        word = word[:-1]
    return word


# --------------------------------------------------------------------------
# Norwegian (Bokmål)
# --------------------------------------------------------------------------

_NO_VOWELS = "aeiouyæåø"
_NO_STEP1 = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en", "heten",
    "ar", "er", "heter", "as", "es", "edes", "endes", "enes", "hetenes",
    "ens", "hetens", "ers", "ets", "et", "het", "ast",
)


def stem_norwegian(word: str) -> str:
    word = word.lower()
    p1 = _r1_min3(word, _NO_VOWELS)

    # step 1
    s = _longest_suffix(word[p1:], _NO_STEP1 + ("erte", "ert"))
    if s in ("erte", "ert"):
        word = word[: -len(s)] + "er"
    elif s is not None:
        word = word[: -len(s)]
    elif word.endswith("s") and len(word) >= p1 + 1 and len(word) >= 2 and (
            word[-2] in "bcdfghjlmnoprtvyz"
            or (word[-2] == "k" and (len(word) < 3 or word[-3] not in _NO_VOWELS))):
        word = word[:-1]

    # step 2
    if word[p1:].endswith(("dt", "vt")):
        word = word[:-1]

    # step 3
    s = _longest_suffix(word[p1:], ("leg", "eleg", "ig", "eig", "lig",
                                    "elig", "els", "lov", "elov", "slov",
                                    "hetslov"))
    if s is not None:
        word = word[: -len(s)]
    return word


# --------------------------------------------------------------------------
# Swedish
# --------------------------------------------------------------------------

_SV_VOWELS = "aeiouyäåö"
_SV_STEP1 = (
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
    "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
    "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het", "ast",
)


def stem_swedish(word: str) -> str:
    word = word.lower()
    p1 = _r1_min3(word, _SV_VOWELS)

    s = _longest_suffix(word[p1:], _SV_STEP1)
    if s is not None:
        word = word[: -len(s)]
    elif word.endswith("s") and len(word) >= p1 + 1 and len(word) >= 2 \
            and word[-2] in "bcdfghjklmnoprtvy":
        word = word[:-1]

    if _longest_suffix(word[p1:], ("dd", "gd", "nn", "dt", "gt", "kt", "tt")) is not None:
        word = word[:-1]

    s = _longest_suffix(word[p1:], ("lig", "ig", "els"))
    if s is not None:
        word = word[: -len(s)]
    elif word[p1:].endswith("löst"):
        word = word[:-1]
    elif word[p1:].endswith("fullt"):
        word = word[:-1]
    return word


# --------------------------------------------------------------------------
# German
# --------------------------------------------------------------------------

_DE_VOWELS = "aeiouyäöü"


def stem_german(word: str) -> str:
    word = word.lower().replace("ß", "ss")
    # mark u/y between vowels as consonants (U/Y)
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and word[i - 1] in _DE_VOWELS and word[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    word = "".join(chars)

    p1 = _r1_min3(word, _DE_VOWELS)
    p2 = _standard_r(word, _DE_VOWELS, _standard_r(word, _DE_VOWELS))

    def in_r1(s):
        return len(word) - len(s) >= p1

    def in_r2(s):
        return len(word) - len(s) >= p2

    # step 1
    s = _longest_suffix(word, ("em", "ern", "er", "e", "en", "es", "s"))
    if s == "s":
        if in_r1("s") and len(word) >= 2 and word[-2] in "bdfghklmnrt":
            word = word[:-1]
    elif s in ("e", "en", "es"):
        if in_r1(s):
            word = word[: -len(s)]
            if word.endswith("niss"):
                word = word[:-1]
    elif s is not None and in_r1(s):
        word = word[: -len(s)]

    # step 2
    s = _longest_suffix(word, ("en", "er", "est", "st"))
    if s == "st":
        if in_r1("st") and len(word) >= 6 and word[-3] in "bdfghklmnt":
            word = word[:-2]
    elif s is not None and in_r1(s):
        word = word[: -len(s)]

    # step 3 (d-suffixes)
    s = _longest_suffix(word, ("end", "ung", "ig", "ik", "isch", "lich",
                               "heit", "keit"))
    if s in ("end", "ung"):
        if in_r2(s):
            word = word[: -len(s)]
            if (word.endswith("ig") and in_r2("ig")
                    and not word.endswith("eig")):
                word = word[:-2]
    elif s in ("ig", "ik", "isch"):
        if in_r2(s) and not word[: -len(s)].endswith("e"):
            word = word[: -len(s)]
    elif s in ("lich", "heit"):
        if in_r2(s):
            word = word[: -len(s)]
            for pre in ("er", "en"):
                if word.endswith(pre) and len(word) - 2 >= p1:
                    word = word[:-2]
                    break
    elif s == "keit":
        if in_r2(s):
            word = word[: -len(s)]
            for pre in ("lich", "ig"):
                if word.endswith(pre) and len(word) - len(pre) >= p2:
                    word = word[: -len(pre)]
                    break

    word = word.replace("U", "u").replace("Y", "y")
    return (word.replace("ä", "a").replace("ö", "o")
            .replace("ü", "u"))


# --------------------------------------------------------------------------
# Dutch
# --------------------------------------------------------------------------

_NL_VOWELS = "aeiouyè"


def stem_dutch(word: str) -> str:
    word = word.lower()
    # remove umlauts/acutes
    table = str.maketrans("äëïöüáé"
                          "íóú", "aeiouaeiou")
    word = word.translate(table)
    # initial y, y after vowel -> Y; i between vowels -> I
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and word[i - 1] in _NL_VOWELS:
            chars[i] = "Y"
        elif (chars[i] == "i" and 0 < i < len(chars) - 1
              and word[i - 1] in _NL_VOWELS and word[i + 1] in _NL_VOWELS):
            chars[i] = "I"
    word = "".join(chars)

    p1 = _r1_min3(word, _NL_VOWELS)
    p2 = _standard_r(word, _NL_VOWELS, _standard_r(word, _NL_VOWELS))

    def undouble(w: str) -> str:
        if w.endswith(("kk", "dd", "tt")):
            return w[:-1]
        return w

    e_deleted = False
    # step 1
    if word.endswith("heden") and len(word) - 5 >= p1:
        word = word[:-5] + "heid"
    elif word.endswith("ene") and len(word) - 3 >= p1 \
            and word[-4] not in _NL_VOWELS and word[-6:-3] != "gem":
        word = undouble(word[:-3])
    elif word.endswith("en") and len(word) - 2 >= p1 \
            and len(word) >= 3 and word[-3] not in _NL_VOWELS \
            and word[-5:-2] != "gem":
        word = undouble(word[:-2])
    elif word.endswith("se") and len(word) - 2 >= p1 \
            and word[-3] not in "aeiouèj":
        word = word[:-2]
    elif word.endswith("s") and len(word) - 1 >= p1 \
            and len(word) >= 2 and word[-2] not in "aeiouèj":
        word = word[:-1]

    # step 2: delete final e if in R1 and preceded by a non-vowel
    if word.endswith("e") and len(word) - 1 >= p1 \
            and len(word) >= 2 and word[-2] not in _NL_VOWELS:
        word = undouble(word[:-1])
        e_deleted = True

    # step 3a: heid
    if word.endswith("heid") and len(word) - 4 >= p2 \
            and (len(word) < 5 or word[-5] != "c"):
        word = word[:-4]
        if word.endswith("en") and len(word) - 2 >= p1 \
                and len(word) >= 3 and word[-3] not in _NL_VOWELS \
                and word[-5:-2] != "gem":
            word = undouble(word[:-2])

    # step 3b: d-suffixes
    s = _longest_suffix(word, ("end", "ing", "ig", "lijk", "baar", "bar"))
    if s in ("end", "ing"):
        if len(word) - len(s) >= p2:
            word = word[: -len(s)]
            if word.endswith("ig") and len(word) - 2 >= p2 and not word.endswith("eig"):
                word = word[:-2]
            else:
                word = undouble(word)
    elif s == "ig":
        if len(word) - 2 >= p2 and not word.endswith("eig"):
            word = word[:-2]
    elif s == "lijk":
        if len(word) - 4 >= p2:
            word = word[:-4]
            if word.endswith("e") and len(word) - 1 >= p1 \
                    and len(word) >= 2 and word[-2] not in _NL_VOWELS:
                word = undouble(word[:-1])
    elif s == "baar":
        if len(word) - 4 >= p2:
            word = word[:-4]
    elif s == "bar":
        if len(word) - 3 >= p2 and e_deleted:
            word = word[:-3]

    # step 4: undouble vowel: CVVC where final C != I and vowel in aeou
    if (len(word) >= 4 and word[-1] not in _NL_VOWELS and word[-1] != "I"
            and word[-2] == word[-3] and word[-2] in "aeou"
            and word[-4] not in _NL_VOWELS):
        word = word[:-2] + word[-1]

    return word.replace("Y", "y").replace("I", "i")


# --------------------------------------------------------------------------
# French
# --------------------------------------------------------------------------

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def _fr_rv(word: str) -> int:
    if len(word) >= 3 and word[0] in _FR_VOWELS and word[1] in _FR_VOWELS:
        return 3
    if word[:3] in ("par", "col", "tap"):
        return 3
    for i in range(1, len(word)):
        if word[i] in _FR_VOWELS:
            return i + 1
    return len(word)


def stem_french(word: str) -> str:
    word = word.lower()
    # mark vowel-adjacent u/i/y as consonants; u after q; ë/ï -> He/Hi
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and word[i - 1] in _FR_VOWELS
        next_v = i + 1 < n and word[i + 1] in _FR_VOWELS
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and word[i - 1] == "q":
            chars[i] = "U"
        elif c == "ë":
            chars[i] = "He"
        elif c == "ï":
            chars[i] = "Hi"
    word = "".join(chars)

    pv = _fr_rv(word)
    p1, p2 = _r1_r2(word, _FR_VOWELS)

    def in_rv(s):
        return len(word) - len(s) >= pv

    def in_r1(s):
        return len(word) - len(s) >= p1

    def in_r2(s):
        return len(word) - len(s) >= p2

    original = word
    step1_done = False

    s = _longest_suffix(word, (
        "ance", "iqUe", "isme", "able", "iste", "eux", "ances", "iqUes",
        "ismes", "ables", "istes", "atrice", "ateur", "ation", "atrices",
        "ateurs", "ations", "logie", "logies", "usion", "ution", "usions",
        "utions", "ence", "ences", "ement", "ements", "ité", "ités", "if",
        "ive", "ifs", "ives", "eaux", "aux", "euse", "euses", "issement",
        "issements", "amment", "emment", "ment", "ments"))
    if s is not None:
        w = word
        if s in ("ance", "iqUe", "isme", "able", "iste", "eux", "ances",
                 "iqUes", "ismes", "ables", "istes"):
            if in_r2(s):
                word = word[: -len(s)]
        elif s in ("atrice", "ateur", "ation", "atrices", "ateurs", "ations"):
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("ic"):
                    word = word[:-2] if len(word) - 2 >= p2 else word[:-2] + "iqU"
        elif s in ("logie", "logies"):
            if in_r2(s):
                word = word[: -len(s)] + "log"
        elif s in ("usion", "ution", "usions", "utions"):
            if in_r2(s):
                word = word[: -len(s)] + "u"
        elif s in ("ence", "ences"):
            if in_r2(s):
                word = word[: -len(s)] + "ent"
        elif s in ("ement", "ements"):
            if in_rv(s):
                word = word[: -len(s)]
                if word.endswith("iv") and len(word) - 2 >= p2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= p2:
                        word = word[:-2]
                elif word.endswith("eus"):
                    if len(word) - 3 >= p2:
                        word = word[:-3]
                    elif len(word) - 3 >= p1:
                        word = word[:-3] + "eux"
                elif word.endswith(("abl", "iqU")) and len(word) - 3 >= p2:
                    word = word[:-3]
                elif word.endswith(("ièr", "Ièr")) and len(word) - 3 >= pv:
                    word = word[:-3] + "i"
        elif s in ("ité", "ités"):
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("abil"):
                    word = word[:-4] if len(word) - 4 >= p2 else word[:-4] + "abl"
                elif word.endswith("ic"):
                    word = word[:-2] if len(word) - 2 >= p2 else word[:-2] + "iqU"
                elif word.endswith("iv") and len(word) - 2 >= p2:
                    word = word[:-2]
        elif s in ("if", "ive", "ifs", "ives"):
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("at") and len(word) - 2 >= p2:
                    word = word[:-2]
                    if word.endswith("ic"):
                        word = word[:-2] if len(word) - 2 >= p2 else word[:-2] + "iqU"
        elif s == "eaux":
            word = word[:-4] + "eau"
        elif s == "aux":
            if in_r1(s):
                word = word[:-3] + "al"
        elif s in ("euse", "euses"):
            if in_r2(s):
                word = word[: -len(s)]
            elif in_r1(s):
                word = word[: -len(s)] + "eux"
        elif s in ("issement", "issements"):
            if in_r1(s) and len(word) > len(s) and word[-len(s) - 1] not in _FR_VOWELS:
                word = word[: -len(s)]
        elif s == "amment":
            if in_rv(s):
                word = word[: -len(s)] + "ant"
        elif s == "emment":
            if in_rv(s):
                word = word[: -len(s)] + "ent"
        elif s in ("ment", "ments"):
            if (len(word) - len(s) - 1 >= pv
                    and word[-len(s) - 1] in _FR_VOWELS):
                word = word[: -len(s)]
        step1_done = word != w

    do_2a = (not step1_done) or original.endswith(
        ("amment", "emment", "ment", "ments"))
    step2_done = False
    if do_2a:
        s = _longest_suffix(word, (
            "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
            "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
            "irions", "irons", "iront", "is", "issaIent", "issais",
            "issait", "issant", "issante", "issantes", "issants", "isse",
            "issent", "isses", "issez", "issiez", "issions", "issons", "it"))
        if (s is not None and len(word) - len(s) - 1 >= pv
                and word[-len(s) - 1] not in _FR_VOWELS
                and word[-len(s) - 1] != "H"):
            word = word[: -len(s)]
            step2_done = True
        if not step2_done:
            # step 2b
            s = _longest_suffix(word, (
                "ions", "é", "ée", "ées", "és", "èrent", "er", "era", "erai",
                "eraIent", "erais", "erait", "eras", "erez", "eriez",
                "erions", "erons", "eront", "ez", "iez", "âmes", "ât",
                "âtes", "a", "ai", "aIent", "ais", "ait", "ant", "ante",
                "antes", "ants", "as", "asse", "assent", "asses", "assiez",
                "assions"))
            if s == "ions":
                if in_r2(s) and in_rv(s):
                    word = word[: -len(s)]
                    step2_done = True
            elif s in ("é", "ée", "ées", "és", "èrent", "er", "era", "erai",
                       "eraIent", "erais", "erait", "eras", "erez", "eriez",
                       "erions", "erons", "eront", "ez", "iez"):
                if in_rv(s):
                    word = word[: -len(s)]
                    step2_done = True
            elif s is not None:
                if in_rv(s):
                    word = word[: -len(s)]
                    if word.endswith("e") and len(word) - 1 >= pv:
                        word = word[:-1]
                    step2_done = True

    if step1_done or step2_done:
        # step 3
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # step 4
        if (word.endswith("s") and len(word) >= 2
                and word[-2] not in "aiouès"
                and not word.endswith("His")):
            word = word[:-1]
    # step 4 continued (always attempted per spec order after step 3/4-s)
    s = _longest_suffix(word, ("ion", "ier", "ière", "Ier", "Ière", "e"))
    if s == "ion":
        if in_r2(s) and len(word) - 4 >= pv - 1 and len(word) >= 4 \
                and word[-4] in "st" and len(word) - 3 >= pv:
            word = word[:-3]
    elif s in ("ier", "ière", "Ier", "Ière"):
        if in_rv(s):
            word = word[: -len(s)] + "i"
    elif s == "e":
        if in_rv(s):
            word = word[:-1]

    # step 5: undouble
    if word.endswith(("enn", "onn", "ett", "ell", "eill")):
        word = word[:-1]
    # step 6: un-accent final é/è + non-vowels
    i = len(word) - 1
    while i >= 0 and word[i] not in _FR_VOWELS + "IUY":
        i -= 1
    if i >= 0 and word[i] in "éè" and i < len(word) - 1:
        word = word[:i] + "e" + word[i + 1:]

    return (word.replace("I", "i").replace("U", "u").replace("Y", "y")
            .replace("He", "ë").replace("Hi", "ï").replace("H", ""))


# --------------------------------------------------------------------------
# Spanish
# --------------------------------------------------------------------------

_ES_VOWELS = "aeiouáéíóúü"


def _es_rv(word: str, vowels: str) -> int:
    if len(word) < 3:
        return len(word)
    if word[1] not in vowels:
        # next vowel after position 1
        for i in range(2, len(word)):
            if word[i] in vowels:
                return i + 1
        return len(word)
    if word[0] in vowels and word[1] in vowels:
        for i in range(2, len(word)):
            if word[i] not in vowels:
                return i + 1
        return len(word)
    return 3


_ES_STEP2B = (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán", "erás",
    "eríais", "ería", "eréis", "eríamos", "eremos", "erá", "eré",
    "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
    "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida", "ía", "ara",
    "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste", "an",
    "aban", "ían", "aran", "ieran", "asen", "iesen", "aron", "ieron",
    "ado", "ido", "ando", "iendo", "ió", "ar", "er", "ir", "as", "abas",
    "adas", "idas", "ías", "aras", "ieras", "ases", "ieses", "ís",
    "áis", "abais", "íais", "arais", "ierais", "aseis", "ieseis",
    "asteis", "isteis", "ados", "idos", "amos", "ábamos", "íamos",
    "imos", "áramos", "iéramos", "iésemos", "ásemos",
)


def stem_spanish(word: str) -> str:
    word = word.lower()
    pv = _es_rv(word, _ES_VOWELS)
    p1, p2 = _r1_r2(word, _ES_VOWELS)

    def in_rv(s):
        return len(word) - len(s) >= pv

    def in_r2(s):
        return len(word) - len(s) >= p2

    # step 0: attached pronouns
    pron = _longest_suffix(word, ("me", "se", "sela", "selo", "selas",
                                  "selos", "la", "le", "lo", "las", "les",
                                  "los", "nos"))
    if pron is not None:
        base = word[: -len(pron)]
        for g, rep in (("iéndo", "iendo"), ("ándo", "ando"), ("ár", "ar"),
                       ("ér", "er"), ("ír", "ir")):
            if base.endswith(g) and len(base) - len(g) >= pv - len(pron):
                if len(word) - len(pron) - len(g) >= pv or True:
                    # gerund/infinitive must lie in RV
                    if len(base) - len(g) >= _es_rv(word, _ES_VOWELS) - 10:
                        pass
                word = base[: -len(g)] + rep
                break
        else:
            for g in ("iendo", "ando", "ar", "er", "ir"):
                if base.endswith(g) and len(base) - len(g) >= pv:
                    word = base
                    break
            else:
                if base.endswith("yendo") and len(base) >= 6 and base[-6] == "u":
                    word = base
        pv = min(pv, len(word))

    changed1 = False
    w0 = word
    s = _longest_suffix(word, (
        "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
        "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
        "osos", "osas", "amiento", "amientos", "imiento", "imientos",
        "adora", "ador", "ación", "adoras", "adores", "aciones", "ante",
        "antes", "ancia", "ancias", "logía", "logías", "ución", "uciones",
        "encia", "encias", "amente", "mente", "idad", "idades", "iva",
        "ivo", "ivas", "ivos"))
    if s is not None:
        if s in ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
                 "ismos", "able", "ables", "ible", "ibles", "ista",
                 "istas", "oso", "osa", "osos", "osas", "amiento",
                 "amientos", "imiento", "imientos"):
            if in_r2(s):
                word = word[: -len(s)]
        elif s in ("adora", "ador", "ación", "adoras", "adores",
                   "aciones", "ante", "antes", "ancia", "ancias"):
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("ic") and len(word) - 2 >= p2:
                    word = word[:-2]
        elif s in ("logía", "logías"):
            if in_r2(s):
                word = word[: -len(s)] + "log"
        elif s in ("ución", "uciones"):
            if in_r2(s):
                word = word[: -len(s)] + "u"
        elif s in ("encia", "encias"):
            if in_r2(s):
                word = word[: -len(s)] + "ente"
        elif s == "amente":
            if len(word) - len(s) >= p1:
                word = word[: -len(s)]
                if word.endswith("iv") and len(word) - 2 >= p2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= p2:
                        word = word[:-2]
                elif word.endswith(("os", "ic", "ad")) and len(word) - 2 >= p2:
                    word = word[:-2]
        elif s == "mente":
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith(("ante", "able", "ible")) and len(word) - 4 >= p2:
                    word = word[:-4]
        elif s in ("idad", "idades"):
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("abil") and len(word) - 4 >= p2:
                    word = word[:-4]
                elif word.endswith(("ic", "iv")) and len(word) - 2 >= p2:
                    word = word[:-2]
        elif s in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("at") and len(word) - 2 >= p2:
                    word = word[:-2]
        changed1 = word != w0

    if not changed1:
        # step 2a: verbs ending in y preceded by u
        s = _longest_suffix(word, ("ya", "ye", "yan", "yen", "yeron",
                                   "yendo", "yo", "yó", "yas", "yes",
                                   "yais", "yamos"))
        if (s is not None and in_rv(s) and len(word) > len(s)
                and word[-len(s) - 1] == "u"):
            word = word[: -len(s)]
        else:
            # step 2b
            s = _longest_suffix(word, _ES_STEP2B + (
                "en", "es", "éis", "emos"))
            if s in ("en", "es", "éis", "emos"):
                if in_rv(s):
                    word = word[: -len(s)]
                    if word.endswith("gu"):
                        word = word[:-1]
            elif s is not None and in_rv(s):
                word = word[: -len(s)]

    # step 3: residual suffix
    s = _longest_suffix(word, ("os", "a", "o", "á", "í", "ó", "e", "é"))
    if s in ("os", "a", "o", "á", "í", "ó"):
        if in_rv(s):
            word = word[: -len(s)]
    elif s in ("e", "é"):
        if in_rv(s):
            word = word[: -len(s)]
            if word.endswith("gu") and len(word) - 1 >= pv:
                word = word[:-1]

    return (word.replace("á", "a").replace("é", "e").replace("í", "i")
            .replace("ó", "o").replace("ú", "u"))


# --------------------------------------------------------------------------
# Italian
# --------------------------------------------------------------------------

_IT_VOWELS = "aeiouàèìòù"

_IT_STEP2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe", "iremmo",
    "ireste", "iresti", "iscano", "iscono", "issero", "arono", "avamo",
    "avano", "avate", "eremo", "erete", "erono", "evamo", "evano",
    "evate", "iremo", "irete", "irono", "ivamo", "ivano", "ivate",
    "ammo", "ando", "asse", "assi", "emmo", "enda", "ende", "endi",
    "endo", "erai", "erei", "iamo", "immo", "irai", "irei", "isca",
    "isce", "isci", "isco", "ano", "are", "ata", "ate", "ati", "ato",
    "ava", "avi", "avo", "erà", "ere", "erò", "ete", "eva", "evi", "evo",
    "irà", "ire", "irò", "ita", "ite", "iti", "ito", "iva", "ivi", "ivo",
    "ono", "uta", "ute", "uti", "uto", "ar", "ir",
)


def stem_italian(word: str) -> str:
    word = word.lower()
    # acute accents -> grave; mark u/i between vowels, u after q
    word = (word.replace("á", "à").replace("é", "è").replace("í", "ì")
            .replace("ó", "ò").replace("ú", "ù"))
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        if c in "ui" and 0 < i < n - 1 and word[i - 1] in _IT_VOWELS \
                and word[i + 1] in _IT_VOWELS:
            chars[i] = c.upper()
        elif c == "u" and i > 0 and word[i - 1] == "q":
            chars[i] = "U"
    word = "".join(chars)

    pv = _es_rv(word, _IT_VOWELS)
    p1, p2 = _r1_r2(word, _IT_VOWELS)

    def in_rv(s):
        return len(word) - len(s) >= pv

    def in_r2(s):
        return len(word) - len(s) >= p2

    # step 0: attached pronoun
    pron = _longest_suffix(word, (
        "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
        "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
        "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
        "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
        "veli", "velo", "vene"))
    if pron is not None:
        base = word[: -len(pron)]
        for g in ("ando", "endo"):
            if base.endswith(g) and len(base) - len(g) >= pv:
                word = base
                break
        else:
            for g in ("ar", "er", "ir"):
                if base.endswith(g) and len(base) - len(g) >= pv:
                    word = base + "e"
                    break

    changed1 = False
    w0 = word
    s = _longest_suffix(word, (
        "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi", "ismo",
        "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste", "isti",
        "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente",
        "atrice", "atrici", "ante", "anti", "azione", "azioni", "atore",
        "atori", "logia", "logie", "uzione", "uzioni", "usione", "usioni",
        "enza", "enze", "amento", "amenti", "imento", "imenti", "amente",
        "ità", "ivo", "ivi", "iva", "ive"))
    if s is not None:
        if s in ("anza", "anze", "ico", "ici", "ica", "ice", "iche",
                 "ichi", "ismo", "ismi", "abile", "abili", "ibile",
                 "ibili", "ista", "iste", "isti", "istà", "istè", "istì",
                 "oso", "osi", "osa", "ose", "mente", "atrice", "atrici",
                 "ante", "anti"):
            if in_r2(s):
                word = word[: -len(s)]
        elif s in ("azione", "azioni", "atore", "atori"):
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("ic") and len(word) - 2 >= p2:
                    word = word[:-2]
        elif s in ("logia", "logie"):
            if in_r2(s):
                word = word[: -len(s)] + "log"
        elif s in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(s):
                word = word[: -len(s)] + "u"
        elif s in ("enza", "enze"):
            if in_r2(s):
                word = word[: -len(s)] + "ente"
        elif s in ("amento", "amenti", "imento", "imenti"):
            if in_rv(s):
                word = word[: -len(s)]
        elif s == "amente":
            if len(word) - len(s) >= p1:
                word = word[: -len(s)]
                if word.endswith("iv") and len(word) - 2 >= p2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= p2:
                        word = word[:-2]
                elif word.endswith(("os", "ic")) and len(word) - 2 >= p2:
                    word = word[:-2]
                elif word.endswith("abil") and len(word) - 4 >= p2:
                    word = word[:-4]
        elif s == "ità":
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("abil") and len(word) - 4 >= p2:
                    word = word[:-4]
                elif word.endswith(("ic", "iv")) and len(word) - 2 >= p2:
                    word = word[:-2]
        elif s in ("ivo", "ivi", "iva", "ive"):
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("at") and len(word) - 2 >= p2:
                    word = word[:-2]
                    if word.endswith("ic") and len(word) - 2 >= p2:
                        word = word[:-2]
        changed1 = word != w0

    if not changed1:
        s = _longest_suffix(word, _IT_STEP2)
        if s is not None and in_rv(s):
            word = word[: -len(s)]

    # step 3a: final vowel, then preceding i
    if word and word[-1] in "aeioàèìò" and len(word) - 1 >= pv:
        word = word[:-1]
        if word and word[-1] == "i" and len(word) - 1 >= pv:
            word = word[:-1]
    # step 3b
    if word[pv:].endswith(("ch", "gh")):
        word = word[:-1]

    return word.replace("I", "i").replace("U", "u")


# --------------------------------------------------------------------------
# Portuguese
# --------------------------------------------------------------------------

_PT_VOWELS = "aeiouáéíóúâêô"

_PT_STEP2 = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis", "áramos",
    "éramos", "íramos", "ávamos", "aremos", "eremos", "iremos", "ariam",
    "eriam", "iriam", "assem", "essem", "issem", "arias", "erias",
    "irias", "ardes", "erdes", "irdes", "asses", "esses", "isses",
    "astes", "estes", "istes", "áreis", "areis", "éreis", "ereis",
    "íreis", "ireis", "áveis", "íamos", "armos", "ermos", "irmos",
    "aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
    "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
    "arem", "erem", "irem", "ando", "endo", "indo", "adas", "idas",
    "arás", "aras", "erás", "eras", "irás", "avas", "ares", "eres",
    "ires", "íeis", "ados", "idos", "ámos", "amos", "emos", "imos",
    "iras", "ada", "ida", "ará", "ara", "erá", "era", "irá", "ava",
    "iam", "ado", "ido", "ias", "ais", "eis", "ia",
    "ai", "am", "em", "ar", "er", "ir", "as", "es", "is", "eu", "iu",
    "ou",
)


def stem_portuguese(word: str) -> str:
    word = word.lower().replace("ã", "a~").replace("õ", "o~")

    pv = _es_rv(word, _PT_VOWELS)
    p1, p2 = _r1_r2(word, _PT_VOWELS)

    def in_rv(s):
        return len(word) - len(s) >= pv

    def in_r2(s):
        return len(word) - len(s) >= p2

    changed1 = False
    w0 = word
    s = _longest_suffix(word, (
        "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
        "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
        "amento", "amentos", "imento", "imentos", "adora", "ador",
        "aça~o", "adoras", "adores", "aço~es", "ante", "antes", "ância",
        "logia", "logias", "uça~o", "uço~es", "ência", "ências",
        "amente", "mente", "idade", "idades", "iva", "ivo", "ivas",
        "ivos", "ira", "iras"))
    if s is not None:
        if s in ("eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
                 "ismos", "ável", "ível", "ista", "istas", "oso", "osa",
                 "osos", "osas", "amento", "amentos", "imento",
                 "imentos"):
            if in_r2(s):
                word = word[: -len(s)]
        elif s in ("adora", "ador", "aça~o", "adoras", "adores", "aço~es",
                   "ante", "antes", "ância"):
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("ic") and len(word) - 2 >= p2:
                    word = word[:-2]
        elif s in ("logia", "logias"):
            if in_r2(s):
                word = word[: -len(s)] + "log"
        elif s in ("uça~o", "uço~es"):
            if in_r2(s):
                word = word[: -len(s)] + "u"
        elif s in ("ência", "ências"):
            if in_r2(s):
                word = word[: -len(s)] + "ente"
        elif s == "amente":
            if len(word) - len(s) >= p1:
                word = word[: -len(s)]
                if word.endswith("iv") and len(word) - 2 >= p2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= p2:
                        word = word[:-2]
                elif word.endswith(("os", "ic", "ad")) and len(word) - 2 >= p2:
                    word = word[:-2]
        elif s == "mente":
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith(("ante", "avel", "ível")) and len(word) - 4 >= p2:
                    word = word[:-4]
        elif s in ("idade", "idades"):
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("abil") and len(word) - 4 >= p2:
                    word = word[:-4]
                elif word.endswith(("ic", "iv")) and len(word) - 2 >= p2:
                    word = word[:-2]
        elif s in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(s):
                word = word[: -len(s)]
                if word.endswith("at") and len(word) - 2 >= p2:
                    word = word[:-2]
        elif s in ("ira", "iras"):
            if in_rv(s) and word[: -len(s)].endswith("e"):
                word = word[: -len(s)] + "ir"
        changed1 = word != w0

    changed2 = False
    if not changed1:
        s = _longest_suffix(word, _PT_STEP2)
        if s is not None and in_rv(s):
            word = word[: -len(s)]
            changed2 = True

    if changed1 or changed2:
        # step 3: delete i preceded by c, if in RV
        if word.endswith("ci") and len(word) - 1 >= pv:
            word = word[:-1]
    else:
        # step 4: residual suffix
        s = _longest_suffix(word, ("os", "a", "i", "o", "á", "í", "ó"))
        if s is not None and in_rv(s):
            word = word[: -len(s)]

    # step 5
    if word and word[-1] in "eéê" and len(word) - 1 >= pv:
        word = word[:-1]
        if word.endswith(("gu", "ci")) and len(word) - 1 >= pv:
            word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    return word.replace("a~", "ã").replace("o~", "õ")


# --------------------------------------------------------------------------
# Russian
# --------------------------------------------------------------------------

_RU_VOWELS = "аеиоуыэюя"

_RU_PERF_GERUND_1 = ("в", "вши", "вшись")
_RU_PERF_GERUND_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_ADJ = ("ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой",
           "ем", "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых",
           "ую", "юю", "ая", "яя", "ою", "ею")
_RU_PART_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PART_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло",
              "но", "ет", "ют", "ны", "ть", "ешь", "нно")
_RU_VERB_2 = ("ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли",
              "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло",
              "ено", "ят", "ует", "уют", "ит", "ыт", "ены", "ить", "ыть",
              "ишь", "ую", "ю")
_RU_NOUN = ("а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи",
            "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием",
            "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь",
            "ию", "ью", "ю", "ия", "ья", "я")


def stem_russian(word: str) -> str:
    word = word.lower().replace("ё", "е")
    # RV: after the first vowel
    pv = len(word)
    for i in range(len(word)):
        if word[i] in _RU_VOWELS:
            pv = i + 1
            break
    p1, p2 = _r1_r2(word, _RU_VOWELS)

    def drop_in_rv(suffixes, preceded_ay=False):
        nonlocal word
        best = None
        for s in suffixes:
            if len(word) - len(s) >= pv and word.endswith(s):
                if preceded_ay:
                    if len(word) - len(s) - 1 < 0 or word[-len(s) - 1] not in "ая":
                        continue
                if best is None or len(s) > len(best):
                    best = s
        if best is not None:
            word = word[: -len(best)]
            return True
        return False

    # step 1: perfective gerund, else (reflexive, adjective/participle, verb, noun)
    if not (drop_in_rv(_RU_PERF_GERUND_2)
            or drop_in_rv(_RU_PERF_GERUND_1, preceded_ay=True)):
        drop_in_rv(("ся", "сь"))
        adj = drop_in_rv(_RU_ADJ)
        if adj:
            drop_in_rv(_RU_PART_2) or drop_in_rv(_RU_PART_1, preceded_ay=True)
        else:
            if not (drop_in_rv(_RU_VERB_2)
                    or drop_in_rv(_RU_VERB_1, preceded_ay=True)):
                drop_in_rv(_RU_NOUN)

    # step 2: final и
    if word.endswith("и") and len(word) - 1 >= pv:
        word = word[:-1]

    # step 3: derivational ост/ость in R2
    for s in ("ость", "ост"):
        if word.endswith(s) and len(word) - len(s) >= p2:
            word = word[: -len(s)]
            break

    # step 4: tidy up
    if word.endswith("нн") and len(word) - 1 >= pv:
        word = word[:-1]
    elif word.endswith(("ейше", "ейш")):
        s = "ейше" if word.endswith("ейше") else "ейш"
        if len(word) - len(s) >= pv:
            word = word[: -len(s)]
            if word.endswith("нн") and len(word) - 1 >= pv:
                word = word[:-1]
    if word.endswith("ь") and len(word) - 1 >= pv:
        word = word[:-1]
    return word
