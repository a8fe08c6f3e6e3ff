"""Snowball stemmer family (cozo_spark/functions/snowball.py).

Reference surface: fts/tokenizer/stemmer.rs Language enum (18 languages via
rust_stemmers). Tests: golden pairs from the published algorithm samples +
inflection-family collapse (all forms of a lemma stem identically) — the
property FTS recall actually depends on.
"""

from __future__ import annotations

import pytest

from cozo_spark.functions.stemmer import get_stemmer


GOLDEN = {
    "danish": [("huset", "hus"), ("indtagelsen", "indtag"),
               ("indtagelse", "indtag")],
    "norwegian": [("huset", "hus"), ("hetene", "het")],
    "swedish": [("flickorna", "flick"), ("klokaste", "klok")],
    "german": [("häuser", "haus"), ("katzen", "katz"),
               ("bezeichnung", "bezeichn")],
    "dutch": [("lichamelijk", "licham"), ("randapparatuur", "randapparatur")],
    "french": [("continuerait", "continu"), ("grandes", "grand")],
    "spanish": [("niñas", "niñ"), ("corriendo", "corr")],
    "italian": [("abbandonata", "abbandon"), ("nazionale", "nazional")],
    "portuguese": [("bondade", "bondad"), ("falando", "fal")],
    "russian": [("книгами", "книг"), ("важная", "важн")],
    # batch 2 (snowball_ext.py): golden outputs pinned from the published
    # algorithm implementations; each pair hand-checked for linguistic
    # sensibility (lemma-consistent stems)
    "finnish": [("taloissa", "talo"), ("edeltäjistään", "edeltäj"),
                ("koirille", "koir"), ("kirjasta", "kirj")],
    "hungarian": [("házakat", "ház"), ("házban", "ház"),
                  ("könyvtárban", "könyvtár"), ("babák", "baba")],
    "romanian": [("copiilor", "cop"), ("frumoase", "frumoas"),
                 ("abilitate", "abil"), ("lucrează", "lucr")],
    "turkish": [("kitabı", "kitap"), ("kitaplarda", "kitap"),
                ("evlerden", "ev"), ("geldiler", "gel")],
    "arabic": [("الكتاب", "كتاب"), ("المكتبة", "مكتب"),
               ("يكتبون", "كتب"), ("للمدرسة", "مدرس"),
               # r5: full verb/noun conjugation tables — person/number
               # endings, possessives over plurals, form-X restoration,
               # future marker, nisba adjectives
               ("ذهبنا", "ذهب"), ("تدرسون", "درس"),
               ("سيكتبون", "كتب"), ("يستخدمون", "استخدم"),
               ("مكتباتها", "مكتب"), ("طالبات", "طالب"),
               ("معلمات", "معلم"), ("كتابك", "كتاب"),
               ("العربية", "عرب"), ("بالمدرسة", "مدرس")],
    "greek": [("καλός", "καλ"), ("βιβλίου", "βιβλ"),
              ("σώματος", "σωμα"), ("γράφεις", "γραφ")],
    "tamil": [("புத்தகங்கள்", "புத்தக"),
              ("படிக்கிறான்", "படி"),
              ("நிலம்", "நில")],
}

FAMILIES = {
    "danish": ["indtagelse", "indtagelsen", "indtagelser"],
    "norwegian": ["billig", "billige"],
    "swedish": ["flicka", "flickor", "flickorna"],
    "german": ["katze", "katzen"],
    "dutch": ["lichamelijk", "lichamelijke"],
    "french": ["continuera", "continuerait", "continuant"],
    "spanish": ["niña", "niñas", "niño", "niños"],
    "italian": ["abbandonata", "abbandonato", "abbandonate"],
    "portuguese": ["falando", "falar", "falou"],
    "russian": ["книга", "книги", "книгами"],
    "finnish": ["talo", "talot", "talossa", "taloista", "taloissa"],
    "hungarian": ["házak", "házakat", "házban", "házam"],
    "romanian": ["fete", "fetele"],
    "turkish": ["kitap", "kitaplar", "kitabı", "kitaplarda", "kitapları"],
    "arabic": ["كتاب", "الكتاب", "كتابها", "والكتاب", "كتابك", "كتابي"],
    "greek": ["καλός", "καλη", "καλοί", "καλές"],
    "tamil": ["புத்தகம்", "புத்தகங்கள்"],
}


@pytest.mark.parametrize("lang", sorted(GOLDEN))
def test_golden_pairs(lang):
    fn = get_stemmer(lang)
    for word, want in GOLDEN[lang]:
        assert fn(word) == want, (lang, word, fn(word), want)


@pytest.mark.parametrize("lang", sorted(FAMILIES))
def test_family_collapse(lang):
    fn = get_stemmer(lang)
    stems = {fn(w) for w in FAMILIES[lang]}
    assert len(stems) == 1, (lang, {w: fn(w) for w in FAMILIES[lang]})


@pytest.mark.parametrize("lang", ["danish", "german", "french", "spanish",
                                  "italian", "portuguese", "russian",
                                  "dutch", "swedish", "norwegian",
                                  "finnish", "hungarian", "romanian",
                                  "turkish", "arabic", "greek", "tamil"])
def test_stemmer_is_shortening_and_stable(lang):
    """A stem never grows, and stemming a stem doesn't oscillate wildly
    (words from mixed corpora shouldn't blow up the UDF)."""
    fn = get_stemmer(lang)
    words = ["internationalization", "xyz", "a", "", "123", "co-op"]
    for w in words:
        s = fn(w)
        assert len(s) <= len(w) + 3  # replacement endings may grow slightly


def test_unsupported_language_raises():
    # all 18 reference languages are now implemented; a language the
    # reference does not wrap still raises with context
    with pytest.raises(NotImplementedError):
        get_stemmer("basque")


def test_all_reference_languages_resolve():
    """fts/tokenizer/stemmer.rs:1-35 wraps exactly these 18 languages."""
    for lang in ("arabic", "danish", "dutch", "english", "finnish",
                 "french", "german", "greek", "hungarian", "italian",
                 "norwegian", "portuguese", "romanian", "russian",
                 "spanish", "swedish", "tamil", "turkish"):
        assert callable(get_stemmer(lang)), lang


def test_short_language_codes():
    assert get_stemmer("de")("katzen") == "katz"
    assert get_stemmer("fr")("grandes") == "grand"
    assert get_stemmer("tr")("kitabı") == "kitap"
    assert get_stemmer("fi")("taloissa") == "talo"


def test_fts_index_with_language_stemmer(spark):
    """End-to-end: a German-stemmed FTS index retrieves inflected forms."""
    from cozo_spark.operators.fts import FtsIndex

    docs = spark.createDataFrame(
        [(1, "die katzen schlafen"), (2, "der hund bellt laut")],
        "doc_id int, text string")
    idx = FtsIndex.build(docs, "text", "doc_id", "Simple",
                         ("Lowercase", "Stemmer(german)"))
    got = {r["doc_id"] for r in idx.search("katze", k=5).collect()}
    assert got == {1}


# -- round-5 expansions: Greek step-1 table, comparatives; Tamil tense
# families; Turkish case folding (see also test_advice_r5.py) ------------


def test_greek_step1_irregulars():
    from cozo_spark.functions.snowball_ext import stem_greek

    # the published algorithm's irregular-noun table: every form of an
    # entry collapses to the listed stem (Ntais table 1)
    assert stem_greek("φως") == stem_greek("φωτός") == \
        stem_greek("φώτα") == stem_greek("φώτων") == "φω"
    assert stem_greek("κρέας") == stem_greek("κρέατος") == \
        stem_greek("κρέατα") == "κρε"
    assert stem_greek("γεγονός") == stem_greek("γεγονότα") == "γεγον"
    assert stem_greek("καθεστώς") == stem_greek("καθεστώτος") == "καθεστ"


def test_greek_comparatives_collapse():
    from cozo_spark.functions.snowball_ext import stem_greek

    # -τερ-/-τατ- graded forms share one stem across degrees
    assert stem_greek("μεγαλύτερος") == stem_greek("μεγαλύτερη") == \
        stem_greek("μεγαλύτατος") == "μεγαλ"
    assert stem_greek("ψηλότερος") == stem_greek("ψηλότατος")


def test_tamil_tense_person_gender_families():
    from cozo_spark.functions.snowball_ext import stem_tamil

    # past: he/she/they/I/we read -> same stem
    forms = ["படித்தான்", "படித்தாள்", "படித்தார்",
             "படித்தார்கள்", "படித்தேன்", "படித்தோம்"]
    stems = {stem_tamil(w) for w in forms}
    assert len(stems) == 1, stems
    # present family including 1st/2nd person
    forms = ["படிக்கிறான்", "படிக்கிறாள்",
             "படிக்கிறேன்", "படிக்கிறோம்"]
    assert len({stem_tamil(w) for w in forms}) == 1
    # future family
    forms = ["படிப்பான்", "படிப்பாள்", "படிப்பார்",
             "படிப்பேன்", "படிப்போம்"]
    assert len({stem_tamil(w) for w in forms}) == 1
