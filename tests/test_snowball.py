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
                                  "dutch", "swedish", "norwegian"])
def test_stemmer_is_shortening_and_stable(lang):
    """A stem never grows, and stemming a stem doesn't oscillate wildly
    (words from mixed corpora shouldn't blow up the UDF)."""
    fn = get_stemmer(lang)
    words = ["internationalization", "xyz", "a", "", "123", "co-op"]
    for w in words:
        s = fn(w)
        assert len(s) <= len(w) + 3  # replacement endings may grow slightly


def test_unsupported_language_raises():
    with pytest.raises(NotImplementedError):
        get_stemmer("tamil")


def test_short_language_codes():
    assert get_stemmer("de")("katzen") == "katz"
    assert get_stemmer("fr")("grandes") == "grand"


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
