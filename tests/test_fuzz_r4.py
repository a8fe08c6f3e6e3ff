"""Property fuzz for the round-4 surfaces: NamedRows pagination, temp-store
spec alignment, the batch-2 Snowball stemmers, and the full t2s table."""

from __future__ import annotations

import string

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# pagination: paged chain == unpaged result, for any (n_rows, page_size)
# ---------------------------------------------------------------------------

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n=st.integers(0, 37), page=st.integers(1, 11))
def test_pagination_chain_equals_unpaged(spark, n, page):
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    rows = [[i] for i in range(n)]
    script = f"?[x] <- {rows} :sort x" if rows else "?[x] <- [] :sort x"
    db.row_page_size = None
    plain = db.run_script(script).rows
    db.row_page_size = page
    r = db.run_script(script)
    pages = r.flatten()
    got = [row for p in pages for row in p.rows]
    assert got == plain
    # every page except the last is exactly `page` rows; no empty pages
    # (except a genuinely empty result's single page)
    for p in pages[:-1]:
        assert len(p.rows) == page
    if n:
        assert pages[-1].rows
    assert not pages[-1].has_more()


# ---------------------------------------------------------------------------
# temp keyed stores: random spec orders vs a dict model
# ---------------------------------------------------------------------------

@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.sampled_from(["put", "rm"]), st.integers(0, 4),
              st.integers(0, 99), st.booleans()),
    min_size=1, max_size=6))
def test_temp_store_spec_alignment_model(spark, ops):
    """Keyed temp-store mutations with randomly ORDERED specs behave like a
    plain dict keyed on k: `?[v, k] :put _m {k => v}` and `?[k] :rm _m {k}`
    in either head order."""
    from cozo_spark.datalog.engine import CozoDb

    db = CozoDb(spark)
    db.run_script(":create _m {k: Int => v: Int}")
    model: dict = {}
    for op, k, v, swap in ops:
        if op == "put":
            if swap:
                db.run_script(f"?[v, k] <- [[{v}, {k}]] :put _m {{k => v}}")
            else:
                db.run_script(f"?[k, v] <- [[{k}, {v}]] :put _m {{k => v}}")
            model[k] = v
        else:
            db.run_script(f"?[k] <- [[{k}]] :rm _m {{k}}")
            model.pop(k, None)
    got = {k: v for k, v in db.run_script("?[k, v] := *_m[k, v]").rows}
    assert got == model


# ---------------------------------------------------------------------------
# batch-2 stemmers: total functions, shortening-ish, deterministic
# ---------------------------------------------------------------------------

_LANGS2 = ["finnish", "hungarian", "romanian", "turkish", "arabic", "greek",
           "tamil"]

_word_st = st.text(
    alphabet=st.characters(codec="utf-8",
                           categories=("Ll", "Lu", "Lo", "Nd", "Mn", "Mc")),
    min_size=0, max_size=24)


@pytest.mark.parametrize("lang", _LANGS2)
@settings(max_examples=120, deadline=None)
@given(w=_word_st)
def test_stemmer_total_and_stable(lang, w):
    from cozo_spark.functions.stemmer import get_stemmer

    fn = get_stemmer(lang)
    s = fn(w)
    assert isinstance(s, str)
    assert len(s) <= len(w) + 3  # replacement endings may grow slightly
    assert fn(w) == s  # deterministic
    # re-stemming never blows up and converges quickly
    s2 = fn(s)
    assert len(fn(s2)) <= len(s2) <= len(s) + 3


@pytest.mark.parametrize("lang", _LANGS2)
def test_stemmer_ascii_passthrough_sane(lang):
    from cozo_spark.functions.stemmer import get_stemmer

    fn = get_stemmer(lang)
    for w in ["", "a", "xyz", "hello-world", "123", string.punctuation]:
        assert isinstance(fn(w), str)


# ---------------------------------------------------------------------------
# t2s: converged output (simplified text is a fixed point)
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=40))
def test_t2s_idempotent(s):
    from cozo_spark.functions.scalar import _T2S

    once = s.translate(_T2S)
    assert once.translate(_T2S) == once
    assert len(once) == len(s)  # strictly char-for-char
