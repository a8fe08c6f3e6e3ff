"""CJK HMM unknown-word grouping (functions/cjk_hmm.py + the Cangjie
tokenizer's `hmm` flag)."""

from __future__ import annotations

from cozo_spark.functions.cjk_hmm import (
    cut_run, cut_text, set_emission_table, viterbi_bmes,
)
from cozo_spark.operators.fts import _parse_cangjie, py_cangjie_tokenize


def test_viterbi_uniform_emissions_tile_bigrams():
    # under uniform emissions the published transition structure groups
    # runs into 2-3 char words: the dominant Chinese word lengths
    assert viterbi_bmes("一") == "S"
    assert viterbi_bmes("一二") == "BE"
    assert viterbi_bmes("一二三") == "BME"
    assert viterbi_bmes("一二三四") == "BEBE"
    assert cut_run("一二三四五六") == ["一二", "三四", "五六"]
    # every path ends in a word-closing state
    for n in range(1, 9):
        st = viterbi_bmes("字" * n)
        assert st[-1] in ("E", "S")
        assert len(st) == n


def test_emission_table_overrides_grouping():
    # a trained emission table changes the path: make 三 strongly Single
    set_emission_table({"B": {}, "M": {}, "E": {},
                        "S": {"三": 0.0}})
    try:
        toks = cut_run("一二三")
        assert "三" in toks  # forced out as its own word
    finally:
        set_emission_table(None)
    assert cut_run("一二三") == ["一二三"]  # uniform default restored


def test_cut_text_dict_alnum_and_hmm():
    # dict words win; alnum runs stay whole; leftover CJK runs go through
    # the HMM; punctuation/whitespace drop
    toks = cut_text("模型abc123训练 数据!", words=("训练",))
    assert "训练" in toks
    assert "abc123" in toks
    assert "!" not in toks and " " not in toks
    assert "".join(t for t in toks if t not in ("abc123",)) == "模型训练数据"


def test_parse_cangjie_hmm_flag():
    assert _parse_cangjie("Cangjie('default', hmm: true)")[2] is True
    assert _parse_cangjie("Cangjie('default', ['词一'], hmm)") == (
        "default", ["词一"], True)
    assert _parse_cangjie("Cangjie('default', hmm: false)")[2] is False
    assert _parse_cangjie("Cangjie('default')")[2] is False


def test_query_side_matches_index_side(spark):
    from pyspark.sql import functions as F

    from cozo_spark.operators.fts import tokenize_expr

    texts = ["深度学习模型训练数据", "模型abc评估",
             "纯英文text only", ""]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r[0] for r in df.select(
        tokenize_expr("text", "Cangjie('default', ['模型'], hmm)",
                      filters=())).collect()]
    want = [py_cangjie_tokenize(t, "default", ("模型",), True)
            for t in texts]
    assert got == want
    # the dict word survives intact in both
    assert "模型" in got[0]


def test_fts_index_with_hmm_cangjie(spark):
    from cozo_spark.operators.fts import FtsIndex

    docs = spark.createDataFrame(
        [(1, "深度学习模型训练"), (2, "天气预报数据")],
        "doc_id int, text string")
    idx = FtsIndex.build(docs, "text", "doc_id",
                         "Cangjie('default', hmm)", ())
    # HMM groups the unknown runs into bigrams; the query phrase
    # re-tokenizes through the same path, so 深度 retrieves doc 1
    got = {r["doc_id"] for r in idx.search("深度", k=5).collect()}
    assert got == {1}
