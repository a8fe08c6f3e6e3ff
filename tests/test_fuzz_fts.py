"""FTS differential fuzz: random boolean queries (AND/OR/NOT over corpus
words) through the engine's `~rel:idx{..}` search atom, matched-document
sets checked against a Python set model over the same tokenization.

Scores are covered by the oracle-checked `fts_engine_search` row; this
fuzz targets the query-AST → plan translation (nesting, precedence,
NOT-branch semantics) where hand-picked examples are thin.
"""

from __future__ import annotations

import random
import re

import pytest

_DOCS = [
    (0, "spark engine compiles datalog rules into catalyst plans"),
    (1, "the catalyst optimizer prunes columns and pushes filters"),
    (2, "minhash signatures bucket near duplicate documents fast"),
    (3, "streaming state lives in the checkpoint across restarts"),
    (4, "datalog recursion runs as a semi naive fixpoint loop"),
    (5, "filters and joins shuffle on their keys at scale"),
    (6, "near duplicate detection joins minhash band buckets"),
    (7, "the fixpoint loop broadcasts small frontiers"),
    (8, "columns prune and filters push into the parquet scan"),
    (9, "checkpoint truncation keeps recursion plans shallow"),
]
_VOCAB = sorted({w for _, t in _DOCS for w in t.split()})


def _toks(text):
    return set(re.split(r"[^a-z0-9]+", text.lower())) - {""}


def _model_eval(node, doc_words):
    kind = node[0]
    if kind == "word":
        return node[1] in doc_words
    if kind == "and":
        return all(_model_eval(c, doc_words) for c in node[1])
    if kind == "or":
        return any(_model_eval(c, doc_words) for c in node[1])
    if kind == "not":
        return (_model_eval(node[1], doc_words)
                and not _model_eval(node[2], doc_words))
    raise AssertionError(kind)


def _gen_query(rnd, depth=0):
    """(query-string, model-AST). NOT is binary in the reference's syntax
    (a NOT b = a AND NOT b, fts/ast.rs)."""
    if depth >= 2 or rnd.random() < 0.4:
        w = rnd.choice(_VOCAB)
        return w, ("word", w)
    kind = rnd.choice(["and", "or", "not"])
    if kind == "not":
        ls, la = _gen_query(rnd, depth + 1)
        rs, ra = _gen_query(rnd, depth + 1)
        return f"({ls} NOT {rs})", ("not", la, ra)
    n = rnd.randint(2, 3)
    parts = [_gen_query(rnd, depth + 1) for _ in range(n)]
    joiner = " AND " if kind == "and" else " OR "
    return ("(" + joiner.join(p[0] for p in parts) + ")",
            (kind, [p[1] for p in parts]))


@pytest.mark.parametrize("seed", [13, 131])
def test_fuzz_fts_boolean_queries(spark, seed):
    from cozo_spark.datalog.engine import CozoDb

    rnd = random.Random(seed)
    db = CozoDb(spark)
    rel = f"fzdoc_{seed}"
    db.run_script(f":create {rel} {{doc_id: Int => text: String}}")
    vals = ", ".join(f"[{i}, {t!r}]" for i, t in _DOCS)
    db.run_script(f"?[doc_id, text] <- [{vals}] :put {rel} {{doc_id => text}}")
    db.run_script(f"::fts create {rel}:ft {{extractor: 'text'}}")

    words = {i: _toks(t) for i, t in _DOCS}
    for case in range(12):
        qs, ast = _gen_query(rnd)
        got = {r[0] for r in db.run_script(
            f"?[doc_id] := ~{rel}:ft{{doc_id | query: '{qs}', k: 50}}").rows}
        want = {i for i in words if _model_eval(ast, words[i])}
        assert got == want, (qs, got, want)
