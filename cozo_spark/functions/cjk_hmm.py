"""HMM unknown-word grouping for the Cangjie CJK tokenizer.

The reference's Cangjie tokenizer wraps jieba (fts/cangjie/tokenizer.rs,
options.rs: `hmm` flag); jieba's unknown-word pass is a 4-state BMES
(Begin/Middle/End/Single) hidden Markov model decoded with Viterbi over
each run of characters the dictionary can't cover. This module implements
that algorithm with:

- the published jieba finalseg START/TRANSITION log-probabilities (tiny,
  MIT-licensed constants reproduced in countless articles — the model
  STRUCTURE, not a data file);
- a pluggable per-character EMISSION table. jieba's trained emission
  table is a ~100k-entry corpus artifact we do not ship; the default is a
  uniform emission, under which the transition structure alone groups
  unknown runs into the 2-3 character words that dominate Chinese
  morphology (derivation: for n>=2 the max-probability BMES path under
  uniform emissions tiles the run with BE pairs / one BME triple).
  ``set_emission_table({state: {char: logp}})`` plugs in a real trained
  table (e.g. loaded from jieba's prob_emit) for full-fidelity output.

Execution model matches the stemmers: driver-side for query terms,
Arrow-batched pandas UDF over the text column for index builds (fts.py).
"""

from __future__ import annotations

from typing import Dict, Optional

# jieba finalseg prob_start.py / prob_trans.py (natural-log probabilities)
MIN_FLOAT = -3.14e100
START_P = {"B": -0.26268660809250016, "E": MIN_FLOAT,
           "M": MIN_FLOAT, "S": -1.4652633398537678}
TRANS_P = {
    "B": {"E": -0.510825623765990, "M": -0.916290731874155},
    "E": {"B": -0.5897149736854513, "S": -0.8085250474669937},
    "M": {"E": -0.33344856811948514, "M": -1.2603623820268226},
    "S": {"B": -0.7211965654669841, "S": -0.6658631448798212},
}
_PREV = {"B": ("E", "S"), "M": ("M", "B"), "S": ("S", "E"), "E": ("B", "M")}
_STATES = ("B", "M", "E", "S")

_EMIT: Optional[Dict[str, Dict[str, float]]] = None


def set_emission_table(emit: Optional[Dict[str, Dict[str, float]]]) -> None:
    """Install a trained per-character emission table ({state: {char:
    log_prob}}); None restores the uniform default."""
    global _EMIT
    _EMIT = emit


def _emit_log(state: str, ch: str) -> float:
    if _EMIT is None:
        return 0.0
    return _EMIT.get(state, {}).get(ch, MIN_FLOAT)


def viterbi_bmes(run: str) -> str:
    """Most-probable BMES state string for a character run."""
    v = [{s: START_P[s] + _emit_log(s, run[0]) for s in _STATES}]
    path = {s: s for s in _STATES}
    for t in range(1, len(run)):
        nv, npath = {}, {}
        for s in _STATES:
            em = _emit_log(s, run[t])
            best, barg = None, None
            for p in _PREV[s]:
                sc = v[-1][p] + TRANS_P[p].get(s, MIN_FLOAT) + em
                if best is None or sc > best:
                    best, barg = sc, p
            nv[s] = best
            npath[s] = path[barg] + s
        v.append(nv)
        path = npath
    # jieba: the final state must close a word (E or S)
    last = max(("E", "S"), key=lambda s: v[-1][s])
    return path[last]


def cut_run(run: str) -> list:
    """Segment one unknown CJK run via the BMES path."""
    if len(run) <= 1:
        return [run] if run else []
    out, start = [], 0
    for i, st in enumerate(viterbi_bmes(run)):
        if st in ("E", "S"):
            out.append(run[start:i + 1])
            start = i + 1
    if start < len(run):  # defensive: path ended mid-word
        out.append(run[start:])
    return out


def _is_cjk(ch: str) -> bool:
    o = ord(ch)
    return (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF
            or 0xF900 <= o <= 0xFAFF or 0x20000 <= o <= 0x2A6DF)


def cut_text(text: str, words: tuple = (), max_word: int = 8) -> list:
    """jieba-shaped cut: dictionary forward-max-match first; maximal runs
    the dictionary cannot cover buffer up and segment through the HMM
    (jieba __cut_DAG's buf -> finalseg.cut); non-CJK alphanumeric runs
    stay whole; everything else is dropped (the tokenizer contract —
    punctuation/whitespace never become tokens)."""
    by_len: dict[int, set] = {}
    for w in words:
        by_len.setdefault(len(w), set()).add(w)
    lens = sorted((ln for ln in by_len if ln >= 1), reverse=True)

    out: list = []
    buf: list = []

    def flush():
        if buf:
            out.extend(cut_run("".join(buf)))
            buf.clear()

    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        matched = None
        for ln in lens:
            if ln <= n - i and text[i:i + ln] in by_len[ln]:
                matched = text[i:i + ln]
                break
        if matched is not None:
            flush()
            out.append(matched)
            i += len(matched)
        elif _is_cjk(ch):
            buf.append(ch)
            i += 1
        elif ch.isalnum():
            flush()
            j = i + 1
            while j < n and text[j].isalnum() and not _is_cjk(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
        else:
            flush()
            i += 1
    flush()
    return out
