"""Full-text search: tokenizer pipeline, inverted index, TF-IDF scoring,
boolean/NEAR query evaluation.

Reference: cozo-core/src/fts/ — tokenizer stack (fts/tokenizer/*), query AST
(fts/ast.rs), TF-IDF scoring and index maintenance (fts/indexing.rs:1-392),
search execution (query/ra.rs:977-1067 FtsSearchRA). Re-expression:

- the inverted index is a DataFrame (term, doc_id, tf, positions) built with
  explode + groupBy — one shuffle on term, columnar, incrementally mergeable;
- a query compiles to a small boolean tree over per-term posting DataFrames;
  AND = inner join on doc_id, OR = union + score-sum, NOT = anti-join,
  NEAR = position-array proximity check via F.exists on zipped positions;
- scoring is TF-IDF: tf from the index, idf = ln(1 + N/df) computed per query
  against a one-row doc-count; top-k via orderBy.limit (TakeOrdered).

At scale the index is the only big artifact; it partitions by term hash and
the per-query joins touch only the queried terms' postings (partition-pruned
if the index is bucketed by term).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- tokenizer pipeline (fts/tokenizer/*): simple | raw | ngram; filters:
# lowercase, alphanumonly, asciifolding, stemmer (stub), stopwords ------------


def tokenize_expr(text_col, tokenizer: str = "Simple", filters: tuple = ("Lowercase",)):
    """Build the token-array Column for a given tokenizer + filter chain."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    lowered = "Lowercase" in filters or tokenizer == "Simple"
    if lowered:
        c = F.lower(c)
    if "AsciiFolding" in filters:
        # strip combining marks after NFD-ish folding: approximate with
        # translate of the common accented latin range (JVM-side)
        c = F.translate(c, "áàâäãåçéèêëíìîïñóòôöõúùûüýÿ", "aaaaaaceeeeiiiinooooouuuuyy")
    if tokenizer == "Raw":
        toks = F.array(c)
    elif tokenizer == "Simple":
        toks = F.filter(F.split(c, "[^\\p{L}\\p{N}]+"), lambda t: t != "")
    elif tokenizer == "Whitespace":
        toks = F.filter(F.split(c, "\\s+"), lambda t: t != "")
    elif tokenizer.startswith("NGram"):
        m = re.match(r"NGram\((\d+)(?:,\s*(\d+))?", tokenizer)
        lo = int(m.group(1)) if m else 2
        hi = int(m.group(2)) if m and m.group(2) else lo
        parts = []
        for n in range(lo, hi + 1):
            idx = F.sequence(F.lit(1), F.greatest(F.length(c) - n + 1, F.lit(0)))
            parts.append(F.transform(idx, lambda i, nn=n: c.substr(i, F.lit(nn))))
        toks = parts[0]
        for p in parts[1:]:
            toks = F.concat(toks, p)
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    if "AlphaNumOnly" in filters:
        toks = F.filter(toks, lambda t: t.rlike("^[\\p{L}\\p{N}]+$"))
    if "Stopwords" in filters or any(str(f).startswith("Stopwords") for f in filters):
        stop = F.array(*[F.lit(w) for w in _EN_STOP])
        toks = F.filter(toks, lambda t: ~F.array_contains(stop, t))
    return toks


_EN_STOP = ["a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
            "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
            "to", "was", "were", "will", "with"]


def build_fts_index(df: DataFrame, text_col: str, id_col: str,
                    tokenizer: str = "Simple", filters: tuple = ("Lowercase",)) -> DataFrame:
    """(term, doc_id, tf, positions): the inverted index.

    positions are token offsets (for NEAR); one shuffle on (doc, term) then
    the index lives partitioned by term.
    """
    toks = tokenize_expr(text_col, tokenizer, filters)
    exploded = (
        df.select(F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "term"))
    )
    return (
        exploded.groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"),
             F.sort_array(F.collect_list("pos")).alias("positions"))
    )


# --- query AST (fts/ast.rs; grammar cozoscript.pest fts_* rules) ----------------


@dataclass
class FtsPhrase:
    terms: list          # consecutive terms (phrase = positional adjacency)
    prefix: bool = False
    boost: float = 1.0


@dataclass
class FtsNear:
    phrases: list
    distance: int = 10


@dataclass
class FtsBool:
    op: str              # 'and' | 'or' | 'not'
    children: list = field(default_factory=list)


_FTS_TOK = re.compile(r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<and>AND\b) | (?P<or>OR\b|,|;) | (?P<not>NOT\b) |
    (?P<near>NEAR(?:/(?P<dist>\d+))?\s*\() |
    (?P<quoted>"[^"]*"|'[^']*') |
    (?P<word>[\w*]+(?:\^[\d.]+)?) |
    (?P<ws>\s+)
""", re.VERBOSE)


def parse_fts_query(q: str):
    """Parse the reference's FTS query syntax into an AST."""
    toks = []
    pos = 0
    while pos < len(q):
        m = _FTS_TOK.match(q, pos)
        if not m:
            raise ValueError(f"bad FTS query at {q[pos:]!r}")
        kind = m.lastgroup
        if kind != "ws":
            toks.append((kind, m))
        pos = m.end()
    out, i = _parse_fts_expr(toks, 0)
    return out


def _mk_phrase(text: str) -> FtsPhrase:
    boost = 1.0
    prefix = False
    if "^" in text:
        text, b = text.rsplit("^", 1)
        boost = float(b)
    if text.endswith("*"):
        prefix = True
        text = text[:-1]
    terms = [t for t in re.split(r"[^\w]+", text.lower()) if t]
    return FtsPhrase(terms, prefix, boost)


def _parse_fts_expr(toks, i):
    items = []
    ops = []
    while i < len(toks):
        kind, m = toks[i]
        if kind == "rparen":
            break
        if kind == "lparen":
            sub, i = _parse_fts_expr(toks, i + 1)
            if i < len(toks) and toks[i][0] == "rparen":
                i += 1
            items.append(sub)
        elif kind == "near":
            dist = int(m.group("dist") or 10)
            phrases = []
            i += 1
            while i < len(toks) and toks[i][0] != "rparen":
                k2, m2 = toks[i]
                if k2 in ("word", "quoted"):
                    txt = m2.group(0).strip("\"'")
                    phrases.append(_mk_phrase(txt))
                i += 1
            if i < len(toks):
                i += 1  # consume rparen
            items.append(FtsNear(phrases, dist))
        elif kind in ("word", "quoted"):
            txt = m.group(0).strip("\"'")
            items.append(_mk_phrase(txt))
            i += 1
        elif kind in ("and", "or", "not"):
            ops.append(kind)
            i += 1
        else:
            i += 1
    if not items:
        raise ValueError("empty FTS query")
    # fold: adjacent items with no op = AND (reference: implicit AND);
    # NOT binds to the following item
    tree = items[0]
    oi = 0
    for nxt in items[1:]:
        op = ops[oi] if oi < len(ops) else "and"
        oi += 1
        if op == "not":
            tree = FtsBool("not", [tree, nxt])
        elif op == "or":
            tree = FtsBool("or", [tree, nxt])
        else:
            tree = FtsBool("and", [tree, nxt])
    return tree, i


# --- search execution (ra.rs:977-1067) ------------------------------------------


class FtsIndex:
    """A built FTS index + the stats needed for scoring."""

    def __init__(self, index_df: DataFrame, n_docs: int,
                 tokenizer: str = "Simple", filters: tuple = ("Lowercase",)):
        self.df = index_df
        self.n_docs = n_docs
        self.tokenizer = tokenizer
        self.filters = filters

    @classmethod
    def build(cls, df: DataFrame, text_col: str, id_col: str,
              tokenizer: str = "Simple", filters: tuple = ("Lowercase",)) -> "FtsIndex":
        from cozo_spark.datalog.fixpoint import _checkpoint

        idx = _checkpoint(build_fts_index(df, text_col, id_col, tokenizer, filters))
        return cls(idx, df.count(), tokenizer, filters)

    def search(self, query: str, k: int = 10, score_kind: str = "tf_idf",
               candidates: DataFrame | None = None) -> DataFrame:
        """(doc_id, score) top-k by TF-IDF or plain TF (fts/indexing.rs
        scoring; score_kind param of FtsSearch, data/program.rs:1283-1301).
        ``candidates`` (doc_id frame) restricts the result BEFORE top-k —
        the filter: option's semantics."""
        self._score_kind = str(score_kind).lower().replace("-", "_")
        ast = parse_fts_query(query)
        scored = self._eval(ast)
        if candidates is not None:
            scored = scored.join(candidates, "doc_id")
        return (
            scored.orderBy(F.col("score").desc(), F.col("doc_id"))
            .limit(k)
        )

    def _idf_factor(self, df_count: int) -> float:
        if getattr(self, "_score_kind", "tf_idf") == "tf":
            return 1.0
        return float(_idf(self.n_docs, max(df_count, 1)))

    # posting set for one phrase, scored
    def _phrase_postings(self, p: FtsPhrase) -> DataFrame:
        idx = self.df
        if not p.terms:
            raise ValueError("empty phrase")
        if p.prefix and len(p.terms) == 1:
            posts = idx.filter(F.col("term").startswith(p.terms[0]))
            df_count = posts.select("doc_id").distinct().count()
            idf = F.lit(self._idf_factor(df_count))
            return (posts.groupBy("doc_id")
                    .agg((F.sum("tf") * idf * p.boost).alias("score")))
        parts = []
        for i, t in enumerate(p.terms):
            parts.append(
                idx.filter(F.col("term") == t)
                .select("doc_id", F.col("tf").alias(f"tf_{i}"),
                        F.col("positions").alias(f"pos_{i}")))
        cur = parts[0]
        for i, nxt in enumerate(parts[1:], start=1):
            cur = cur.join(nxt, "doc_id")
            # phrase adjacency: some position in pos_i equals pos_{i-1}+1
            adj = F.exists(
                F.col(f"pos_{i - 1}"),
                lambda x: F.exists(F.col(f"pos_{i}"), lambda y: y == x + 1))
            cur = cur.filter(adj)
        score = None
        for i, t in enumerate(p.terms):
            dfc = self._df_count(t)
            s = F.col(f"tf_{i}") * F.lit(self._idf_factor(dfc))
            score = s if score is None else score + s
        return cur.select("doc_id", (score * p.boost).alias("score"))

    def _df_count(self, term: str) -> int:
        r = self.df.filter(F.col("term") == term).agg(F.count("*").alias("c")).collect()
        return max(int(r[0]["c"]), 1)

    def _eval(self, node) -> DataFrame:
        if isinstance(node, FtsPhrase):
            return self._phrase_postings(node)
        if isinstance(node, FtsNear):
            return self._eval_near(node)
        if isinstance(node, FtsBool):
            l = self._eval(node.children[0])
            r = self._eval(node.children[1])
            if node.op == "and":
                return (l.withColumnRenamed("score", "s1")
                        .join(r.withColumnRenamed("score", "s2"), "doc_id")
                        .select("doc_id", (F.col("s1") + F.col("s2")).alias("score")))
            if node.op == "or":
                return (l.unionByName(r).groupBy("doc_id")
                        .agg(F.sum("score").alias("score")))
            if node.op == "not":
                return l.join(r.select("doc_id"), "doc_id", "left_anti")
        raise ValueError(f"bad FTS node {node!r}")

    def _eval_near(self, node: FtsNear) -> DataFrame:
        # all phrases present, min pairwise distance <= node.distance
        parts = []
        for i, p in enumerate(node.phrases):
            posts = self._phrase_postings_with_positions(p, i)
            parts.append(posts)
        cur = parts[0]
        for i, nxt in enumerate(parts[1:], start=1):
            cur = cur.join(nxt, "doc_id")
            near = F.exists(
                F.col(f"np_{i - 1}"),
                lambda x: F.exists(F.col(f"np_{i}"),
                                   lambda y: F.abs(y - x) <= node.distance))
            cur = cur.filter(near)
        score = None
        for i in range(len(parts)):
            s = F.col(f"ns_{i}")
            score = s if score is None else score + s
        return cur.select("doc_id", score.alias("score"))

    def _phrase_postings_with_positions(self, p: FtsPhrase, tag: int) -> DataFrame:
        t = p.terms[0]
        dfc = self._df_count(t)
        return (
            self.df.filter(F.col("term") == t)
            .select("doc_id",
                    (F.col("tf") * F.lit(self._idf_factor(dfc)) * p.boost).alias(f"ns_{tag}"),
                    F.col("positions").alias(f"np_{tag}"))
        )


def _idf(n_docs: int, df_count: int) -> float:
    import math

    return math.log(1.0 + n_docs / df_count)
