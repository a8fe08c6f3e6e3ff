"""Fixed rules: graph algorithms & utilities, the engine's UDTF surface.

Mirrors the reference registry (cozo-core/src/fixed_rule/mod.rs:706-835):
a fixed rule is a function ``(inputs: list[DataFrame], options: dict) ->
DataFrame``. User-registrable at runtime (Db.register_fixed_rule analogue,
db.rs:760-788).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

FixedRule = Callable[..., DataFrame]

# ReorderSort: inputs whose Catalyst size estimate is below this take the
# reference's single-node sort shape; at/above it, the two-pass
# range-partitioned global position (module-level so tests can force the
# distributed branch on small data)
REORDER_SORT_SMALL_BYTES = 64 << 20

_REGISTRY: dict[str, FixedRule] = {}

# bumped on every register/unregister so compiled-plan caches keyed on the
# rule surface invalidate when the registry changes
REGISTRY_VERSION = 0


def register_fixed_rule(name: str, fn: FixedRule) -> None:
    """Register a user fixed rule. Mirrors db.rs:760-777: a name already
    registered (builtin or user) is an error, never a silent overwrite —
    the registry is module-global, so clobbering e.g. PageRank would
    poison every CozoDb instance in the process."""
    global REGISTRY_VERSION
    if name in _REGISTRY:
        raise ValueError(
            f"A fixed rule with the name {name!r} is already registered")
    _REGISTRY[name] = fn
    REGISTRY_VERSION += 1


def unregister_fixed_rule(name: str) -> bool:
    """Drop a USER rule; builtins are protected (db.rs:779-784 bails with
    'Cannot unregister builtin fixed rule'). Returns whether a user rule
    was actually removed (the reference's Ok(removed.is_some()))."""
    global REGISTRY_VERSION
    if name in _BUILTIN_RULES:
        raise ValueError(f"cannot unregister builtin fixed rule {name!r}")
    removed = _REGISTRY.pop(name, None) is not None
    if removed:
        REGISTRY_VERSION += 1
    return removed


def get_fixed_rule(name: str) -> FixedRule:
    if name not in _REGISTRY:
        raise KeyError(f"fixed rule not found: {name!r} (known: {sorted(_REGISTRY)})")
    return _REGISTRY[name]


def fixed_rule_names() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtins() -> None:
    from cozo_spark.fixed_rules import graphs
    from cozo_spark.sources import readers

    for name, fn in graphs.BUILTIN_RULES.items():
        register_fixed_rule(name, fn)
    register_fixed_rule("CsvReader", readers.csv_reader)
    register_fixed_rule("JsonReader", readers.json_reader)
    register_fixed_rule("Constant", readers.constant)

    def reorder_sort(inputs: list, options: dict | None = None) -> DataFrame:
        """ReorderSort (fixed_rule/utilities/reorder_sort.rs:30-125):
        ``sort_by:`` expression (a list expr = multi-key), ``out:`` list of
        output expressions over the input bindings, ``descending``,
        ``break_ties`` (true → row position, false → competition rank over
        the sorter value), ``skip``/``take`` applied to row positions."""
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from cozo_spark.datalog.ast import ListEx, Var
        from cozo_spark.datalog.translate import _df_typer, compile_expr

        options = dict(options or {})
        df = inputs[0]
        bound = set(df.columns)
        typer = _df_typer(df)

        def to_col(e):
            if isinstance(e, str):
                return F.col(e)
            if isinstance(e, (int, float, bool)):
                return F.lit(e)
            if hasattr(e, "cast"):  # already a Column
                return e
            return compile_expr(e, bound, typer)

        sb = options.get("sort_by")
        if sb is None:
            sorter = F.struct(*[F.col(c) for c in df.columns])
        elif isinstance(sb, ListEx):
            sorter = F.struct(*[compile_expr(x, bound, typer) for x in sb.items])
        elif isinstance(sb, (list, tuple)):
            sorter = F.struct(*[to_col(x) for x in sb])
        else:
            sorter = to_col(sb)
        desc = bool(options.get("descending", False))
        work = df.withColumn("_sorter", sorter)
        order = [F.col("_sorter").desc() if desc else F.col("_sorter").asc()]
        # value-deterministic position among ties (the reference keeps input
        # order; DataFrames have none, so full-tuple order stands in)
        order += [F.col(c).asc() for c in df.columns]
        # Two-pass global position: a bare Window.orderBy would move every
        # row to ONE partition (the reference's sort is single-node anyway,
        # reorder_sort.rs:30-125, but a global rank doesn't require that).
        # Range-partition on the sort order; within each sorted partition
        # monotonically_increasing_id's low 33 bits are the consecutive
        # 0-based record number (documented layout: partition id in the
        # high bits), so the local position costs NO window and NO second
        # full-data exchange. Global position = local + prefix-sum of
        # earlier partitions' row counts (a tiny per-partition counts
        # relation, self-joined for the prefix sum, broadcast back).
        # The range-shuffle exchange is shared by the counts branch and
        # the output branch (ReuseExchange), so _pid agrees.
        spark = df.sparkSession
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        # Catalyst's size estimate is free (no job); small inputs take the
        # reference's own single-node sort shape (one exchange, no
        # sampling pass, no counts branch) — AQE-style adaptivity.
        try:
            est = int(work._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes())
        except Exception:
            est = 1 << 62
        if est < REORDER_SORT_SMALL_BYTES:
            work = (work.repartition(1).sortWithinPartitions(*order)
                    .withColumn(
                        "_pos",
                        (F.monotonically_increasing_id() + 1).cast("long")))
        else:
            ranged = (work.repartitionByRange(n_part, *order)
                      .sortWithinPartitions(*order)
                      .withColumn("_mid", F.monotonically_increasing_id())
                      .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
                      .withColumn("_local",
                                  F.col("_mid").bitwiseAND((1 << 33) - 1)))
            counts = ranged.groupBy("_pid").agg(
                F.count(F.lit(1)).alias("_cnt"))
            offs = (counts.alias("a")
                    .join(counts.alias("b"),
                          F.col("b._pid") < F.col("a._pid"), "left")
                    .groupBy(F.col("a._pid").alias("_pid"))
                    .agg(F.coalesce(F.sum("b._cnt"), F.lit(0))
                         .cast("long").alias("_off")))
            work = (ranged.join(F.broadcast(offs), "_pid")
                    .withColumn("_pos",
                                (F.col("_local") + F.col("_off") + 1)
                                .cast("long")))
        if options.get("break_ties", False):
            work = work.withColumn("_rank", F.col("_pos"))
        else:
            # competition rank = min global position among equal sorter
            # values; tie-groups bound the window partitions
            work = work.withColumn(
                "_rank",
                F.min("_pos").over(W.partitionBy("_sorter")).cast("long"))
        skip = int(options.get("skip", 0) or 0)
        take = options.get("take")
        if skip:
            work = work.filter(F.col("_pos") > skip)
        if take is not None:
            work = work.filter(F.col("_pos") <= skip + int(take))

        out_spec = options.get("out")
        if out_spec is None or out_spec is True:
            out_cols = [F.col(c) for c in df.columns]
        elif out_spec is False:
            return work.select(*df.columns)
        elif isinstance(out_spec, ListEx):
            out_cols = []
            for i, e in enumerate(out_spec.items):
                name = e.name if isinstance(e, Var) else f"out_{i}"
                out_cols.append(compile_expr(e, bound, typer).alias(name))
        elif isinstance(out_spec, (list, tuple)):
            out_cols = [to_col(x) for x in out_spec]
        else:
            out_cols = [to_col(out_spec)]
        return work.select(F.col("_rank"), *out_cols)

    register_fixed_rule("ReorderSort", reorder_sort)
    _register_pipeline_rules()


def _register_pipeline_rules() -> None:
    """LLM-data-pipeline operators as CozoScript fixed rules (beyond the
    reference's registry — its pipeline-adjacent features are indices;
    here the batch operators are first-class UDTFs too):

        pairs[] <~ MinHashPairs(*docs[], threshold: 0.5)
        clus[]  <~ DedupClusters(pairs[])
        cont[]  <~ NgramContamination(*corpus[], *bench[], n: 3)
        packs[] <~ PackSequences(*docs[], capacity: 2048)
        q[]     <~ QualityScores(*docs[])
        langs[] <~ LanguageId(*docs[])
        red[]   <~ PiiRedact(*docs[])
        rep[]   <~ RepetitionSignals(*docs[])
        samp[]  <~ BalancedSample(*docs_with_stratum[], per_stratum: 10)
        kw[]    <~ KeywordTopK(*docs[], k: 3)

    Doc-shaped inputs take their first two columns as (id, text)."""
    from pyspark.sql import functions as F

    def _doc_frame(df: DataFrame) -> DataFrame:
        c = df.columns
        if len(c) < 2:
            raise ValueError("expected a (doc_id, text) shaped input relation")
        return df.select(F.col(c[0]).alias("doc_id"), F.col(c[1]).alias("text"))

    def minhash_pairs(inputs, options=None):
        from cozo_spark.operators.dedup import minhash_lsh_dedup_pairs

        o = dict(options or {})
        return minhash_lsh_dedup_pairs(
            _doc_frame(inputs[0]),
            threshold=float(o.get("threshold", 0.7)),
            num_perm=int(o.get("n_perm", 64)),
            shingle_n=int(o.get("n_gram", 3)))

    def dedup_clusters_rule(inputs, options=None):
        from cozo_spark.operators.dedup import dedup_clusters

        c = inputs[0].columns
        pairs = inputs[0].select(F.col(c[0]).alias("id_a"),
                                 F.col(c[1]).alias("id_b"))
        return dedup_clusters(pairs)

    def contamination_rule(inputs, options=None):
        from cozo_spark.operators.dedup import ngram_contamination

        o = dict(options or {})
        return ngram_contamination(
            _doc_frame(inputs[0]), _doc_frame(inputs[1]),
            shingle_n=int(o.get("n", 3)),
            threshold=float(o.get("threshold", 0.1)))

    def pack_rule(inputs, options=None):
        from cozo_spark.operators.text import pack_sequences

        o = dict(options or {})
        return pack_sequences(
            _doc_frame(inputs[0]),
            capacity=int(o.get("capacity", 2048)),
            shards=int(o.get("shards", 32)))

    def quality_rule(inputs, options=None):
        from cozo_spark.operators.text import quality_scores

        return quality_scores(_doc_frame(inputs[0]))

    def langid_rule(inputs, options=None):
        from cozo_spark.operators.text import language_id

        return language_id(_doc_frame(inputs[0]))

    def pii_rule(inputs, options=None):
        from cozo_spark.operators.text import pii_redact

        return pii_redact(_doc_frame(inputs[0]))

    def repetition_rule(inputs, options=None):
        from cozo_spark.operators.text import repetition_signals

        return repetition_signals(_doc_frame(inputs[0]))

    def balanced_sample_rule(inputs, options=None):
        from cozo_spark.operators.text import balanced_sample

        c = inputs[0].columns
        if len(c) < 3:
            raise ValueError(
                "BalancedSample expects (doc_id, text, stratum) columns")
        o = dict(options or {})
        d = inputs[0].select(F.col(c[0]).alias("doc_id"),
                             F.col(c[1]).alias("text"),
                             F.col(c[2]).alias("source"))
        return balanced_sample(d, per_stratum=int(o.get("per_stratum", 10)))

    def keyword_rule(inputs, options=None):
        from cozo_spark.operators.text import keyword_topk

        o = dict(options or {})
        return keyword_topk(_doc_frame(inputs[0]), k=int(o.get("k", 3)))

    def html_strip_rule(inputs, options=None):
        from cozo_spark.operators.text import html_strip

        c = inputs[0].columns
        d = inputs[0].select(F.col(c[0]).alias("doc_id"),
                             F.col(c[1]).alias("html"))
        return html_strip(d)

    def url_dedup_rule(inputs, options=None):
        from cozo_spark.operators.text import url_dedup_groups

        c = inputs[0].columns
        d = inputs[0].select(F.col(c[0]).alias("doc_id"),
                             F.col(c[1]).alias("url"))
        return url_dedup_groups(d)

    register_fixed_rule("HtmlStrip", html_strip_rule)
    register_fixed_rule("UrlDedup", url_dedup_rule)
    register_fixed_rule("MinHashPairs", minhash_pairs)
    register_fixed_rule("DedupClusters", dedup_clusters_rule)
    register_fixed_rule("NgramContamination", contamination_rule)
    register_fixed_rule("PackSequences", pack_rule)
    register_fixed_rule("QualityScores", quality_rule)
    register_fixed_rule("LanguageId", langid_rule)
    register_fixed_rule("PiiRedact", pii_rule)
    register_fixed_rule("RepetitionSignals", repetition_rule)
    register_fixed_rule("BalancedSample", balanced_sample_rule)
    register_fixed_rule("KeywordTopK", keyword_rule)

    # --- round-5 operators as UDTFs ------------------------------------
    #     spans[] <~ SubstringDedup(*docs[], k: 8)
    #     near[]  <~ PqCodeDedup(*embeds[], m: 4, k_codes: 8)
    #     pit[]   <~ AsofJoin(left[], right[])      # (key, ts, payload...)
    #     rj[]    <~ RangeJoin(vals[], bands[], bin_width: 100)
    #     meta[]  <~ ProbeMedia(*media[])           # (id, type, content)
    #     fr[]    <~ SampleFrames(*media[], every_ms: 1000)

    def substring_dedup_rule(inputs, options=None):
        from cozo_spark.operators.dedup import substring_dup_spans

        o = dict(options or {})
        return substring_dup_spans(_doc_frame(inputs[0]),
                                   k=int(o.get("k", 8)))

    def pq_code_dedup_rule(inputs, options=None):
        from cozo_spark.operators.similarity import pq_build

        o = dict(options or {})
        c = inputs[0].columns
        emb = inputs[0].select(F.col(c[0]).alias("vec_id"),
                               F.col(c[1]).alias("embedding"))
        _, codes = pq_build(emb, m=int(o.get("m", 4)),
                            k_codes=int(o.get("k_codes", 8)))
        sig = codes.select(
            "vec_id",
            F.array_join(F.transform("codes",
                                     lambda x: x.cast("string")), ",")
            .alias("pq_sig"))
        return (sig.groupBy("pq_sig")
                .agg(F.count(F.lit(1)).alias("cluster_size"),
                     F.min("vec_id").alias("keeper_id"))
                .filter("cluster_size > 1"))

    def asof_join_rule(inputs, options=None):
        from cozo_spark.operators.asof import asof_join

        o = dict(options or {})
        lc, rc = inputs[0].columns, inputs[1].columns
        if len(lc) < 2 or len(rc) < 2:
            raise ValueError("AsofJoin inputs need (key, ts, ...) columns")
        left = inputs[0].select(F.col(lc[0]).alias("k"),
                                F.col(lc[1]).alias("ts"), *lc[2:])
        right = inputs[1].select(F.col(rc[0]).alias("k"),
                                 F.col(rc[1]).alias("ts"), *rc[2:])
        tol = o.get("tolerance")
        return asof_join(left, right, by="k",
                         strict=bool(o.get("strict", False)),
                         tolerance=float(tol) if tol is not None else None)

    def range_join_rule(inputs, options=None):
        from cozo_spark.operators.rangejoin import range_join

        o = dict(options or {})
        vc, ic = inputs[0].columns, inputs[1].columns
        vals = inputs[0].select(F.col(vc[0]).alias("value"), *vc[1:])
        if len(ic) < 3:
            raise ValueError("RangeJoin intervals need (id, lo, hi)")
        ivs = inputs[1].select(F.col(ic[0]).alias("interval_id"),
                               F.col(ic[1]).alias("lo"),
                               F.col(ic[2]).alias("hi"))
        return range_join(vals, ivs, "value",
                          bin_width=float(o.get("bin_width", 1.0)))

    def _media_frame(df: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        c = df.columns
        if len(c) < 3:
            raise ValueError(
                "expected a (media_id, media_type, content[, meta]) input")
        meta_t = T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("sample_rate", T.IntegerType())])
        meta = (F.col(c[3]) if len(c) > 3
                else F.lit(None).cast(meta_t))
        return df.select(F.col(c[0]).alias("media_id"),
                         F.col(c[1]).alias("media_type"),
                         F.col(c[2]).alias("content"), meta.alias("meta"))

    def probe_media_rule(inputs, options=None):
        from cozo_spark.operators.multimodal import probe_media

        return probe_media(_media_frame(inputs[0]))

    def sample_frames_rule(inputs, options=None):
        from cozo_spark.operators.multimodal import sample_frames

        o = dict(options or {})
        return sample_frames(_media_frame(inputs[0]),
                             every_ms=int(o.get("every_ms", 1000)),
                             decode=bool(o.get("decode", False)))

    register_fixed_rule("SubstringDedup", substring_dedup_rule)
    register_fixed_rule("PqCodeDedup", pq_code_dedup_rule)
    register_fixed_rule("AsofJoin", asof_join_rule)
    register_fixed_rule("RangeJoin", range_join_rule)
    register_fixed_rule("ProbeMedia", probe_media_rule)
    register_fixed_rule("SampleFrames", sample_frames_rule)


_register_builtins()

# names registered at import time are builtins and cannot be unregistered
_BUILTIN_RULES = frozenset(_REGISTRY)
