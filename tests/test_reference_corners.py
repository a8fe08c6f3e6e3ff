"""Semantic-corner parity with the reference's runtime test suite
(cozo-core/src/runtime/tests.rs) — the behaviors most likely to silently
diverge in a re-implementation: empty aggregations, wildcard non-unification,
strict fixed-rule binding checks, column defaults, mutation arity errors."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def db(spark):
    from cozo_spark.datalog.engine import CozoDb

    return CozoDb(spark)


def rows(res):
    return sorted(tuple(r) for r in res.rows)


def test_normal_aggr_empty(db):
    # tests.rs:54-59: count over the empty stream is one row [0]
    r = db.run_script("?[count(a)] := a in []")
    assert [list(x) for x in r.rows] == [[0]]


def test_meet_aggr_empty(db):
    # tests.rs:61-72: meet aggregation over empty input is NULL; mixed with
    # a normal aggregation both appear in one row
    r = db.run_script("?[min(a)] := a in []")
    assert [list(x) for x in r.rows] == [[None]]
    r2 = db.run_script("?[min(a), count(a)] := a in []")
    assert [list(x) for x in r2.rows] == [[None, 0]]


def test_layers_multi_clause_aggregation(db):
    # tests.rs:74-91: an aggregation rule with two clauses aggregates the
    # union multiset of BOTH clauses' match streams
    r = db.run_script("""
    y[a] := a in [1,2,3]
    x[sum(a)] := y[a]
    x[sum(a)] := a in [4,5,6]
    ?[sum(a)] := x[a]
    """)
    assert float(r.rows[0][0]) == 21.0


def test_classical_grandparent(db):
    # tests.rs:123-141
    r = db.run_script("""
    parent[] <- [['joseph', 'jakob'], ['jakob', 'isaac'], ['isaac', 'abraham']]
    grandparent[gcld, gp] := parent[gcld, p], parent[p, gp]
    ?[who] := grandparent[who, 'abraham']
    """)
    assert rows(r) == [("jakob",)]


def test_do_not_unify_underscore(db):
    # tests.rs:210-244: every `_` occurrence is an independent wildcard
    r = db.run_script("""
    r1[] <- [[1, 'a'], [2, 'b']]
    r2[] <- [[2, 'B'], [3, 'C']]
    ?[l1, l2] := r1[_ , l1], r2[_ , l2]
    """)
    assert len(r.rows) == 4

    from cozo_spark.datalog.translate import QueryError
    with pytest.raises(QueryError, match="_"):
        db.run_script("?[_] := _ = 1")

    r2 = db.run_script("?[x] := x = 1, _ = 1, _ = 2")
    assert [list(x) for x in r2.rows] == [[1]]


def test_wildcard_multi_unification_keeps_multiplicity(db):
    # `_ in [..]` iterates (multiset semantics feed aggregations) but binds
    # nothing
    r = db.run_script("?[count(x)] := x = 1, _ in [1,2,3]")
    assert [list(x) for x in r.rows] == [[3]]


def test_strict_checks_for_fixed_rule_args(db):
    # tests.rs:179-208: repeated wildcards fine, repeated NAMED vars error
    r = db.run_script("r[] <- [[1, 2]]\n?[] <~ PageRank(r[_, _])")
    assert len(r.rows) == 2
    r2 = db.run_script("r[] <- [[1, 2]]\n?[] <~ PageRank(r[a, b])")
    assert len(r2.rows) == 2

    from cozo_spark.datalog.translate import QueryError
    with pytest.raises(QueryError, match="duplicate binding"):
        db.run_script("r[] <- [[1, 2]]\n?[] <~ PageRank(r[a, a])")


def test_default_columns(db):
    # tests.rs:143-161: a `default now()` key column is filled at :put time
    db.run_script(
        ":create statusd {uid: String, ts default now() => quitted: Bool, mood: String}")
    db.run_script(
        "?[uid, quitted, mood] <- [['z', true, 'x']] :put statusd {uid => quitted, mood}")
    r = db.run_script("?[uid, quitted, mood] := *statusd{uid, quitted, mood}")
    assert rows(r) == [("z", True, "x")]
    r2 = db.run_script("?[uid] := *statusd{uid, ts}, !is_null(ts)")
    assert rows(r2) == [("z",)]


def test_rm_does_not_need_all_keys_put_does(db):
    # tests.rs:163-177
    from cozo_spark.datalog.translate import QueryError

    db.run_script(":create statusr {uid => mood}")
    db.run_script("?[uid, mood] <- [[1, 2]] :put statusr {uid => mood}")
    with pytest.raises((QueryError, Exception)):
        db.run_script("?[uid, mood] <- [[2]] :put statusr {uid}")
    db.run_script("?[uid, mood] <- [[3, 2]] :rm statusr {uid => mood}")
    db.run_script("?[uid] <- [[1]] :rm statusr {uid}")
    r = db.run_script("?[uid, mood] := *statusr[uid, mood]")
    assert r.rows == []


def test_const_rule_arity_is_checked(db):
    from cozo_spark.datalog.translate import QueryError

    with pytest.raises(QueryError, match="arity"):
        db.run_script("?[a, b] <- [[1]]")
    with pytest.raises(QueryError, match="arity"):
        db.run_script("?[a] <- [[1], [2, 3]]")


def test_empty_head_keeps_rule_columns(db):
    # `?[] <~ Rule(...)` / `?[] <- ...`: all output columns pass through
    r = db.run_script("?[] <- [[1, 'x']]")
    assert [list(x) for x in r.rows] == [[1, "x"]]


def test_limit_offset_row_counts(db):
    # tests.rs:29-52 asserts exact rows from its BTree storage order; an
    # unordered :limit in our engine guarantees COUNT, not which rows
    assert len(db.run_script("?[a] := a in [5,3,1,2,4] :limit 2").rows) == 2
    assert len(db.run_script("?[a] := a in [5,3,1,2,4] :limit 2 :offset 4").rows) == 1
    assert len(db.run_script("?[a] := a in [5,3,1,2,4] :limit 2 :offset 5").rows) == 0


def test_conditions_named_access(db):
    # tests.rs:93-121
    db.run_script("?[code] <- [['a'],['b'],['c']] :create airportc {code}")
    db.run_script(
        "?[fr, to, dist] <- [['a', 'b', 1.1], ['a', 'c', 0.5], ['b', 'c', 9.1]] "
        ":create routec {fr, to => dist}")
    r = db.run_script("""
    r[code, dist] := *airportc{code}, *routec{fr: code, dist}
    ?[dist] := r['a', dist], dist > 0.5, dist <= 1.1
    """)
    assert [list(x) for x in r.rows] == [[1.1]]


def test_returning_mutations(db):
    # tests.rs:1219-1271: :returning reports per-row outcomes with the OLD
    # rows for collisions — put → inserted/replaced, rm → requested/deleted
    db.run_script(":create reta {x => y}")
    db.run_script("?[x, y] <- [[1, 2]] :insert reta {x => y}")
    r = db.run_script("?[x, y] <- [[1, 3], [2, 4]] :returning :put reta {x => y}")
    assert r.headers == ["_kind", "x", "y"]
    assert sorted([list(x) for x in r.rows]) == [
        ["inserted", 1, 3], ["inserted", 2, 4], ["replaced", 1, 2]]
    r2 = db.run_script("?[x] <- [[1], [4]] :returning :rm reta {x}")
    assert sorted([list(x) for x in r2.rows], key=str) == [
        ["deleted", 1, 3], ["requested", 1, None], ["requested", 4, None]]
    # :returning composes with a default-filled key column
    db.run_script(
        ":create rett {id: Uuid default rand_uuid_v4() => label: String, done: Bool}")
    r3 = db.run_script(
        "?[label, done] <- [['milk', false]] :put rett {label, done} :returning")
    assert r3.headers == ["_kind", "id", "label", "done"]
    assert len(r3.rows[0]) == 4 and r3.rows[0][0] == "inserted"


def test_parser_corner_cases(db):
    # tests.rs:1273-1283: keyword-prefixed rule names must not lex as
    # keywords (orx / inx / noto), `or` as expression connective
    assert rows(db.run_script("?[x] := x = 1 or x = 2")) == [(1,), (2,)]
    assert rows(db.run_script("?[C] := C = 1  orx[C] := C = 1")) == [(1,)]
    assert rows(db.run_script("?[C] := C = true, C  inx[C] := C = 1")) == [(True,)]
    assert len(db.run_script("?[k] := k in int_range(300)").rows) == 300
    assert rows(db.run_script(
        "ywcc[a] <- [[1]] noto[A] := ywcc[A] ?[A] := noto[A]")) == [(1,)]


def test_vec_types(db):
    # tests.rs:671-699
    db.run_script(":create vta {k: String => v: <F32; 8>}")
    db.run_script("?[k, v] <- [['k', [1,2,3,4,5,6,7,8]]] :put vta {k => v}")
    r = db.run_script("?[k, v] := *vta{k, v}")
    assert list(r.rows[0][1]) == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    r2 = db.run_script("?[v] <- [[vec([1,2,3,4,5,6,7,8])]]")
    assert len(r2.rows[0][0]) == 8
    r3 = db.run_script("?[v] <- [[rand_vec(5)]]")
    assert len(r3.rows[0][0]) == 5
    r4 = db.run_script("""
    val[v] <- [[vec([1,2,3,4,5,6,7,8])]]
    ?[x,y,z] := val[v], x=l2_dist(v, v), y=cos_dist(v, v),
                nv = l2_normalize(v), z=ip_dist(nv, nv)
    """)
    x, y, z = r4.rows[0]
    assert x == 0.0 and abs(y) < 1e-9 and abs(z) < 1e-9


def test_put_shorthand_and_param_shorthand(db):
    # tests.rs short_hand + param_shorthand
    db.run_script(":create shc {x => y, z}")
    db.run_script("?[x, y, z] <- [[1, 2, 3]] :put shc {}")
    assert rows(db.run_script("?[x, y, z] := *shc {x, y, z}")) == [(1, 2, 3)]

    db.run_script("?[] <- [[$x, $y, $z]] :create pxc {}",
                  params={"x": 1, "y": 2, "z": 3})
    assert rows(db.run_script("?[x, y, z] := *pxc {x, y, z}")) == [(1, 2, 3)]


def test_grouped_blocks_run_sequentially(db):
    # tests.rs test_conditions opener: `{q1} {q2}` in one call
    r = db.run_script("{?[code] <- [['a']] :create gblk {code}} {?[c] := *gblk[c]}")
    assert rows(r) == [("a",)]


def test_crashy_imperative_temp_create(db):
    # tests.rs:1518-1534 verbatim: truthiness is rows-non-empty
    # (imperative.rs:64), so the `x = z >= 10` condition always yields one
    # row ([false] included) and %return fires on the first iteration —
    # the reference test only asserts no crash
    r = db.run_script("""
    {:create _ctest {a}}
    %loop
        %if { len[count(x)] := *_ctest[x]; ?[x] := len[z], x = z >= 10 }
            %then %return _ctest
        %end
        { ?[a] := a = rand_uuid_v1(); :put _ctest {a} }
    %end
    """)
    assert len(r.rows) == 0


def test_imperative_count_guarded_loop(db):
    # the emptiness-based way to guard a loop on a count: filter in the body
    r = db.run_script("""
    {:create _ctest2 {a}}
    %loop
        %if { len[count(x)] := *_ctest2[x]; ?[z] := len[z], z >= 10 }
            %then %return _ctest2
        %end
        { ?[a] := a = rand_uuid_v1(); :put _ctest2 {a} }
    %end
    """)
    assert len(r.rows) == 10


def test_as_store_in_imperative_script(db):
    # tests.rs:1285-1341
    r = db.run_script("""
    { ?[x, y, z] <- [[1, 2, 3], [4, 5, 6]] } as _store
    { ?[x, y, z] := *_store{x, y, z} }
    """)
    assert rows(r) == [(1, 2, 3), (4, 5, 6)]

    # :returning result is bindable; _kind column filters by outcome
    r2 = db.run_script("""
    {
        ?[y] <- [[1], [2], [3]]
        :create asret {x default rand_uuid_v1() => y}
        :returning
    } as _last
    {
        ?[x] := *_last{_kind: 'inserted', x}
    }
    """)
    assert len(r2.rows) == 3

    # duplicate head vars are rejected at the `as` store (imperative.rs:352)
    from cozo_spark.datalog.translate import QueryError
    with pytest.raises(QueryError, match="Duplicate variable name"):
        db.run_script("{ ?[x, x] := x = 1 } as _dup")

    # aggregate headers sanitize sum(y) -> sum_y
    r3 = db.run_script("""
    {
        x[y] <- [[1], [2], [3]]
        ?[sum(y)] := x[y]
    } as _agg
    { ?[sum_y] := *_agg{sum_y} }
    """)
    assert len(r3.rows) == 1 and float(r3.rows[0][0]) == 6.0


def test_update_semantics(db):
    # tests.rs update_shall_not_destroy_values / update_shall_work
    db.run_script("?[x, y] <- [[1, 2]] :create zupd {x => y default 0}")
    db.run_script("?[x] <- [[1]] :update zupd {x}")
    assert rows(db.run_script("?[x, y] := *zupd {x, y}")) == [(1, 2)]

    db.run_script("?[x, y, z] <- [[1, 2, 3]] :create zupd2 {x => y, z}")
    db.run_script("?[x, y] <- [[1, 4]] :update zupd2 {x, y}")
    assert rows(db.run_script("?[x, y, z] := *zupd2 {x, y, z}")) == [(1, 4, 3)]


def test_create_fills_missing_default_columns(db):
    # name-based :create alignment — query binds a subset of the schema
    db.run_script("?[y] <- [[7]] :create cdef {x default 42 => y}")
    assert rows(db.run_script("?[x, y] := *cdef {x, y}")) == [(42, 7)]


def test_bad_parse_rejected(db):
    from cozo_spark.datalog.parser import ParseError

    with pytest.raises(ParseError):
        db.run_script("?[hero] :=")


def test_regular_index_readable_as_relation(db):
    # tests.rs:455-516: ::index create validates columns; the index is a
    # readable stored relation (given cols + remaining keys), listed by
    # ::relations with kind 'index' and introspectable via ::columns
    from cozo_spark.datalog.translate import QueryError

    db.run_script(":create friendsx {fr: Int, to: Int => data: Int}")
    db.run_script("?[fr, to, data] <- [[1,2,3],[4,5,6]] :put friendsx {fr, to, data}")
    with pytest.raises(QueryError, match="no column"):
        db.run_script("::index create friendsx:rev {to, no}")
    db.run_script("::index create friendsx:rev {to, data}")
    db.run_script("?[fr, to, data] <- [[1,2,5],[6,5,7]] :put friendsx {fr, to => data}")
    db.run_script("?[fr, to] <- [[4,5]] :rm friendsx {fr, to}")

    r = db.run_script("?[fr, data] := *friendsx:rev{to: 2, fr, data}")
    assert [list(x) for x in r.rows] == [[1, 5]]
    r2 = db.run_script("?[to, data, fr] := *friendsx:rev[to, data, fr]")
    assert rows(r2) == [(2, 5, 1), (5, 7, 6)]

    rels = {row[0]: tuple(row[1:]) for row in db.run_script("::relations").rows}
    assert rels["friendsx:rev"] == (3, 0, "index")
    cols = [row[0] for row in db.run_script("::columns friendsx:rev").rows]
    assert cols == ["to", "data", "fr"]
    db.run_script("::index drop friendsx:rev")
    assert db.run_script("?[x] := x = 1").rows  # engine still healthy


def test_filtering_constant_bindings(db):
    # tests.rs:914-947: a constant binding in a named atom plus a
    # contradictory filter on the same variable yields zero rows
    r = db.run_script("""
    {
        ?[x, y] <- [[1, 2]]
        :create _frel {x => y}
        :returning
    }
    {
        ?[x, y] := x = 1, *_frel{x, y: 3}, y = 2
    }
    """)
    assert r.rows == []


def test_lsh_index_lifecycle(db):
    # tests.rs test_lsh_indexing4: rm'd rows disappear from the LSH index
    # (artifact invalidation on mutation); bare-identifier options parse
    db.run_script(":create lrel {k: String => v: String}")
    db.run_script("::lsh create lrel:lsh {extractor: v, tokenizer: NGram, "
                  "n_gram: 3, target_threshold: 0.5}")
    db.run_script("?[k, v] <- [['a', 'ewiygfspeoighjsfcfxzdfncalsdf']] :put lrel {k => v}")
    db.run_script("?[k] <- [['a']] :rm lrel {k}")
    r = db.run_script("?[k] := ~lrel:lsh{k | query: 'ewiygfspeoighjsfcfxzdfncalsdf', k: 1}")
    assert r.rows == []


def test_lsh_extract_filter(db):
    # rows failing extract_filter are not indexed (reference lsh option)
    db.run_script(":create lef {k: String => v: String, dup_for: String?}")
    db.run_script("::lsh create lef:lsh {extractor: v, extract_filter: is_null(dup_for), "
                  "n_gram: 1, target_threshold: 0.1}")
    db.run_script("?[k, v, dup_for] <- [['a', 'common text here', null], "
                  "['b', 'common text here', 'a']] :put lef {k, v, dup_for}")
    r = db.run_script("?[k] := ~lef:lsh{k | query: 'common text here', k: 10}")
    assert [list(x) for x in r.rows] == [["a"]]  # 'b' filtered out of index


def test_hnsw_complex_schema_and_multifield_search(db):
    # tests.rs hnsw_index: complex :create with defaults (Validity, tuple
    # arrays), multi-field HNSW where EVERY field is a point, var-named
    # bind_* options, rand_uuid/rand_vec in const rules
    db.run_script("""
    :create beliefsx {
        belief_id: Uuid, character_id: Uuid, belief: String,
        last_accessed_at: Validity default [floor(now()), true],
        =>
        details: String default "", parent_belief_id: Uuid? default null,
        valence: Float default 0,
        aspects: [(String, Float, String, String)] default [],
        belief_embedding: <F32; 16>, details_embedding: <F32; 16>,
    }
    """)
    db.run_script("""
    ::hnsw create beliefsx:embedding_space {
        dim: 16, m: 50, dtype: F32,
        fields: [belief_embedding, details_embedding],
        distance: Cosine, ef_construction: 20,
        extend_candidates: false, keep_pruned_connections: false,
    }
    """)
    db.run_script("""
    ?[belief_id, character_id, belief, belief_embedding, details_embedding] <-
      [[rand_uuid_v1(), rand_uuid_v1(), "test", rand_vec(16), rand_vec(16)]]
    :put beliefsx {}
    """)
    r = db.run_script("""
    ?[belief, valence, dist, character_id, vector] := ~beliefsx:embedding_space{ belief, valence, character_id |
        query: rand_vec(16), k: 100, ef: 20, radius: 2.0,
        bind_distance: dist, bind_vector: vector }
    :order -valence
    :order dist
    """)
    # one row with two indexed fields → up to 2 points within radius 2
    assert 1 <= len(r.rows) <= 2
    assert r.headers == ["belief", "valence", "dist", "character_id", "vector"]
    assert all(len(row[4]) == 16 for row in r.rows)


def test_insert_delete_strictness(db):
    # tests.rs insertion/deletion: :insert errors on key conflict; :delete
    # errors on a missing key while :rm is lenient
    from cozo_spark.datalog.translate import QueryError

    db.run_script(":create sdel {x => y}")
    db.run_script("?[x, y] <- [[1, 2]] :insert sdel {x => y}")
    with pytest.raises(QueryError, match="conflict"):
        db.run_script("?[x, y] <- [[1, 3]] :insert sdel {x => y}")
    with pytest.raises(QueryError, match="not present"):
        db.run_script("?[x] <- [[9]] :delete sdel {x}")
    db.run_script("?[x] <- [[9]] :rm sdel {x}")  # lenient
    db.run_script("?[x] <- [[1]] :delete sdel {x}")
    assert db.run_script("?[x, y] := *sdel[x, y]").rows == []


def test_ensure_not_with_ignore_error(db):
    # tests.rs ensure_not — %ignore_error wraps both the create and the probe
    db.run_script("""
    %ignore_error { :create id_alloc {id: Int => next_id: Int, last_id: Int}}
    %ignore_error {
        ?[id, next_id, last_id] <- [[0, 1, 1000]];
        :ensure_not id_alloc {id => next_id, last_id}
    }
    """)


def test_fts_create_drop(db):
    # tests.rs fts_drop
    db.run_script(":create entityf {name}")
    db.run_script("::fts create entityf:fts_index { extractor: name, "
                  "tokenizer: Simple, filters: [Lowercase] }")
    db.run_script("::fts drop entityf:fts_index")
    assert not any(r[0] == "fts_index"
                   for r in db.run_script("::indices entityf").rows)


def test_into_payload_roundtrip(db):
    # tests.rs into_payload: NamedRows → (script, params) re-applying the
    # rows as a mutation against (possibly renamed) relations
    db.run_script(":create ipa {x => y}")
    db.run_script("?[x, y] <- [[1, 2], [3, 4]] :insert ipa {x => y}")
    res = db.run_script("?[x, y] := *ipa[x, y]")
    assert len(res.rows) == 2

    script, params = res.into_payload("ipa", "rm")
    db.run_script(script, params)
    assert db.run_script("?[x, y] := *ipa[x, y]").rows == []

    db.run_script(":create ipb {m => n}")
    res.headers = ["m", "n"]
    script, params = res.into_payload("ipb", "put")
    db.run_script(script, params)
    assert len(db.run_script("?[m, n] := *ipb[m, n]").rows) == 2


def test_sysop_in_imperatives(db):
    # tests.rs:1369-1410 verbatim shape: grouped blocks carrying :create
    # with typed/nullable/default columns, a vec column, then ::hnsw and
    # ::lsh create with full option sets, then ::relations — one script
    r = db.run_script("""
    {
            :create cm_src {
                aid: String =>
                title: String,
                author: String?,
                kind: String,
                url: String,
                domain: String?,
                pub_time: Float?,
                dt: Float default now(),
                weight: Float default 1,
            }
        }
        {
            :create cm_txt {
                tid: String =>
                aid: String,
                tag: String,
                follows_tid: String?,
                dup_for: String?,
                text: String,
                info_amount: Int,
            }
        }
        {
            :create cm_seg {
                sid: String =>
                tid: String,
                tag: String,
                part: Int,
                text: String,
                vec: <F32; 64>,
            }
        }
        {
            ::hnsw create cm_seg:vec {
                dim: 64,
                m: 50,
                dtype: F32,
                fields: vec,
                distance: Cosine,
                ef: 100,
            }
        }
        {
            ::lsh create cm_txt:lsh {
                extractor: text,
                extract_filter: is_null(dup_for),
                tokenizer: NGram,
                n_perm: 200,
                target_threshold: 0.5,
                n_gram: 7,
            }
        }
        {::relations}
    """)
    names = {row[0] for row in r.rows}
    assert {"cm_src", "cm_txt", "cm_seg"} <= names


def test_json_object_literals(db):
    # tests.rs test_json_objects: single-line and multi-line object literals
    r = db.run_script("?[a] := a = {'a': 1}")
    assert len(r.rows) == 1
    r2 = db.run_script("""?[a] := a = {
            'a': 1
        }""")
    assert len(r2.rows) == 1


def test_magic_adornment_strange_case(db):
    # query/magic.rs:643 strange_case — repeated head var y[A, A] plus a
    # wildcard consumer, with magic rewrite disabled
    r = db.run_script("""
    x[A] := A = 1
    y[A, A] := A = 1
    y[A, B] := A = 0, B = 1, x[B]
    ?[C] := y[A, _], y[C, A]
    :disable_magic_rewrite true
    """)
    assert rows(r) == [(0,), (1,)]


def test_stratify_dependencies(db):
    # query/stratify.rs:316 test_dependencies — recursion feeding two layers
    # of aggregation rules plus a two-clause entry over different strata
    r = db.run_script("""
    x[a] <- [[1], [2]]
    w[a] := a in [2]
    w[a] := w[b], a = b + 1, a < 10
    y[count(a)] := x[a]
    y[count(a)] := w[a]
    z[count(a)] := y[a]
    z[count(a)] := y[b], a = b + 1
    ?[a] := z[a]
    ?[a] := w[a]
    """)
    assert rows(r) == [(i,) for i in range(2, 10)]


def test_update_returning_aligns_by_name(db):
    # :update rel {k => b} on {k => a, b}: the returned row must put b's
    # value under b and NULL under the unmentioned a — not positional pad
    db.run_script(":create upret {k: Int => a: Int, b: String}")
    db.run_script("?[k, a, b] <- [[1, 5, 'old']] :put upret {k => a, b}")
    r = db.run_script("?[k, b] <- [[1, 'new']] :update upret {k => b} :returning")
    assert r.headers == ["_kind", "k", "a", "b"]
    ins = [row for row in r.rows if row[0] == "inserted"]
    assert ins == [["inserted", 1, None, "new"]]
    # stored state keeps a=5
    assert db.run_script("?[a, b] := *upret[1, a, b]").rows == [[5, "new"]]


def test_rm_returning_aligns_spec_order(db):
    # spec lists columns in non-relation order; requested rows must place
    # values at their NAMED positions
    db.run_script(":create rmret {k: Int => v: String}")
    db.run_script("?[k, v] <- [[1, 'x']] :put rmret {k => v}")
    r = db.run_script("?[v, k] <- [['x', 1]] :rm rmret {v, k} :returning")
    req = [row for row in r.rows if row[0] == "requested"]
    assert req == [["requested", 1, "x"]]


def test_replace_in_trigger_rejected_even_for_new_relation(db):
    # stored.rs:59-67: the in-trigger bail precedes the target lookup
    from cozo_spark.datalog.translate import QueryError

    db.run_script(":create rit {k: Int}")
    db.run_script("::set_triggers rit on put { ?[k] <- [[1]] :replace rit_new {k} }")
    with pytest.raises(QueryError, match="replace op in trigger"):
        db.run_script("?[k] <- [[9]] :put rit {k}")
    db.run_script("::set_triggers rit")  # clear


def test_replace_trigger_cannot_replace(db):
    # a replace trigger that itself :replaces must error, not recurse
    from cozo_spark.datalog.translate import QueryError

    db.run_script("?[k] <- [[1]] :create rpt {k}")
    db.run_script(
        "::set_triggers rpt on replace { ?[k] <- [[2]] :replace rpt {k} }")
    with pytest.raises(QueryError, match="replace op in trigger"):
        db.run_script("?[k] <- [[3]] :replace rpt {k}")


def test_temp_create_adopts_first_put_schema(db):
    # `:create _t {a}` has unknown column types; the first :put must adopt
    # the incoming numeric type, not coerce through a String placeholder
    db.run_script("{:create _tnum {a}} {?[a] <- [[1]] :put _tnum {a}}")
    r = db.run_script("?[y] := *_tnum[x], y = x + 1")
    assert r.rows == [[2]]  # stays Int; string coercion would give 2.0


def test_duplicate_entry_head_vars(db):
    # `?[a, a]` is legal in the reference (positional tuples); both columns
    # carry the value and :sort still resolves
    r = db.run_script("?[a, a] := a in [2, 1] :sort a")
    assert [list(x) for x in r.rows] == [[1, 1], [2, 2]]


def test_as_binding_with_all_null_column(db):
    # a bound result whose column is entirely NULL must not crash schema
    # inference in the `as` store
    r = db.run_script("""
    { ?[x, y] <- [[1, null], [2, null]] } as _nul
    { ?[x] := *_nul{x, y}, is_null(y) }
    """)
    assert sorted(r.rows) == [[1], [2]]


def test_temp_relation_keyed_upsert_and_rm(db):
    # temp stores declared with `=>` are KEYED: :put upserts per key and
    # :rm removes by key, exactly like stored relations (the reference's
    # temp relations share the RelationHandle machinery)
    db.run_script("""
    {:create _kt {k => v}}
    {?[k, v] <- [[1, 10], [2, 20]] :put _kt {k => v}}
    {?[k, v] <- [[1, 11]] :put _kt {k => v}}
    """)
    r = db.run_script("?[k, v] := *_kt[k, v]")
    assert rows(r) == [(1, 11), (2, 20)]
    db.run_script("{?[k] <- [[2]] :rm _kt {k}}")
    r2 = db.run_script("?[k, v] := *_kt[k, v]")
    assert rows(r2) == [(1, 11)]
