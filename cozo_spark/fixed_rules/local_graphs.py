"""Driver-side graph algorithms for rules that don't fan out.

The reference implements ALL of its graph algorithms single-node
(cozo-core/src/fixed_rule/algos/*.rs, rayon at best); for the algorithms
whose control structure is inherently sequential (priority-queue Dijkstra
with path reconstruction, Yen's k-shortest, A*, DFS preorder, MST, Louvain,
Brandes betweenness) we do the same: collect the edge list to the driver
under a size guard and run a tight Python implementation, returning the
result as a DataFrame. Parity with the reference is exact; the distributed
versions in ``graphs.py`` cover the fan-out cases (PageRank, CC, LPA,
BFS/SSSP distances, degree, triangles) that matter at 100 TB.

Size guard: collecting >_MAX_DRIVER_EDGES edges raises — at that scale use
the distributed variant instead.
"""

from __future__ import annotations

import heapq
from collections import defaultdict

from pyspark.sql import DataFrame
from cozo_spark.plans.local import local_frame

_MAX_DRIVER_EDGES = 5_000_000


def _collect_edges(edges: DataFrame, weighted: bool = False):
    cols = edges.columns
    if len(cols) < 2:
        raise ValueError("Edge relation requires tuples of length at least two")
    take = 3 if weighted and len(cols) > 2 else 2
    rows = edges.select(*cols[:take]).limit(_MAX_DRIVER_EDGES + 1).collect()
    if len(rows) > _MAX_DRIVER_EDGES:
        raise ValueError(
            f"edge list exceeds driver-side guard ({_MAX_DRIVER_EDGES}); "
            "use the distributed variant")
    if take == 3:
        return [(r[0], r[1], float(r[2])) for r in rows]
    return [(r[0], r[1], 1.0) for r in rows]


def _adj(edge_list, undirected=False):
    adj = defaultdict(list)
    for a, b, w in edge_list:
        adj[a].append((b, w))
        if undirected:
            adj[b].append((a, w))
    for k in adj:
        adj[k].sort()
    return adj


def _dijkstra(adj, start, goal=None):
    dist = {start: 0.0}
    prev = {}
    pq = [(0.0, start)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        if goal is not None and u == goal:
            break
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                prev[v] = u
                heapq.heappush(pq, (nd, v))
    return dist, prev


def _path(prev, start, end):
    out = [end]
    while out[-1] != start:
        if out[-1] not in prev:
            return None
        out.append(prev[out[-1]])
    return list(reversed(out))


# --- ShortestPathDijkstra with paths (algos/shortest_path_dijkstra.rs:432) ---

def _dijkstra_multi(adj, start):
    """Dijkstra keeping ALL optimal predecessors (for keep_ties)."""
    from collections import defaultdict as dd

    eps = 1e-12
    dist = {start: 0.0}
    preds = dd(set)
    pq = [(0.0, start)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")) + eps:
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            cur = dist.get(v, float("inf"))
            if nd < cur - eps:
                dist[v] = nd
                preds[v] = {u}
                heapq.heappush(pq, (nd, v))
            elif abs(nd - cur) <= eps:
                preds[v].add(u)
    return dist, preds


def _all_paths(preds, start, end):
    if end == start:
        return [[start]]
    out = []
    for p in sorted(preds.get(end, ()), key=str):
        for pre in _all_paths(preds, start, p):
            out.append(pre + [end])
    return out


def shortest_path_dijkstra(edges: DataFrame, starts: DataFrame, goals: DataFrame,
                           undirected: bool = False, keep_ties: bool = False) -> DataFrame:
    """(start, goal, cost, path) — exact reference output contract incl.
    ``undirected:`` and ``keep_ties:`` (one row per tied optimal path)
    options (algos/shortest_path_dijkstra.rs)."""
    el = _collect_edges(edges, weighted=True)
    adj = _adj(el, undirected)
    ss = [r[0] for r in starts.collect()]
    gs = [r[0] for r in goals.collect()]
    rows = []
    for s in ss:
        if keep_ties:
            dist, preds = _dijkstra_multi(adj, s)
            for g in gs:
                if g in dist:
                    for path in _all_paths(preds, s, g):
                        rows.append((s, g, dist[g], [str(x) for x in path]))
        else:
            dist, prev = _dijkstra(adj, s)
            for g in gs:
                if g in dist:
                    rows.append((s, g, dist[g], [str(x) for x in _path(prev, s, g)]))
    spark = edges.sparkSession
    if not rows:
        return spark.createDataFrame([], "start long, goal long, cost double, path array<string>")
    typ = "string" if isinstance(rows[0][0], str) else "long"
    return local_frame(spark, rows, f"start {typ}, goal {typ}, cost double, path array<string>")


# --- KShortestPathYen (algos/yen.rs:211) --------------------------------------

def k_shortest_path_yen(edges: DataFrame, starts: DataFrame, goals: DataFrame,
                        k: int = 3, undirected: bool = False) -> DataFrame:
    """(start, goal, cost, path): k loopless shortest paths (Yen 1971)."""
    el = _collect_edges(edges, weighted=True)
    base_adj = _adj(el, undirected)
    rows = []
    for s in [r[0] for r in starts.collect()]:
        for g in [r[0] for r in goals.collect()]:
            for cost, path in _yen(base_adj, s, g, k):
                rows.append((s, g, cost, [str(x) for x in path]))
    spark = edges.sparkSession
    if not rows:
        return spark.createDataFrame([], "start long, goal long, cost double, path array<string>")
    typ = "string" if isinstance(rows[0][0], str) else "long"
    return local_frame(spark, rows, f"start {typ}, goal {typ}, cost double, path array<string>")


def _yen(adj, s, g, k):
    dist, prev = _dijkstra(adj, s, g)
    if g not in dist:
        return []
    first = _path(prev, s, g)
    paths = [(dist[g], first)]
    candidates: list = []
    for _ in range(1, k):
        prev_cost, prev_path = paths[-1]
        for i in range(len(prev_path) - 1):
            spur = prev_path[i]
            root = prev_path[: i + 1]
            removed = set()
            for cost, p in paths:
                if p[: i + 1] == root and len(p) > i + 1:
                    removed.add((p[i], p[i + 1]))
            mod_adj = {
                u: [(v, w) for v, w in vs if (u, v) not in removed and v not in root[:-1]]
                for u, vs in adj.items()
            }
            d2, p2 = _dijkstra(mod_adj, spur, g)
            if g in d2:
                spur_path = _path(p2, spur, g)
                total = root[:-1] + spur_path
                root_cost = sum(_edge_w(adj, total[j], total[j + 1]) for j in range(i))
                cand = (root_cost + d2[g], total)
                if cand not in candidates and cand not in paths:
                    heapq.heappush(candidates, cand)
        if not candidates:
            break
        paths.append(heapq.heappop(candidates))
    return paths


def _edge_w(adj, u, v):
    for x, w in adj.get(u, ()):
        if x == v:
            return w
    return float("inf")


# --- ShortestPathAStar (algos/astar.rs:180) ------------------------------------

def shortest_path_astar(edges: DataFrame, nodes: DataFrame | None = None,
                        starting: DataFrame | None = None,
                        goals: DataFrame | None = None,
                        heuristic=None) -> DataFrame:
    """(start, goal, cost, path).

    Reference form (algos/astar.rs:37-60, air_routes.rs:266-278):
    ``ShortestPathAStar(*route[], nodes[node, ...], starting[], goals[...],
    heuristic: expr)`` — the heuristic expression sees the node relation's
    binding columns plus the goal relation's, evaluated per (node, goal).
    We compile it once over nodes × goals with the engine's expression
    compiler; A* itself is driver-side like the reference. 2-input legacy
    form: (edges, starts_goals) with an optional python callable heuristic.
    """
    el = _collect_edges(edges, weighted=True)
    adj = _adj(el)
    rows = []
    if goals is None:
        # (edges, starts_goals[, callable heuristic]) compatibility form
        starts_goals = nodes if nodes is not None else starting
        h = heuristic if callable(heuristic) else (lambda n, g: 0.0)
        pairs = [(r[0], r[1]) for r in starts_goals.collect()]
    else:
        if heuristic is None or callable(heuristic):
            h = heuristic or (lambda n, g: 0.0)
        else:
            # heuristic is an expression AST over nodes+goals binding columns
            from pyspark.sql import functions as F

            from cozo_spark.datalog.translate import _df_typer, compile_expr

            cross = nodes.crossJoin(goals)
            bound = set(cross.columns)
            hcol = compile_expr(heuristic, bound, _df_typer(cross)).cast("double")
            nid, gid = nodes.columns[0], goals.columns[0]
            table = {(r[0], r[1]): (r[2] if r[2] is not None else 0.0)
                     for r in cross.select(F.col(nid), F.col(gid), hcol).collect()}
            h = lambda n, g: table.get((n, g), 0.0)  # noqa: E731
        pairs = [(s[0], g[0]) for s in starting.collect() for g in goals.collect()]
    for s, g in pairs:
        res = _astar(adj, s, g, h)
        if res is not None:
            cost, path = res
            rows.append((s, g, cost, [str(x) for x in path]))
    spark = edges.sparkSession
    if not rows:
        return spark.createDataFrame([], "start long, goal long, cost double, path array<string>")
    typ = "string" if isinstance(rows[0][0], str) else "long"
    return local_frame(spark, rows, f"start {typ}, goal {typ}, cost double, path array<string>")


def _astar(adj, s, g, h):
    dist = {s: 0.0}
    prev = {}
    pq = [(h(s, g), s)]
    while pq:
        _, u = heapq.heappop(pq)
        if u == g:
            return dist[u], _path(prev, s, g)
        for v, w in adj.get(u, ()):
            nd = dist[u] + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                prev[v] = u
                heapq.heappush(pq, (nd + h(v, g), v))
    return None


# --- DFS (algos/dfs.rs:122) -----------------------------------------------------

def _allowed_nodes(nodes_df: DataFrame, condition):
    """Evaluate a `condition:` expression AST against the nodes relation;
    returns the set of node ids (first column) passing it. Mirrors the
    reference's per-candidate condition check (algos/dfs.rs:40-81 /
    bfs.rs:40-93) — evaluated set-at-a-time on the DataFrame instead."""
    if condition is None:
        return None
    from cozo_spark.datalog.translate import _df_typer, compile_expr

    bound = set(nodes_df.columns)
    col = compile_expr(condition, bound, _df_typer(nodes_df))
    first = nodes_df.columns[0]
    return {r[0] for r in nodes_df.filter(col).select(first).collect()}


def dfs(edges: DataFrame, nodes: DataFrame | None = None, starts: DataFrame | None = None,
        condition=None, limit: int | None = None) -> DataFrame:
    """(start, reached, path): preorder DFS, lexicographic neighbor order —
    matches the reference's deterministic iteration order. Input shapes follow
    algos/dfs.rs:33-36: (edges), (edges, starting), or
    (edges, nodes, starting); `condition:` gates which visited nodes are
    emitted (traversal continues regardless), `limit:` caps emissions."""
    el = _collect_edges(edges)
    adj = _adj(el)
    if starts is None:
        starts = nodes  # 2-input form: DFS(edges, starting)
    allowed = _allowed_nodes(nodes, condition) if nodes is not None else None
    if starts is None:
        spark = edges.sparkSession
        all_nodes = sorted({x for a, b in el for x in (a, b)})
        starts = local_frame(spark, [(n,) for n in all_nodes], ["node"])
    rows = []
    seen: set = set()  # shared across starts (algos/dfs.rs:48-53)
    done = False
    for r in starts.collect():
        s = r[0]
        if s in seen or done:
            continue
        seen.add(s)
        stack = [(s, [s])]
        while stack:
            u, path = stack.pop()
            # the reference tests the condition on every popped candidate,
            # INCLUDING the start node (algos/dfs.rs:58-81) — unlike BFS,
            # which only tests discovered neighbors (algos/bfs.rs:59-93)
            if allowed is None or u in allowed:
                rows.append((s, u, [str(x) for x in path]))
                if limit is not None and len(rows) >= limit:
                    done = True
                    break
            for v, _ in reversed(adj.get(u, ())):
                if v not in seen:
                    seen.add(v)
                    stack.append((v, path + [v]))
    spark = edges.sparkSession
    if not rows:
        return spark.createDataFrame([], "start long, reached long, path array<string>")
    typ = "string" if isinstance(rows[0][0], str) else "long"
    return local_frame(spark, rows, f"start {typ}, reached {typ}, path array<string>")


def bfs_paths(edges: DataFrame, nodes: DataFrame | None = None,
              starts: DataFrame | None = None, condition=None,
              limit: int | None = None) -> DataFrame:
    """(start, reached, path): BFS order with first-found path (algos/bfs.rs).
    Same input shapes as DFS; per the reference, the condition is tested on
    discovered neighbors only — the start node is never emitted
    (bfs.rs:59-93)."""
    from collections import deque

    el = _collect_edges(edges)
    adj = _adj(el)
    if starts is None:
        starts = nodes
    allowed = _allowed_nodes(nodes, condition) if nodes is not None else None
    if starts is None:
        spark = edges.sparkSession
        all_nodes = sorted({x for a, b in el for x in (a, b)})
        starts = local_frame(spark, [(n,) for n in all_nodes], ["node"])
    rows = []
    seen: set = set()  # shared across starts (bfs.rs:48-55)
    done = False
    for r in starts.collect():
        s = r[0]
        if s in seen or done:
            continue
        seen.add(s)
        q = deque([(s, [s])])
        while q:
            u, path = q.popleft()
            if u != s and (allowed is None or u in allowed):
                rows.append((s, u, [str(x) for x in path]))
                if limit is not None and len(rows) >= limit:
                    done = True
                    break
            for v, _ in adj.get(u, ()):
                if v not in seen:
                    seen.add(v)
                    q.append((v, path + [v]))
    spark = edges.sparkSession
    if not rows:
        return spark.createDataFrame([], "start long, reached long, path array<string>")
    typ = "string" if isinstance(rows[0][0], str) else "long"
    return local_frame(spark, rows, f"start {typ}, reached {typ}, path array<string>")


def shortest_path_bfs(edges: DataFrame, starting: DataFrame, goals: DataFrame) -> DataFrame:
    """(start, goal, path|null): unweighted shortest path per (start, goal)
    pair via BFS with backtrace — algos/shortest_path_bfs.rs:33-112 (three
    relation inputs: edges, starting nodes, ending nodes; unreachable goals
    emit a null path)."""
    from collections import deque

    el = _collect_edges(edges)
    adj = _adj(el)
    starts = [r[0] for r in starting.collect()]
    ends = [r[0] for r in goals.collect()]
    rows = []
    for s in starts:
        backtrace = {}
        seen = {s}
        pending = set(ends)
        pending.discard(s)
        q = deque([s])
        while q and pending:
            u = q.popleft()
            for v, _ in adj.get(u, ()):
                if v in seen:
                    continue
                seen.add(v)
                backtrace[v] = u
                pending.discard(v)
                q.append(v)
        for g in ends:
            if g == s:
                rows.append((s, g, [str(s)]))
            elif g in backtrace:
                path = [g]
                while path[-1] != s:
                    path.append(backtrace[path[-1]])
                path.reverse()
                rows.append((s, g, [str(x) for x in path]))
            else:
                rows.append((s, g, None))
    spark = edges.sparkSession
    if not rows:
        return spark.createDataFrame([], "start long, goal long, path array<string>")
    typ = "string" if isinstance(rows[0][0], str) else "long"
    return local_frame(spark, rows, f"start {typ}, goal {typ}, path array<string>")


# --- MST: Prim / Kruskal (algos/prim.rs, kruskal.rs) ------------------------------

def minimum_spanning_tree_prim(edges: DataFrame) -> DataFrame:
    """(from, to, weight) edges of the MST (undirected interpretation)."""
    el = _collect_edges(edges, weighted=True)
    adj = _adj(el, undirected=True)
    if not adj:
        return edges.sparkSession.createDataFrame([], "src long, dst long, weight double")
    start = min(adj)
    visited = {start}
    pq = [(w, start, v) for v, w in adj[start]]
    heapq.heapify(pq)
    rows = []
    while pq:
        w, u, v = heapq.heappop(pq)
        if v in visited:
            continue
        visited.add(v)
        rows.append((u, v, w))
        for x, w2 in adj.get(v, ()):
            if x not in visited:
                heapq.heappush(pq, (w2, v, x))
    spark = edges.sparkSession
    typ = "string" if rows and isinstance(rows[0][0], str) else "long"
    return local_frame(spark, rows, f"src {typ}, dst {typ}, weight double")


def minimum_spanning_forest_kruskal(edges: DataFrame) -> DataFrame:
    """(from, to, weight): Kruskal with union-find — handles disconnected
    graphs (forest), matching the reference's Kruskal variant."""
    el = _collect_edges(edges, weighted=True)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    rows = []
    for a, b, w in sorted(el, key=lambda t: (t[2], str(t[0]), str(t[1]))):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            rows.append((a, b, w))
    spark = edges.sparkSession
    typ = "string" if rows and isinstance(rows[0][0], str) else "long"
    return local_frame(spark, rows or [], f"src {typ}, dst {typ}, weight double")


# --- Centralities (algos/all_pairs_shortest_path.rs:176) ---------------------------

def betweenness_centrality(edges: DataFrame, undirected: bool = False) -> DataFrame:
    """(node, centrality) via Brandes' algorithm — O(V·E), documented as the
    reference's own cost profile."""
    from collections import deque

    el = _collect_edges(edges, weighted=False)
    adj = defaultdict(list)
    nodes = set()
    for a, b, _ in el:
        adj[a].append(b)
        nodes.update((a, b))
        if undirected:
            adj[b].append(a)
    cb = dict.fromkeys(nodes, 0.0)
    for s in nodes:
        stack = []
        pred = defaultdict(list)
        sigma = dict.fromkeys(nodes, 0)
        sigma[s] = 1
        d = dict.fromkeys(nodes, -1)
        d[s] = 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj.get(v, ()):
                if d[w] < 0:
                    d[w] = d[v] + 1
                    q.append(w)
                if d[w] == d[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = dict.fromkeys(nodes, 0.0)
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                cb[w] += delta[w]
        # (directed: no halving; reference reports raw counts)
    rows = sorted(cb.items(), key=lambda t: str(t[0]))
    spark = edges.sparkSession
    typ = "string" if rows and isinstance(rows[0][0], str) else "long"
    return local_frame(spark, rows, f"node {typ}, centrality double")


def closeness_centrality(edges: DataFrame, undirected: bool = False) -> DataFrame:
    """(node, centrality): 1 / mean shortest distance to reachable nodes."""
    el = _collect_edges(edges, weighted=True)
    adj = _adj(el, undirected)
    nodes = set()
    for a, b, _ in el:
        nodes.update((a, b))
    rows = []
    for n in nodes:
        dist, _ = _dijkstra(adj, n)
        others = [d for k, d in dist.items() if k != n]
        rows.append((n, (len(others) / sum(others)) if others and sum(others) > 0 else 0.0))
    rows.sort(key=lambda t: str(t[0]))
    spark = edges.sparkSession
    typ = "string" if rows and isinstance(rows[0][0], str) else "long"
    return local_frame(spark, rows, f"node {typ}, centrality double")


# --- Louvain community detection (algos/louvain.rs:318) -----------------------------

def _louvain_one_level(A: dict, m2: float, max_passes: int,
                       delta: float) -> dict:
    """One Louvain local-move phase over symmetric adjacency ``A`` (matrix
    convention: self-loops hold doubled intra-weight so k = row sum).
    Sequential deterministic node order (sorted by str), ties to the
    smaller community index like the reference's ascending scan. Returns
    node -> community label, labels renumbered to the min member (str
    order) of each community."""
    nodes = sorted(A, key=str)
    comm = {n: i for i, n in enumerate(nodes)}
    k = {n: sum(A[n].values()) for n in nodes}
    sigma_tot = defaultdict(float)
    for n in nodes:
        sigma_tot[comm[n]] += k[n]
    for _ in range(max_passes):
        moved = False
        for n in nodes:
            c0 = comm[n]
            sigma_tot[c0] -= k[n]
            neigh_w = defaultdict(float)
            for v, w in A[n].items():
                if v != n:  # self-loop weight is not a link to a neighbor
                    neigh_w[comm[v]] += w
            best_c, best_gain = c0, max(delta, 0.0)
            for c, w_in in sorted(neigh_w.items()):
                gain = w_in - sigma_tot[c] * k[n] / m2
                if gain > best_gain + 1e-12:
                    best_gain, best_c = gain, c
            comm[n] = best_c
            sigma_tot[best_c] += k[n]
            if best_c != c0:
                moved = True
        if not moved:
            break
    groups = defaultdict(list)
    for n, c in comm.items():
        groups[c].append(n)
    labels = {}
    for members in groups.values():
        label = min(members, key=str)
        for n in members:
            labels[n] = label
    return labels


def community_detection_louvain(edges: DataFrame, max_passes: int = 10,
                                max_iter: int | None = None, delta: float = 0.0001,
                                keep_depth: int | None = None,
                                max_levels: int = 5,
                                undirected: bool = False,
                                output: str = "flat") -> DataFrame:
    """(community, node): MULTI-LEVEL Louvain modularity optimization
    (deterministic node order). The reference is also single-machine here
    and is multi-level: louvain.rs:72-94 loops louvain_step (local moves +
    contraction) until the contracted graph stops shrinking or has <= 2
    nodes; we mirror that loop exactly, bounded by ``max_levels`` like the
    distributed rule so the LouvainDist size gate is semantics-preserving.
    Reference option names accepted (louvain.rs:37-40): ``max_iter``,
    ``delta`` (min modularity gain to move), ``undirected`` (we already
    symmetrize weights), ``keep_depth``.

    Two output shapes:

    - ``output="flat"`` (default for direct/Dist callers): (community,
      node) with community = the TOP-level label — the partition most
      callers want, directly comparable with the distributed rule.
    - ``output="hierarchy"`` (the REGISTERED CommunityDetectionLouvain
      rule — the reference's exact shape, louvain.rs:44-56): (labels,
      node) where labels is the per-level community list with the TOP
      level FIRST (the reference builds bottom-up then reverses) and
      ``keep_depth`` truncates to the top-k levels; an uncontractable
      graph yields an empty list exactly like louvain()'s empty
      hierarchy. Label VALUES are min original members per level
      (deterministic) rather than the reference's arbitrary renumbered
      indices — the partition at every level is identical, the numbering
      is implementation-defined in both engines.

    Contraction uses the adjacency-MATRIX convention shared with the
    distributed rule (graphs.py louvain_communities): A is symmetric, a
    contracted community's self-loop accumulates BOTH directions of each
    internal edge (doubled weight), so k = row sum and m2 = grand total
    stay invariant across levels. Community label = min original member
    (str order) — min of mins across levels, so the flat output is stable
    and comparable with the distributed rule."""
    if max_iter is not None:
        max_passes = max_iter
    el = _collect_edges(edges, weighted=True)
    A: dict = defaultdict(lambda: defaultdict(float))
    for a, b, w in el:
        if a == b:
            continue
        A[a][b] += w
        A[b][a] += w
    m2 = sum(sum(vs.values()) for vs in A.values())  # = 2m, level-invariant
    if m2 == 0:
        schema = ("labels array<long>, node long" if output == "hierarchy"
                  else "community long, node long")
        return edges.sparkSession.createDataFrame([], schema)
    assign = {n: n for n in A}  # original node -> current super-node label
    per_level: list[dict] = []  # flattened assignment after each level
    for _level in range(max(1, int(max_levels))):
        labels = _louvain_one_level(A, m2, max_passes, delta)
        if len(set(labels.values())) == len(labels):
            break  # no merge this level — converged (louvain.rs:87-89)
        assign = {n: labels[s] for n, s in assign.items()}
        per_level.append(dict(assign))
        newA: dict = defaultdict(lambda: defaultdict(float))
        for a, row in A.items():
            ca = labels[a]
            for b, w in row.items():
                newA[ca][labels[b]] += w
        A = newA
        if len(A) <= 2:
            break  # reference stops contracting at 2 nodes (louvain.rs:80)
    spark = edges.sparkSession
    if output == "hierarchy":
        nodes = sorted(assign, key=str)
        typ = "string" if nodes and isinstance(nodes[0], str) else "long"
        depth = keep_depth if keep_depth is not None else len(per_level)
        rows = [([lvl[n] for lvl in reversed(per_level)][:depth], n)
                for n in nodes]
        return spark.createDataFrame(
            rows, f"labels array<{typ}>, node {typ}")
    rows = sorted(((c, n) for n, c in assign.items()),
                  key=lambda t: (str(t[0]), str(t[1])))
    typ = "string" if rows and isinstance(rows[0][0], str) else "long"
    return local_frame(spark, rows, f"community {typ}, node {typ}")


# --- RandomWalk (algos/random_walk.rs:138) -------------------------------------------

def random_walk(edges: DataFrame, nodes: DataFrame | None = None,
                starts: DataFrame | None = None, steps: int = 10,
                iterations: int = 1, weight=None, seed: int = 42) -> DataFrame:
    """(idx, start, path): seeded random walks (deterministic via seed).

    Reference form (algos/random_walk.rs:34-120): (edges, nodes, starting)
    with ``steps:`` (required there), ``iterations:``, and an optional
    ``weight:`` expression over the node + edge binding columns, evaluated
    per candidate edge to bias sampling. The weight table is computed
    set-at-a-time (nodes ⋈ edges on the current-node id) with the engine's
    expression compiler."""
    import random

    el = _collect_edges(edges)
    adj = _adj(el)
    if starts is None:
        starts = nodes
    if starts is None:
        spark = edges.sparkSession
        all_nodes = sorted({x for a, b in el for x in (a, b)})
        starts = local_frame(spark, [(n,) for n in all_nodes], ["node"])
    wtable = None
    if weight is not None and not callable(weight) and nodes is not None:
        from pyspark.sql import functions as F

        from cozo_spark.datalog.translate import _df_typer, compile_expr

        ncols, ecols = nodes.columns, edges.columns
        j = nodes.join(edges, F.col(ncols[0]) == F.col(ecols[0]))
        wcol = compile_expr(weight, set(ncols) | set(ecols), _df_typer(j)).cast("double")
        wtable = {(r[0], r[1]): max(float(r[2]), 0.0) if r[2] is not None else 0.0
                  for r in j.select(F.col(ecols[0]), F.col(ecols[1]), wcol).collect()}
    rnd = random.Random(seed)
    rows = []
    idx = 0
    for r in starts.collect():
        s = r[0]
        for _ in range(iterations):
            path = [s]
            cur = s
            for _ in range(steps):
                nbrs = adj.get(cur, ())
                if not nbrs:
                    break
                if wtable is not None:
                    ws = [wtable.get((cur, v), 0.0) for v, _ in nbrs]
                    if sum(ws) <= 0:
                        break
                    cur = rnd.choices([v for v, _ in nbrs], weights=ws)[0]
                else:
                    cur = rnd.choice(nbrs)[0]
                path.append(cur)
            rows.append((idx, s, [str(x) for x in path]))
            idx += 1
    spark = edges.sparkSession
    if not rows:
        return spark.createDataFrame([], "idx long, start long, path array<string>")
    typ = "string" if isinstance(rows[0][1], str) else "long"
    return local_frame(spark, rows, f"idx long, start {typ}, path array<string>")
