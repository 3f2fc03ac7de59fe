"""Pure-NumPy golden oracles (FIXTURES.md F7, SURVEY.md §2.4).

These are the correctness references for the Spark plans. Each mirrors the
exact update rule of the corresponding reference app (file:line cited) but in
plain dense NumPy on small fixtures. networkx is used opportunistically when
installed (it is not required).
"""

from __future__ import annotations

import numpy as np


def _relabel(edges: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Map arbitrary int64 ids to dense 0..n-1; returns (dense_edges, ids)."""
    ids = np.unique(edges)
    dense = np.searchsorted(ids, edges)
    return dense, ids


def pagerank_standard(
    edges: np.ndarray,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
) -> dict[int, float]:
    """Standard damped PageRank: out-degree normalized, teleport, dangling
    mass redistributed uniformly. Synchronous power iteration until
    max |r' - r| <= tol. Returns {vid: rank} summing to 1."""
    dense, ids = _relabel(edges)
    n = len(ids)
    src, dst = dense[:, 0], dense[:, 1]
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.where(outdeg > 0, r / np.maximum(outdeg, 1), 0.0)
        incoming = np.bincount(dst, weights=contrib[src], minlength=n)
        dangling = r[outdeg == 0].sum()
        r_new = (1 - alpha) / n + alpha * (incoming + dangling / n)
        if np.max(np.abs(r_new - r)) <= tol:
            r = r_new
            break
        r = r_new
    return {int(ids[i]): float(r[i]) for i in range(n)}


def pagerank_personalized(
    edges: np.ndarray,
    seeds: list[int],
    alpha: float = 0.85,
    iters: int = 3,
) -> dict[int, float]:
    """Personalized PageRank (random walk with restart): teleport and
    dangling mass flow uniformly to `seeds`; r0 = the seed distribution.
    Fixed synchronous sweeps — mirrors plans/pagerank.py's personalize
    branch term-for-term."""
    dense, ids = _relabel(edges)
    n = len(ids)
    src, dst = dense[:, 0], dense[:, 1]
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    p = np.zeros(n)
    seed_set = set(seeds)
    for i in range(n):
        if int(ids[i]) in seed_set:
            p[i] = 1.0 / len(seeds)
    r = p.copy()
    for _ in range(iters):
        contrib = np.where(outdeg > 0, r / np.maximum(outdeg, 1), 0.0)
        incoming = np.bincount(dst, weights=contrib[src], minlength=n)
        dangling = r[outdeg == 0].sum()
        r = (1 - alpha) * p + alpha * (incoming + dangling * p)
    return {int(ids[i]): float(r[i]) for i in range(n)}


def pagerank_minigraph(
    edges: np.ndarray,
    gamma: float = 0.01,
    epsilon: float = 0.001,
    max_iter: int = 50,
) -> dict[int, float]:
    """The reference's literal update rule in float space (SURVEY.md §2.4):
    next(v) = gamma * mean(rank[u] for u in in(v)); update only when
    (rank[v]-next)^2 > epsilon; init rank=1
    (reference: apps/cpp/pr_vc.cpp:33-63 — we keep floats instead of the
    unsigned truncation, per the survey's resolution note). Synchronous
    Jacobi sweeps; vertices with no in-edges keep their value (the C++
    divides by zero there; we define mean over empty = no update)."""
    dense, ids = _relabel(edges)
    n = len(ids)
    src, dst = dense[:, 0], dense[:, 1]
    indeg = np.bincount(dst, minlength=n).astype(np.float64)
    r = np.ones(n, dtype=np.float64)
    for _ in range(max_iter):
        sums = np.bincount(dst, weights=r[src], minlength=n)
        nxt = np.where(indeg > 0, gamma * sums / np.maximum(indeg, 1), r)
        changed = (r - nxt) ** 2 > epsilon
        if not changed.any():
            break
        r = np.where(changed, nxt, r)
    return {int(ids[i]): float(r[i]) for i in range(n)}


def pagerank_converged_sweeps(
    edges: np.ndarray,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
) -> int:
    """Number of synchronous sweeps standard PageRank performs before the
    max|r'-r| <= tol stop fires, INCLUDING the final sweep (the engine's
    iteration counter has the same inclusive semantics). Used to derive the
    unroll depth of the to-convergence DuckDB oracle from the input itself —
    no hand-measured constants (same rule as pagerank_standard above)."""
    dense, ids = _relabel(edges)
    n = len(ids)
    src, dst = dense[:, 0], dense[:, 1]
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    for i in range(1, max_iter + 1):
        contrib = np.where(outdeg > 0, r / np.maximum(outdeg, 1), 0.0)
        incoming = np.bincount(dst, weights=contrib[src], minlength=n)
        dangling = r[outdeg == 0].sum()
        r_new = (1 - alpha) / n + alpha * (incoming + dangling / n)
        if np.max(np.abs(r_new - r)) <= tol:
            return i
        r = r_new
    raise RuntimeError(f"pagerank did not converge within {max_iter} sweeps")


def coloring_changed_rounds(edges: np.ndarray, max_iter: int = 1000) -> int:
    """Number of synchronous rounds the greedy conflict-repair coloring
    (plans/coloring.py rule: each conflicting canonical edge u<v bumps
    color[u] by 1) performs before reaching zero conflicts — i.e. rounds
    that CHANGED something. Rounds past the fixpoint are no-ops, so an
    oracle unrolled to this count (or more) states the converged colors."""
    dense, _ = _relabel(edges)
    e = dense[dense[:, 0] != dense[:, 1]]
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    canon = np.unique(np.stack([lo, hi], axis=1), axis=0)
    n = int(canon.max()) + 1 if len(canon) else 0
    color = np.zeros(n, dtype=np.int64)
    u, v = canon[:, 0], canon[:, 1]
    for rounds in range(max_iter):
        conflict = color[u] == color[v]
        if not conflict.any():
            return rounds
        bump = np.bincount(u[conflict], minlength=n)
        color += bump
    raise RuntimeError(f"coloring did not converge within {max_iter} rounds")


def _canon_undirected(edges: np.ndarray) -> np.ndarray:
    """Canonical simple closure: (min, max) pairs, self-loops dropped,
    deduped — the edge set k-core/coloring/triangles peel on."""
    lo = np.minimum(edges[:, 0], edges[:, 1])
    hi = np.maximum(edges[:, 0], edges[:, 1])
    m = lo != hi
    if not m.any():
        return np.empty((0, 2), dtype=np.int64)
    return np.unique(np.stack([lo[m], hi[m]], axis=1), axis=0)


def _kcore_peel(edges: np.ndarray, k: int) -> tuple[np.ndarray, int]:
    """(surviving canonical edges, rounds that CHANGED the edge set) of the
    synchronous k-core peel (plans/kcore.py rule: drop every vertex with
    undirected degree < k, recompute, repeat to fixpoint)."""
    e = _canon_undirected(edges)
    rounds = 0
    while len(e):
        deg: dict[int, int] = {}
        for v in e.ravel():
            deg[int(v)] = deg.get(int(v), 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        m = np.array([int(a) in keep and int(b) in keep for a, b in e])
        if m.all():
            break
        e = e[m]
        rounds += 1
    return e, rounds


def kcore_vertices(edges: np.ndarray, k: int) -> set[int]:
    """Vertex set of the k-core (empty when the peel exhausts the graph)."""
    e, _ = _kcore_peel(edges, k)
    return set(int(v) for v in e.ravel())


def kcore_peel_rounds(edges: np.ndarray, k: int) -> int:
    """Rounds the peel CHANGED something — the oracle unroll depth (extra
    unrolled rounds past the fixpoint are no-ops, same idempotence argument
    as the coloring oracle)."""
    _, rounds = _kcore_peel(edges, k)
    return rounds


def wcc_labels(edges: np.ndarray) -> dict[int, int]:
    """Weakly-connected components as min-vertex-id labels over the
    undirected closure (reference semantics: wcc hash-min propagation,
    apps/cpp/wcc_vc_batch.cpp:23-26 init label=vid + write_min exchange;
    true WCC requires symmetrized edges, SURVEY.md §2.4 A2 note)."""
    dense, ids = _relabel(edges)
    n = len(ids)
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in dense:
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    roots = np.array([find(i) for i in range(n)])
    # label = min global id in component
    min_label: dict[int, int] = {}
    for i in range(n):
        r = int(roots[i])
        g = int(ids[i])
        if r not in min_label or g < min_label[r]:
            min_label[r] = g
    return {int(ids[i]): min_label[int(roots[i])] for i in range(n)}


def directed_minlabel(edges: np.ndarray, max_iter: int = 10_000) -> dict[int, int]:
    """Directed min-label propagation fixpoint: label(dst) <- min over
    in-neighbors (reference: wcc_vc_stream.cpp:43-71 kernel_update
    write_min(global[dst], global[src]))."""
    dense, ids = _relabel(edges)
    n = len(ids)
    src, dst = dense[:, 0], dense[:, 1]
    label = ids.astype(np.int64).copy()
    for _ in range(max_iter):
        # groupBy(dst).min(label[src]) then elementwise min
        incoming = np.full(n, np.iinfo(np.int64).max)
        np.minimum.at(incoming, dst, label[src])
        new = np.minimum(label, incoming)
        if np.array_equal(new, label):
            break
        label = new
    return {int(ids[i]): int(label[i]) for i in range(n)}


def lpa_labels(
    edges: np.ndarray, max_iter: int = 20, symmetrize: bool = True
) -> dict[int, int]:
    """Classic synchronous label propagation: each vertex adopts the most
    frequent label among its neighbors, ties broken by min label; label only
    changes if a strictly-better (more frequent, or equal-frequent smaller)
    label exists. Derived from the reference's propagate-combine skeleton
    (wcc_vc_stream.cpp:43-71) with combiner mode instead of min
    (SURVEY.md §2.4 'missing-from-reference' note). Deterministic."""
    dense, ids = _relabel(edges)
    n = len(ids)
    e = dense
    if symmetrize:
        e = np.concatenate([e, e[:, ::-1]], axis=0)
    # dedupe
    e = np.unique(e, axis=0)
    e = e[e[:, 0] != e[:, 1]]
    src, dst = e[:, 0], e[:, 1]
    label = ids.astype(np.int64).copy()
    for _ in range(max_iter):
        new = label.copy()
        for v in range(n):
            nbr_labels = label[src[dst == v]]
            if len(nbr_labels) == 0:
                continue
            vals, counts = np.unique(nbr_labels, return_counts=True)
            best = vals[counts == counts.max()].min()
            new[v] = best
        if np.array_equal(new, label):
            break
        label = new
    return {int(ids[i]): int(label[i]) for i in range(n)}


def triangle_count(edges: np.ndarray) -> int:
    """Exact triangle count on the undirected simple closure (SURVEY.md
    §2.4: canonical relational two-self-join formulation)."""
    dense, _ = _relabel(edges)
    e = dense[dense[:, 0] != dense[:, 1]]
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    und = set(zip(lo.tolist(), hi.tolist()))
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)  # a < b: oriented adjacency
    count = 0
    for a, nbrs in adj.items():
        for b in nbrs:
            count += len(nbrs & adj.get(b, set()))
    return count


def bfs_dist(edges: np.ndarray, root: int) -> dict[int, int]:
    """Directed unit-weight BFS levels (reference SSSP hardcodes weight 1 —
    apps/cpp/sssp_vc_stream.cpp:25-28; unreachable vertices omitted)."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    verts = set()
    for s, d in edges:
        adj[int(s)].append(int(d))
        verts.add(int(s))
        verts.add(int(d))
    dist = {root: 0}
    q = deque([root])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def sssp_dist(edges_w, root: int) -> dict[int, int]:
    """Directed weighted shortest paths (Dijkstra; unreachable omitted).
    The reference only *declares* weighted edge lists (weighted layout
    documented at utility/io/edge_list_io_adapter.h:24-30 but loading is
    stubbed "not supported now", csr_io_adapter.h:47-49); our engine
    supports them for real via run_bfs(weight_col=...)."""
    import heapq
    from collections import defaultdict

    adj = defaultdict(list)
    for s, d, w in edges_w:
        adj[int(s)].append((int(d), int(w)))
    dist = {root: 0}
    pq = [(0, root)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _ktruss_peel(edges: np.ndarray, k: int) -> tuple[set[tuple[int, int]], int]:
    """(surviving canonical edge set, rounds that CHANGED it) of the
    synchronous k-truss peel (plans/ktruss.py rule: drop every edge whose
    support — triangles through it in the CURRENT subgraph — is < k-2,
    recompute, repeat to fixpoint)."""
    e = _canon_undirected(edges)
    cur = {(int(a), int(b)) for a, b in e}
    rounds = 0
    while cur:
        adj: dict[int, set[int]] = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        keep = {(a, b) for a, b in cur if len(adj[a] & adj[b]) >= k - 2}
        if keep == cur:
            break
        cur = keep
        rounds += 1
    return cur, rounds


def ktruss_edges(edges: np.ndarray, k: int) -> set[tuple[int, int]]:
    return _ktruss_peel(edges, k)[0]


def ktruss_peel_rounds(edges: np.ndarray, k: int) -> int:
    """Changed-round count — the oracle unroll depth (extra unrolled rounds
    past the fixpoint are no-ops, same idempotence argument as k-core)."""
    return _ktruss_peel(edges, k)[1]


def hits(edges: np.ndarray, iters: int = 3) -> dict[int, tuple[float, float]]:
    """Kleinberg HITS, synchronous, L1-normalized, mirroring plans/hits.py:
    auth from the previous hub along in-edges, hub from the CURRENT
    normalized auth along out-edges. Duplicate edges deduped; self-loops
    kept. Returns {vid: (auth, hub)}."""
    e = np.unique(edges, axis=0)
    dense, ids = _relabel(e)
    n = len(ids)
    src, dst = dense[:, 0], dense[:, 1]
    auth = np.ones(n)
    hub = np.ones(n)
    for _ in range(iters):
        a_raw = np.bincount(dst, weights=hub[src], minlength=n)
        auth = a_raw / a_raw.sum()
        h_raw = np.bincount(src, weights=auth[dst], minlength=n)
        hub = h_raw / h_raw.sum()
    return {int(v): (float(a), float(h)) for v, a, h in zip(ids, auth, hub)}


def scc_labels(edges: np.ndarray) -> dict[int, int]:
    """SCC id per vertex = min vid of its strongly connected component.
    Dense boolean reachability closure (repeated squaring) — O(n^3 log n)
    bitwise, fine at fixture scale."""
    dense, ids = _relabel(edges)
    n = len(ids)
    reach = np.eye(n, dtype=bool)
    reach[dense[:, 0], dense[:, 1]] = True
    while True:
        nxt = reach | (reach @ reach)
        if (nxt == reach).all():
            break
        reach = nxt
    mutual = reach & reach.T
    scc = mutual.argmax(axis=1)  # first True per row = min dense id
    return {int(ids[v]): int(ids[scc[v]]) for v in range(n)}


def anf_estimates_exact(edges: np.ndarray, depth: int = 3) -> dict[int, float]:
    """Exact-ball HLL estimates mirroring plans/anf.py bit-for-bit: the
    ball {u : dist(v,u) <= depth} computed exactly (BFS), then the same
    md5-derived registers and estimator arithmetic."""
    import hashlib

    M, ALPHA_M, RHO_CAP = 16, 0.673, 57
    dense, ids = _relabel(edges)
    n = len(ids)
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in dense:
        adj[a].append(b)

    def h63(vid: int) -> int:
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16)

    jr = []
    for v in range(n):
        h = h63(int(ids[v]))
        w = h >> 4
        rho = RHO_CAP if w == 0 else ((w & -w).bit_length())
        jr.append((h % M, rho))

    out = {}
    for v in range(n):
        ball = {v}
        frontier = {v}
        for _ in range(depth):
            nxt = {b for a in frontier for b in adj[a]} - ball
            if not nxt:
                break
            ball |= nxt
            frontier = nxt
        reg = [0] * M
        for u in ball:
            j, rho = jr[u]
            reg[j] = max(reg[j], rho)
        s = sum(2.0 ** -r for r in reg)
        zeros = sum(1 for r in reg if r == 0)
        raw = ALPHA_M * M * M / s
        est = M * np.log(M / zeros) if (raw <= 2.5 * M and zeros > 0) else raw
        out[int(ids[v])] = float(est)
    return out


def nf_curve_exact(edges: np.ndarray, max_depth: int = 4) -> list[tuple[int, float]]:
    """[(d, NF(d))] mirroring plans/anf.neighborhood_function: exact-ball
    per-vertex HLL estimates (anf_estimates_exact), rounded to 6 dp,
    summed exactly (Decimal), rounded to 6 dp."""
    from decimal import Decimal

    out = []
    for d in range(1, max_depth + 1):
        ests = anf_estimates_exact(edges, depth=d)
        tot = sum(Decimal(f"{e:.6f}") for e in ests.values())
        out.append((d, float(round(float(tot), 6))))
    return out


def landmark_betweenness(edges: np.ndarray, seeds: list[int]) -> dict[int, float]:
    """Directed Brandes dependencies accumulated over the probe sources —
    mirrors plans/betweenness.py (vertices with zero accumulated
    dependency are omitted, matching the Spark output's inner joins)."""
    from collections import deque

    dense, ids = _relabel(edges)
    n = len(ids)
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in dense:
        adj[a].append(b)
    id_of = {int(v): i for i, v in enumerate(ids)}
    acc = np.zeros(n)
    covered: set[int] = set()  # union of dist>=1 reach sets = output rows
    for s_raw in seeds:
        if s_raw not in id_of:
            continue
        s = id_of[s_raw]
        dist = np.full(n, -1)
        sigma = np.zeros(n)
        dist[s], sigma[s] = 0, 1.0
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = np.zeros(n)
        for u in reversed(order):
            for w in adj[u]:
                if dist[w] == dist[u] + 1:
                    delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if u != s:
                acc[u] += delta[u]
                covered.add(u)
    return {int(ids[v]): float(acc[v]) for v in range(n) if v in covered}


def coreness_np(edges: np.ndarray) -> dict[int, int]:
    """Core number per non-isolated vertex of the canonical simple closure,
    by the textbook min-degree peel (Batagelj-Zaversnik order): remove a
    minimum-degree vertex, its core number is the running max of the degree
    at removal time. Ground truth for plans/coreness.py (which iterates the
    h-index fixpoint instead — same answer by Lu et al. 2016, Thm 1)."""
    e = _canon_undirected(edges)
    if not len(e):
        return {}
    ids = np.unique(e)
    idx = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in e:
        adj[idx[int(a)]].append(idx[int(b)])
        adj[idx[int(b)]].append(idx[int(a)])
    deg = np.array([len(a) for a in adj])
    core = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    cur = 0
    for _ in range(n):
        cand = np.where(alive)[0]
        v = cand[np.argmin(deg[cand])]
        cur = max(cur, int(deg[v]))
        core[v] = cur
        alive[v] = False
        for w in adj[v]:
            if alive[w]:
                deg[w] -= 1
    return {int(ids[i]): int(core[i]) for i in range(n)}


def coreness_hindex_rounds(edges: np.ndarray) -> int:
    """Rounds the SYNCHRONOUS h-index iteration (plans/coreness.py rule:
    c_0 = degree, c_t+1(v) = h-index of neighbors' c_t) takes to reach its
    fixpoint — the oracle unroll depth. Also asserts the fixpoint equals
    the peel core numbers (the Lu et al. convergence theorem, re-checked
    at oracle-build time on the actual input)."""
    e = _canon_undirected(edges)
    if not len(e):
        return 0
    ids = np.unique(e)
    idx = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in e:
        adj[idx[int(a)]].append(idx[int(b)])
        adj[idx[int(b)]].append(idx[int(a)])
    val = np.array([len(a) for a in adj], dtype=np.int64)
    rounds = 0
    while True:
        nxt = np.empty_like(val)
        for v in range(n):
            vals = np.sort(val[adj[v]])[::-1]
            ranks = np.arange(1, len(vals) + 1)
            nxt[v] = int(np.minimum(vals, ranks).max()) if len(vals) else 0
        if (nxt == val).all():
            break
        val = nxt
        rounds += 1
    peel = coreness_np(edges)
    assert all(int(val[idx[v]]) == c for v, c in peel.items()), (
        "h-index fixpoint != peel core numbers — convergence theorem violated"
    )
    return rounds


def katz_scores(
    edges: np.ndarray, alpha: float = 0.1, beta: float = 1.0, iters: int = 3
) -> dict[int, float]:
    """Katz centrality, synchronous truncated power iteration mirroring
    plans/centrality.py::run_katz: x' = beta + alpha * A^T x, init x = beta.
    Duplicate edges kept (parallel edges double-credit, same as the Spark
    sum over the edge table). Returns {vid: score} over every endpoint."""
    dense, ids = _relabel(edges)
    n = len(ids)
    src, dst = dense[:, 0], dense[:, 1]
    x = np.full(n, float(beta))
    for _ in range(iters):
        x = beta + alpha * np.bincount(dst, weights=x[src], minlength=n)
    return {int(v): float(s) for v, s in zip(ids, x)}


def mis_greedy(edges: np.ndarray) -> tuple[set[int], int]:
    """Deterministic greedy MIS mirroring plans/mis.py::run_mis: fixed
    priorities p(v) = md5_int63('mis:' || v), synchronous local-minimum
    rounds on the simple undirected closure. Returns (member vids, number
    of sync rounds to empty the undecided set). Asserts the sync fixpoint
    equals the sequential greedy in priority order (the determinism
    argument the plan relies on) and that priorities are unique."""
    import hashlib

    und = {(a, b) for a, b in map(tuple, edges) if a != b}
    und |= {(b, a) for a, b in und}
    # vertex universe = ALL endpoints incl. self-loop-only vertices, which
    # are isolated in the simple closure and therefore always members
    # (plans/mis.py self-loop semantics)
    ids = sorted({int(v) for e in map(tuple, edges) for v in e})
    prio = {
        v: int(hashlib.md5(f"mis:{v}".encode()).hexdigest()[:15], 16)
        for v in ids
    }
    assert len(set(prio.values())) == len(ids), "md5 priority collision"
    adj: dict[int, set[int]] = {v: set() for v in ids}
    for a, b in und:
        adj[int(a)].add(int(b))

    undecided = set(ids)
    members: set[int] = set()
    rounds = 0
    while undecided:
        rounds += 1
        winners = {
            v
            for v in undecided
            if all(
                (prio[v], v) < (prio[u], u)
                for u in adj[v]
                if u in undecided
            )
        }
        assert winners, "sync MIS stalled — priorities not unique?"
        members |= winners
        dropped = set(winners)
        for w in winners:
            dropped |= adj[w] & undecided
        undecided -= dropped

    seq: set[int] = set()
    for v in sorted(ids, key=lambda v: (prio[v], v)):
        if not (adj[v] & seq):
            seq.add(v)
    assert seq == members, "sync fixpoint != sequential greedy MIS"
    return members, rounds


def dag_layers(edges: np.ndarray) -> tuple[dict[int, int], int]:
    """Longest-path layering mirroring plans/dag.py::longest_path_layers:
    layer(v) = longest directed path ending at v, sources at 0. Input must
    be a DAG (asserted via the DP's own convergence on a topological
    order). Returns ({vid: layer}, depth) where depth = max layer — also
    the sync-round count the Spark plan and the unrolled SQL oracle need
    (one extra quiescence round confirms the fixpoint)."""
    uniq = {(int(a), int(b)) for a, b in map(tuple, edges) if a != b}
    verts = sorted({v for e in uniq for v in e})
    # Kahn topological order (raises on cycles)
    indeg = {v: 0 for v in verts}
    out: dict[int, list[int]] = {v: [] for v in verts}
    for a, b in uniq:
        out[a].append(b)
        indeg[b] += 1
    from collections import deque

    q = deque(v for v in verts if indeg[v] == 0)
    topo = []
    while q:
        v = q.popleft()
        topo.append(v)
        for w in out[v]:
            indeg[w] -= 1
            if indeg[w] == 0:
                q.append(w)
    assert len(topo) == len(verts), "input is not a DAG"
    layer = {v: 0 for v in verts}
    for v in topo:
        for w in out[v]:
            layer[w] = max(layer[w], layer[v] + 1)
    return layer, max(layer.values()) if layer else 0
