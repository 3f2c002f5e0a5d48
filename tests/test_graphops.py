"""Graph analytics operators (operators/graphops.py): connected
components (Large-Star/Small-Star), k-hop BFS, degree-oriented
triangle counting, fixed-iteration PageRank."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from json_ld_spark.operators import graphops as g


def _edges(spark, pairs, cols=("src", "dst")):
    return spark.createDataFrame([tuple(p) for p in pairs], list(cols))


# ---------------------------------------------------------------- CC


def test_cc_two_components_and_chain(spark):
    # chain 1-2-3-4 plus separate pair 10-11: diameters > 1 exercise
    # the star alternation, not just single-round contraction
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    out = {
        r["node"]: r["component"]
        for r in g.connected_components(e).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_long_path_converges_fast(spark):
    # path of 40 nodes: min-label propagation would need 40 rounds;
    # star alternation must finish within the max_iter=25 default
    n = 40
    e = _edges(spark, [(i, i + 1) for i in range(n)])
    comp = g.connected_components(e)
    vals = {r["component"] for r in comp.collect()}
    assert vals == {0}
    assert comp.count() == n + 1


def test_cc_string_ids_lexicographic_min(spark):
    e = _edges(spark, [("docB", "docC"), ("docC", "docA"), ("x", "y")])
    out = {r["node"]: r["component"] for r in g.connected_components(e).collect()}
    assert out == {
        "docA": "docA",
        "docB": "docA",
        "docC": "docA",
        "x": "x",
        "y": "x",
    }


def test_cc_label_invariance_under_shuffle(spark):
    # same graph presented with reversed/duplicated edges -> same labels
    e1 = _edges(spark, [(5, 3), (3, 9), (9, 5), (2, 7)])
    e2 = _edges(spark, [(9, 3), (3, 5), (7, 2), (2, 7), (5, 9), (5, 3)])
    r1 = sorted(map(tuple, g.connected_components(e1).collect()))
    r2 = sorted(map(tuple, g.connected_components(e2).collect()))
    assert r1 == r2


# ---------------------------------------------------------------- k-hop


def test_k_hop_depths_directed(spark):
    t = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("z", "a")],
        cols=("subj", "obj"),
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    out = {r["node"]: r["depth"] for r in g.k_hop(t, seeds, k=3).collect()}
    # directed: z->a is not reachable FROM a
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_k_hop_min_depth_on_diamond(spark):
    # two paths a->b->d and a->d: d must be depth 1, not 2
    t = _edges(spark, [("a", "b"), ("b", "d"), ("a", "d")], cols=("subj", "obj"))
    seeds = spark.createDataFrame([("a",)], ["node"])
    out = {r["node"]: r["depth"] for r in g.k_hop(t, seeds, k=4).collect()}
    assert out == {"a": 0, "b": 1, "d": 1}


# ---------------------------------------------------------------- triangles


def test_triangle_k4(spark):
    # K4 has C(4,3)=4 triangles; every node is in exactly 3
    nodes = [1, 2, 3, 4]
    e = _edges(spark, [(a, b) for a in nodes for b in nodes if a < b])
    out = {r["node"]: r["n_triangles"] for r in g.triangle_count(e).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_none_on_star(spark):
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    assert g.triangle_count(e).count() == 0


def test_triangle_skewed_hub(spark):
    # hub 0 connected to everyone; exactly the triangles through
    # (0, i, i+1) edges exist. Degree orientation must not blow up.
    e = _edges(spark, [(0, i) for i in range(1, 20)] + [(1, 2), (5, 6)])
    out = {r["node"]: r["n_triangles"] for r in g.triangle_count(e).collect()}
    assert out[0] == 2 and out[1] == 1 and out[2] == 1 and out[5] == 1


# ---------------------------------------------------------------- pagerank


def test_pagerank_mass_conserved_and_symmetry(spark):
    # directed cycle: perfect symmetry -> all ranks exactly 1/n
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    rows = g.pagerank(e, iters=4).collect()
    assert all(abs(r["rank"] - 1 / 3) < 1e-12 for r in rows)


def test_pagerank_sink_gets_more(spark):
    # 1->3, 2->3: node 3 must outrank sources; total mass == 1
    e = _edges(spark, [(1, 3), (2, 3)])
    rows = {r["node"]: r["rank"] for r in g.pagerank(e, iters=5).collect()}
    assert rows[3] > rows[1] == rows[2]
    assert math.isclose(sum(rows.values()), 1.0, rel_tol=1e-9)


def test_pagerank_matches_numpy_reference(spark):
    import numpy as np

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    n, d, iters = 4, 0.85, 6
    pr = np.full(n, 1 / n)
    out = {u: [v for a, v in edges if a == u] for u in range(n)}
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(pr[u] for u in range(n) if not out[u])
        nxt += d * dangling / n
        for u in range(n):
            for v in out[u]:
                nxt[v] += d * pr[u] / len(out[u])
        pr = nxt
    rows = {
        r["node"]: r["rank"]
        for r in g.pagerank(_edges(spark, edges), iters=iters).collect()
    }
    for u in range(n):
        assert math.isclose(rows[u], pr[u], rel_tol=1e-9), (u, rows[u], pr[u])


def test_cc_matches_union_find_on_random_graphs(spark):
    """Seeded random graphs (mixed densities, disjoint id spaces merged
    into ONE job) vs a driver-side union-find reference."""
    import random

    rng = random.Random(20260817)
    edges, parent = [], {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for gi, (n, m) in enumerate([(12, 6), (30, 45), (50, 20), (8, 28), (40, 39)]):
        off = gi * 1000
        for _ in range(m):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.append((off + a, off + b))
                union(off + a, off + b)
    # union-find min-root labels (path-compress fully)
    expect = {x: find(x) for x in parent}
    got = {
        r["node"]: r["component"]
        for r in g.connected_components(_edges(spark, edges)).collect()
    }
    assert got == expect


def test_triangles_match_bruteforce_on_random_graphs(spark):
    """Seeded random graphs (disjoint id spaces, one job) vs per-node
    triangle counts from brute-force combination enumeration."""
    import itertools
    import random

    rng = random.Random(99173)
    edges, adj = [], {}
    for gi, (n, m) in enumerate([(10, 25), (25, 60), (14, 14), (9, 36)]):
        off = gi * 1000
        for _ in range(m):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                u, v = off + min(a, b), off + max(a, b)
                edges.append((u, v))
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    expect = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for node in (x, y, z):
                expect[node] = expect.get(node, 0) + 1
    got = {
        r["node"]: r["n_triangles"]
        for r in g.triangle_count(_edges(spark, edges)).collect()
    }
    assert got == expect


def test_k_hop_matches_bfs_on_random_digraph(spark):
    """Seeded random directed graph vs a driver-side BFS reference."""
    import collections
    import random

    rng = random.Random(555888)
    n, m, k = 60, 140, 4
    edges = []
    adj = collections.defaultdict(list)
    for _ in range(m):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.append((a, b))
            adj[a].append(b)
    seeds = [0, 7, 41]
    depth = {s: 0 for s in seeds}
    frontier = list(seeds)
    for d in range(1, k + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in depth:
                    depth[v] = d
                    nxt.append(v)
        frontier = nxt
    t = _edges(spark, edges, cols=("subj", "obj"))
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {r["node"]: r["depth"] for r in g.k_hop(t, sdf, k=k).collect()}
    assert got == depth


# --------------------------------------------------------------------------
# random_walks
# --------------------------------------------------------------------------

import hashlib


def _py_walks(edges, starts, walks_per_node, walk_len, seed=""):
    """Pure-Python replay of the md5-bridge walk semantics."""
    from collections import defaultdict

    adj = defaultdict(list)
    for (u, v) in sorted(set(edges)):
        adj[u].append(v)
    for u in adj:
        adj[u].sort()
    rows = set()
    for node in starts:
        for wi in range(walks_per_node):
            wid = f"{node}#{wi}"
            cur = node
            rows.add((wid, 0, cur))
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur, [])
                if not nbrs:
                    break
                h = int(hashlib.md5(
                    f"{seed}:{wid}:{t}:{cur}".encode()).hexdigest()[:8], 16)
                cur = nbrs[h % len(nbrs)]
                rows.add((wid, t, cur))
    return rows


def test_random_walks_md5_matches_python_replay(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "a"),
             ("d", "a"), ("d", "b"), ("d", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.walk_id, r.step, r.node)
           for r in g.random_walks(df, walks_per_node=2, walk_len=6,
                                   seed="s1", hash_fn="md5").collect()}
    want = _py_walks(edges, ["a", "b", "c", "d"], 2, 6, seed="s1")
    assert got == want


def test_random_walks_deterministic_and_seed_sensitive(spark):
    edges = [(f"n{i}", f"n{(i * 3 + j) % 10}") for i in range(10)
             for j in (1, 2, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {tuple(r) for r in g.random_walks(df, walk_len=5, seed="x").collect()}
    b = {tuple(r) for r in g.random_walks(df, walk_len=5, seed="x").collect()}
    c = {tuple(r) for r in g.random_walks(df, walk_len=5, seed="y").collect()}
    assert a == b
    assert a != c  # 10 walks x 5 choices: astronomically unlikely to agree


def test_random_walks_chain_and_dead_end(spark):
    # chain a->b->c: any walk from a is forced along it and stops at c
    df = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    starts = spark.createDataFrame([("a",)], ["node"])
    got = sorted(
        (r.step, r.node)
        for r in g.random_walks(df, starts=starts, walk_len=9).collect()
    )
    assert got == [(0, "a"), (1, "b"), (2, "c")]


def test_random_walks_max_degree_truncates(spark):
    # hub with 5 neighbors, cap 2: only the 2 smallest dsts reachable
    df = spark.createDataFrame(
        [("h", f"x{i}") for i in range(5)] + [(f"x{i}", "h") for i in range(5)],
        ["src", "dst"],
    )
    starts = spark.createDataFrame([("h",)], ["node"])
    got = {r.node for r in g.random_walks(
        df, starts=starts, walks_per_node=8, walk_len=4, max_degree=2
    ).collect()}
    assert got <= {"h", "x0", "x1"}


def test_skipgram_pairs_counts(spark):
    walks = spark.createDataFrame(
        [("w0", 0, "a"), ("w0", 1, "b"), ("w0", 2, "a"), ("w0", 3, "c"),
         ("w1", 0, "b"), ("w1", 1, "c")],
        ["walk_id", "step", "node"],
    )
    got = {(r.center, r.context): r.n
           for r in g.skipgram_pairs(walks, window=2).collect()}
    # brute-force replay
    import collections
    want = collections.Counter()
    seqs = {"w0": ["a", "b", "a", "c"], "w1": ["b", "c"]}
    for seq in seqs.values():
        for i, c in enumerate(seq):
            for j, x in enumerate(seq):
                if i != j and abs(i - j) <= 2:
                    want[(c, x)] += 1
    assert got == dict(want)
    # co-occurrence is symmetric in aggregate
    assert all(got[(u, v)] == got[(v, u)] for (u, v) in got)


def _py_n2v(edges, starts, wpn, L, seed, wr, wi, wo):
    from collections import defaultdict

    adj = defaultdict(list)
    eset = set(edges)
    for (u, v) in sorted(set(edges)):
        adj[u].append(v)
    rows = set()
    for node in starts:
        for k in range(wpn):
            wid = f"{node}#{k}"
            prev, cur = None, node
            rows.add((wid, 0, str(cur)))
            for t in range(1, L + 1):
                nbrs = sorted(set(adj.get(cur, [])))
                if not nbrs:
                    break
                ws = [1 if prev is None else
                      (wr if v == prev else (wi if (prev, v) in eset else wo))
                      for v in nbrs]
                r = int(hashlib.md5(
                    f"{seed}:{wid}:{t}:{cur}".encode()).hexdigest()[:8], 16) % sum(ws)
                cum = 0
                for v, w in zip(nbrs, ws):
                    cum += w
                    if cum > r:
                        nxt = v
                        break
                rows.add((wid, t, str(nxt)))
                prev, cur = cur, nxt
    return rows


def test_node2vec_md5_matches_python_replay(spark):
    # triangle + tail: all three bias branches fire
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c"),
             ("c", "a"), ("c", "d"), ("d", "c"), ("d", "e"), ("e", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.walk_id, r.step, r.node)
           for r in g.node2vec_walks(df, walks_per_node=2, walk_len=5,
                                     seed="nv", hash_fn="md5",
                                     w_return=1, w_in=4, w_out=2).collect()}
    want = _py_n2v(edges, ["a", "b", "c", "d", "e"], 2, 5, "nv", 1, 4, 2)
    assert got == want


def test_node2vec_uniform_equals_deepwalk(spark):
    edges = [(f"n{i}", f"n{(i * 3 + j) % 8}") for i in range(8) for j in (1, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    starts = spark.createDataFrame([(f"n{i}",) for i in range(8)], ["node"])
    a = {tuple(r) for r in g.node2vec_walks(
        df, starts=starts, walk_len=4, seed="u", hash_fn="md5",
        w_return=1, w_in=1, w_out=1).collect()}
    b = {tuple(r) for r in g.random_walks(
        df, starts=starts, walk_len=4, seed="u", hash_fn="md5").collect()}
    assert a == b  # equal weights reduce the 2nd-order walk to 1st-order


def test_personalized_pagerank_matches_numpy(spark):
    import numpy as np

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"),
             ("a", "c"), ("e", "a")]  # e: source-only; d: in the cycle
    seeds = ["a", "e"]
    nodes = sorted({x for p in edges for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for (u, v) in set(edges):
        A[idx[v], idx[u]] += 1
    outd = A.sum(axis=0)
    r0 = np.array([1 / len(seeds) if x in seeds else 0.0 for x in nodes])
    r, d = r0.copy(), 0.85
    for _ in range(8):
        inflow = A @ np.where(outd > 0, r / np.maximum(outd, 1), 0.0)
        dang = r[outd == 0].sum()
        r = (1 - d) * r0 + d * (inflow + dang * r0)
    df = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {row.node: row.rank
           for row in g.personalized_pagerank(df, sdf, iters=8).collect()}
    for x in nodes:
        assert abs(got[x] - r[idx[x]]) < 1e-9
    # mass concentrates near the seeds vs a far node
    assert got["a"] > got["d"]


def test_personalized_pagerank_seed_outside_graph(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    sdf = spark.createDataFrame([("z",)], ["node"])
    got = {r.node: r.rank for r in g.personalized_pagerank(df, sdf, iters=3).collect()}
    # z is dangling AND the only seed: it keeps (1-d) + d*own-mass share
    assert set(got) == {"a", "b", "z"}
    assert got["z"] > got["a"] and got["a"] == 0.0


def test_link_prediction_features_vs_bruteforce(spark):
    import math
    from collections import defaultdict

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("b", "d"),
             ("d", "e"), ("a", "e"), ("e", "f")]
    nbrs = defaultdict(set)
    for (x, y) in edges:
        nbrs[x].add(y); nbrs[y].add(x)
    want = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            common = nbrs[u] & nbrs[v]
            if not common:
                continue
            j = len(common) / (len(nbrs[u]) + len(nbrs[v]) - len(common))
            aa = sum(1 / math.log(len(nbrs[w])) for w in common)
            want[(u, v)] = (len(common), round(j, 6), round(aa, 6))
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.u, r.v): (r.n_common, r.jaccard_r, r.adamic_adar_r)
           for r in g.link_prediction_features(df).collect()}
    assert got == want


def test_link_prediction_max_degree_caps_middles(spark):
    # star: hub h connects x0..x4; all pairs share only the hub middle
    edges = [("h", f"x{i}") for i in range(5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert g.link_prediction_features(df).count() == 10
    assert g.link_prediction_features(df, max_degree=3).count() == 0


def test_label_propagation_vs_bruteforce(spark):
    from collections import Counter, defaultdict

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
             ("b", "d"), ("a", "c"), ("f", "g")]
    seeds = {"a": "red", "e": "blue"}

    nbrs = defaultdict(set)
    for (x, y) in edges:
        nbrs[x].add(y); nbrs[y].add(x)

    labels = dict(seeds)
    for _ in range(3):
        new = dict(seeds)
        for u in nbrs:
            if u in seeds:
                continue
            votes = Counter(labels[v] for v in nbrs[u] if v in labels)
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
                # tie-break: smaller label string
                top = max(votes.values())
                best = min(l for l, n in votes.items() if n == top)
                new[u] = best
        labels = new

    df = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame(list(seeds.items()), ["node", "label"])
    got = {r.node: r.label
           for r in g.label_propagation(df, sdf, iters=3).collect()}
    assert got == labels


def test_label_propagation_seeds_clamped(spark):
    # b is surrounded by blue but is seeded red: stays red
    edges = [("b", "x1"), ("b", "x2"), ("x1", "s"), ("x2", "s")]
    seeds = [("b", "red"), ("s", "blue"), ("x1", "blue"), ("x2", "blue")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame(seeds, ["node", "label"])
    got = {r.node: r.label for r in g.label_propagation(df, sdf, iters=2).collect()}
    assert got["b"] == "red"


def test_cooccurrence_graph_counts_and_cap(spark):
    pairs = [("d1", "a"), ("d1", "b"), ("d1", "c"),
             ("d2", "a"), ("d2", "b"),
             ("d3", "a"), ("d3", "b"), ("d3", "c"), ("d3", "d"),  # size 4
             ("d4", "x")]
    df = spark.createDataFrame(pairs, ["doc_id", "item"])
    got = {(r.u, r.v): r.n_groups
           for r in g.cooccurrence_graph(df).collect()}
    assert got[("a", "b")] == 3 and got[("a", "c")] == 2
    assert got[("c", "d")] == 1 and ("x",) not in got
    capped = {(r.u, r.v): r.n_groups
              for r in g.cooccurrence_graph(df, max_group_size=3).collect()}
    # d3 dropped entirely: no c-d edge, a-b down to 2
    assert ("c", "d") not in capped and capped[("a", "b")] == 2


def test_k_core_matches_brute_force_peel(spark):
    """k_core == the textbook iterative peel on a graph with a real
    cascade (chain + hub + clique), including the chain worst case
    (peels from the ends) and the empty-core case."""
    from json_ld_spark.operators.graphops import k_core

    edges = (
        # K4 clique (3-core survives k=3)
        [(f"c{a}", f"c{b}") for a in range(4) for b in range(a + 1, 4)]
        # a 6-node path hanging off the clique (peels under k=2? no —
        # path interior degree 2; under k=3 it cascades into the clique
        # attachment point, which survives on clique degrees)
        + [("c0", "p0")] + [(f"p{i}", f"p{i+1}") for i in range(5)]
        # a hub with 5 leaves (leaves peel at k>=2, then hub follows)
        + [("h", f"l{i}") for i in range(5)]
    )
    df = spark.createDataFrame(edges, "src string, dst string")

    def brute(k):
        e = {(u, v) for u, v in edges} | {(v, u) for u, v in edges}
        e = {(u, v) for u, v in e if u != v}
        while True:
            deg = {}
            for u, _ in e:
                deg[u] = deg.get(u, 0) + 1
            keep = {u for u, d in deg.items() if d >= k}
            ne = {(u, v) for u, v in e if u in keep and v in keep}
            if ne == e:
                break
            e = ne
        out = {}
        for u, _ in e:
            out[u] = out.get(u, 0) + 1
        return out

    for k in (1, 2, 3, 4):
        got = {r.node: r.degree for r in k_core(df, k=k).collect()}
        assert got == brute(k), f"k={k}"
    assert {r.node for r in k_core(df, k=3).collect()} == {f"c{i}" for i in range(4)}
    assert k_core(df, k=4).count() == 0


def test_k_core_fuzz_vs_brute_peel(spark):
    """Hypothesis: random small graphs peel identically to the
    textbook algorithm for k in 1..3."""
    from hypothesis import given, settings, strategies as st

    from json_ld_spark.operators.graphops import k_core

    @given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                    min_size=1, max_size=30),
           st.integers(1, 3))
    @settings(max_examples=10, deadline=None)
    def prop(pairs, k):
        edges = [(f"n{a}", f"n{b}") for a, b in pairs if a != b]
        if not edges:
            return
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.degree for r in k_core(df, k=k).collect()}
        e = {(u, v) for u, v in edges} | {(v, u) for u, v in edges}
        while True:
            deg: dict = {}
            for u, _ in e:
                deg[u] = deg.get(u, 0) + 1
            keep = {u for u, d in deg.items() if d >= k}
            ne = {(u, v) for u, v in e if u in keep and v in keep}
            if ne == e:
                break
            e = ne
        expect: dict = {}
        for u, _ in e:
            expect[u] = expect.get(u, 0) + 1
        assert got == expect

    prop()


# ---------------------------------------------------------------- HITS


def _hits_reference(edges, iters):
    nodes = sorted({x for e in edges for x in e})
    hub = {n: 1.0 for n in nodes}
    auth = {n: 1.0 for n in nodes}
    for _ in range(iters):
        araw = {n: 0.0 for n in nodes}
        for u, v in edges:
            araw[v] += hub[u]
        sa = sum(araw.values()) or 1.0
        auth = {n: araw[n] / sa for n in nodes}
        hraw = {n: 0.0 for n in nodes}
        for u, v in edges:
            hraw[u] += auth[v]
        sh = sum(hraw.values()) or 1.0
        hub = {n: hraw[n] / sh for n in nodes}
    return hub, auth


def test_hits_matches_reference_loop(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"), ("c", "a")]
    rows = g.hits(_edges(spark, pairs), iters=3).collect()
    hub, auth = _hits_reference(pairs, iters=3)
    for r in rows:
        assert math.isclose(r["hub"], hub[r["node"]], rel_tol=1e-9)
        assert math.isclose(r["auth"], auth[r["node"]], rel_tol=1e-9)


def test_hits_l1_normalized_and_roles(spark):
    # bipartite u->v: left side pure hubs (auth 0), right pure auths
    pairs = [("u1", "v1"), ("u1", "v2"), ("u2", "v2")]
    rows = {r["node"]: r for r in g.hits(_edges(spark, pairs), iters=4).collect()}
    assert math.isclose(sum(r["hub"] for r in rows.values()), 1.0, rel_tol=1e-9)
    assert math.isclose(sum(r["auth"] for r in rows.values()), 1.0, rel_tol=1e-9)
    assert rows["v1"]["hub"] == 0.0 and rows["u1"]["auth"] == 0.0
    # v2 has two in-links from hubs -> strictly more authoritative
    assert rows["v2"]["auth"] > rows["v1"]["auth"]
    assert rows["u1"]["hub"] > rows["u2"]["hub"]


def test_hits_duplicate_edges_ignored(spark):
    once = g.hits(_edges(spark, [("a", "b"), ("b", "c")]), iters=2).collect()
    dup = g.hits(
        _edges(spark, [("a", "b"), ("a", "b"), ("b", "c")]), iters=2
    ).collect()
    assert sorted((r["node"], r["hub"], r["auth"]) for r in once) == sorted(
        (r["node"], r["hub"], r["auth"]) for r in dup
    )


# ------------------------------------------------- shortest paths


def _wedges(spark, triples):
    return spark.createDataFrame(
        [tuple(t) for t in triples], ["src", "dst", "w"]
    )


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], ["node"])


def test_shortest_paths_hop_bound_semantics(spark):
    # a->b->c->d->e chain w/ a costly shortcut a->c; 3-hop bound:
    # e reachable only through the shortcut (4-hop cheap path excluded)
    tri = [("a", "b", 2), ("b", "c", 3), ("a", "c", 10), ("c", "d", 1), ("d", "e", 1)]
    got = {
        r["node"]: r["dist"]
        for r in g.shortest_paths(_wedges(spark, tri), _seeds(spark, ["a"]), 3).collect()
    }
    assert got == {"a": 0, "b": 2, "c": 5, "d": 6, "e": 12}
    # one more hop finds the cheaper 4-edge path to e
    got4 = {
        r["node"]: r["dist"]
        for r in g.shortest_paths(_wedges(spark, tri), _seeds(spark, ["a"]), 4).collect()
    }
    assert got4["e"] == 7


def test_shortest_paths_multi_source_and_min_weight_edge(spark):
    # parallel edges keep the min weight; two seeds compete
    tri = [("s1", "m", 5), ("s1", "m", 2), ("s2", "m", 3), ("m", "t", 1)]
    got = {
        r["node"]: r["dist"]
        for r in g.shortest_paths(
            _wedges(spark, tri), _seeds(spark, ["s1", "s2"]), 3
        ).collect()
    }
    assert got["m"] == 2 and got["t"] == 3 and got["s1"] == 0 and got["s2"] == 0


def test_shortest_paths_early_exit_on_fixpoint(spark):
    # diameter 2 but max_hops 10: loop must exit early and stay exact
    tri = [("a", "b", 1), ("b", "c", 1)]
    got = {
        r["node"]: r["dist"]
        for r in g.shortest_paths(_wedges(spark, tri), _seeds(spark, ["a"]), 10).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2}


def test_shortest_paths_cycle_terminates(spark):
    tri = [("a", "b", 1), ("b", "a", 1)]
    got = {
        r["node"]: r["dist"]
        for r in g.shortest_paths(_wedges(spark, tri), _seeds(spark, ["a"]), 5).collect()
    }
    assert got == {"a": 0, "b": 1}


# ------------------------------------------------------- k-truss


def test_ktruss_k4_keeps_clique_peels_pendant(spark):
    # K4 + pendant triangle: K4 edges have support 2 (>= k-2 = 2),
    # the pendant triangle's support-1 edges peel in round 1
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (4, 6), (5, 6)]
    out = sorted(
        (r["src"], r["dst"], r["support"])
        for r in g.k_truss(_edges(spark, pairs), k=4, rounds=3).collect()
    )
    assert out == [(1, 2, 2), (1, 3, 2), (1, 4, 2), (2, 3, 2), (2, 4, 2),
                   (3, 4, 2)]


def test_ktruss_cascade(spark):
    # two K4s sharing the edge (3,4): still a 4-truss after merge;
    # k=5 (support >= 3) peels everything in a cascade
    k4a = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    k4b = [(3, 5), (3, 4), (4, 5), (3, 6), (4, 6), (5, 6)]
    e = _edges(spark, k4a + k4b)
    assert g.k_truss(e, k=5, rounds=4).count() == 0
    assert g.k_truss(e, k=4, rounds=4).count() == 11


def test_ktruss_idempotent_at_fixpoint(spark):
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    a = sorted(map(tuple, g.k_truss(_edges(spark, pairs), k=4, rounds=2).collect()))
    b = sorted(map(tuple, g.k_truss(_edges(spark, pairs), k=4, rounds=5).collect()))
    assert a == b


def test_ktruss_undirected_canonicalization(spark):
    # reversed/duplicate edges collapse to the canonical a<b form
    pairs = [(2, 1), (1, 2), (3, 1), (1, 4), (3, 2), (4, 2), (4, 3)]
    out = g.k_truss(_edges(spark, pairs), k=4, rounds=2).collect()
    assert sorted((r["src"], r["dst"]) for r in out) == [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    with pytest.raises(ValueError):
        g.k_truss(_edges(spark, pairs), k=2)


def test_shortest_paths_random_graphs_vs_python(spark):
    """Randomized (fixed-seed) cross-check against a Python
    hop-bounded Bellman-Ford on small digraphs."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 12
        edges = [
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}", rng.randrange(1, 6))
            for _ in range(30)
        ]
        edges = [(u, v, w) for u, v, w in edges if u != v]
        seeds_py = ["n0", "n1"]
        k = 4
        # python reference: dist over paths with <= k edges
        dist = {s: 0 for s in seeds_py}
        for _ in range(k):
            nxt = dict(dist)
            for u, v, w in edges:
                if u in dist and dist[u] + w < nxt.get(v, 1 << 60):
                    nxt[v] = dist[u] + w
            dist = nxt
        got = {
            r["node"]: r["dist"]
            for r in g.shortest_paths(
                _wedges(spark, edges),
                _seeds(spark, seeds_py),
                max_hops=k,
            ).collect()
        }
        assert got == dist, seed


def test_graph_metrics_reference_values(spark):
    """K4 plus a pendant edge: every metric hand-computable."""
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    r = g.graph_metrics(_edges(spark, pairs)).first()
    assert r["n_nodes"] == 5 and r["n_edges"] == 7
    assert r["avg_degree_r"] == round(14 / 5, 6)
    # triangles: 4 in K4; wedges: deg 3,3,3,4,1 -> sum d(d-1)/2 = 3+3+3+6+0 = 15
    assert r["clustering_r"] == round(3 * 4 / 15, 6)
    # star-heavy pendant -> disassortative
    assert r["assortativity_r"] < 0


def test_graph_metrics_matches_networkx_style_python(spark):
    import itertools
    import math
    import random

    rng = random.Random(5)
    pairs = {tuple(sorted(rng.sample(range(10), 2))) for _ in range(18)}
    pairs = sorted(pairs)
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    tri = sum(
        1 for x, y, z in itertools.combinations(sorted(deg), 3)
        if ((x, y) in pairs and (y, z) in pairs and (x, z) in pairs)
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    xs = [deg[u] for u, v in pairs] + [deg[v] for u, v in pairs]
    ys = [deg[v] for u, v in pairs] + [deg[u] for u, v in pairs]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    r_assort = (m * sxy - sx * sy) / math.sqrt(
        float(m * sxx - sx * sx) * float(m * syy - sy * sy)
    )
    got = g.graph_metrics(_edges(spark, pairs)).first()
    assert got["n_nodes"] == len(deg) and got["n_edges"] == len(pairs)
    assert got["clustering_r"] == round(3 * tri / wedges, 6)
    assert abs(got["assortativity_r"] - round(r_assort, 6)) <= 1e-6


# -------------------------------------------------- betweenness


def _brandes_reference(edges, seeds, max_hops):
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    bc = defaultdict(float)
    for s in seeds:
        depth, sigma, levels = {s: 0}, {s: 1}, [[s]]
        for d in range(1, max_hops + 1):
            nxt = defaultdict(int)
            for u in levels[-1]:
                for w in adj[u]:
                    if w not in depth:
                        nxt[w] += sigma[u]
            if not nxt:
                break
            levels.append(sorted(nxt))
            for w, sg in nxt.items():
                depth[w], sigma[w] = d, sg
        delta = defaultdict(float)
        for d in range(len(levels) - 1, 0, -1):
            for u in levels[d - 1]:
                acc = sum(
                    sigma[u] / sigma[w] * (1 + delta[w])
                    for w in adj[u]
                    if depth.get(w) == d
                )
                if acc:
                    delta[u] += acc
        for v in depth:
            if v != s:
                bc[v] += delta.get(v, 0.0)
            bc.setdefault(v, 0.0) if v != s else None
        for v in depth:
            if v != s:
                bc.setdefault(v, 0.0)
    return dict(bc)


def test_betweenness_path_graph_exact(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    seeds = spark.createDataFrame([(x,) for x in "abcd"], ["node"])
    got = {r["node"]: r["betweenness_r"]
           for r in g.betweenness_sampled(e, seeds, max_hops=3).collect()}
    # both directions counted (each unordered pair from both endpoints):
    # b and c each bridge (a,c),(a,d) resp. (b,d),(a,d) -> 4.0
    assert got == {"a": 0.0, "b": 4.0, "c": 4.0, "d": 0.0}


def test_betweenness_random_graphs_vs_reference(spark):
    import random

    for seed in (3, 11, 42):
        rng = random.Random(seed)
        pairs = sorted({tuple(sorted(rng.sample(range(9), 2))) for _ in range(14)})
        seeds_l = [0, 1, 2]
        ref = _brandes_reference(pairs, seeds_l, 3)
        e = _edges(spark, pairs)
        sdf = spark.createDataFrame([(x,) for x in seeds_l], ["node"])
        got = {r["node"]: r["betweenness_r"]
               for r in g.betweenness_sampled(e, sdf, max_hops=3).collect()}
        assert set(got) == set(ref), seed
        for k in ref:
            assert abs(got[k] - round(ref[k], 6)) <= 1e-6, (seed, k)


def test_betweenness_hop_bound_limits_paths(spark):
    # path a-b-c-d-e with max_hops=2: from seed a only b,c reachable;
    # b bridges (a,c) once
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["betweenness_r"]
           for r in g.betweenness_sampled(e, seeds, max_hops=2).collect()}
    assert got == {"b": 1.0, "c": 0.0}


def test_weighted_pagerank_uniform_equals_plain(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)])
    ew = e.select("src", "dst", F.lit(1).alias("w"))
    a = {r["node"]: r["rank"] for r in g.pagerank(e, iters=4).collect()}
    b = {r["node"]: r["rank"] for r in g.weighted_pagerank(ew, iters=4).collect()}
    assert a == b


def test_weighted_pagerank_weight_proportional(spark):
    # 1 -> 2 (w 9) vs 1 -> 3 (w 1): 2 gets ~9x node 3's inflow share
    ew = spark.createDataFrame([(1, 2, 9), (1, 3, 1)], ["src", "dst", "w"])
    r = {x["node"]: x["rank"] for x in g.weighted_pagerank(ew, iters=3).collect()}
    assert r[2] > r[3]
    # mass conserved
    assert abs(sum(r.values()) - 1.0) < 1e-9


def test_weighted_pagerank_parallel_edges_sum(spark):
    one = spark.createDataFrame([(1, 2, 3)], ["src", "dst", "w"])
    split = spark.createDataFrame([(1, 2, 1), (1, 2, 2)], ["src", "dst", "w"])
    a = sorted(map(tuple, g.weighted_pagerank(one, iters=2).collect()))
    b = sorted(map(tuple, g.weighted_pagerank(split, iters=2).collect()))
    assert a == b


def test_weighted_pagerank_mass_conserved_random(spark):
    import math
    import random

    for seed in (2, 17):
        rng = random.Random(seed)
        rows = [
            (rng.randrange(8), rng.randrange(8), rng.randrange(1, 7))
            for _ in range(20)
        ]
        rows = [(u, v, w) for u, v, w in rows if u != v]
        e = spark.createDataFrame(rows, "src long, dst long, w long")
        r = [x["rank"] for x in g.weighted_pagerank(e, iters=4).collect()]
        assert math.isclose(sum(r), 1.0, rel_tol=1e-9), seed
        assert all(x > 0 for x in r)


def test_harmonic_closeness_path_graph(spark):
    # path a-b-c-d, seeds {a, d}, hops 3:
    # H(b) = 1 + 1/2 = 1.5 (1 hop from a, 2 from d); symmetric for c;
    # endpoints see only the far seed at 3 hops -> 1/3
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    seeds = spark.createDataFrame([("a",), ("d",)], ["node"])
    got = sorted(
        map(tuple, g.harmonic_closeness_sampled(e, seeds, 3).collect())
    )
    assert got == [("a", 0.333333), ("b", 1.5), ("c", 1.5), ("d", 0.333333)]


def test_harmonic_closeness_disconnection_robust(spark):
    # two components: unreachable pairs contribute 0, no infinities
    e = _edges(spark, [("a", "b"), ("x", "y")])
    seeds = spark.createDataFrame([("a",), ("x",)], ["node"])
    got = {r["node"]: r["harmonic_r"]
           for r in g.harmonic_closeness_sampled(e, seeds, 3).collect()}
    assert got == {"b": 1.0, "y": 1.0}


# ---------------------------------------------------------------------------
# HyperBall (round 5)
# ---------------------------------------------------------------------------

def test_hyperball_neighbourhood_function_grows_and_saturates(spark):
    from json_ld_spark.operators.graphops import effective_diameter, hyperball

    # path a-b-c-d: diameter 3; N(t) strictly grows until t=3
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    rows = hyperball(e, max_t=3, p=6).collect()
    byt = {r["t"]: r for r in rows}
    assert sorted(byt) == [0, 1, 2, 3]
    n = [byt[t]["npairs_r"] for t in range(4)]
    assert n[0] < n[1] < n[2] < n[3]
    # registers only fill: zero-register mass decreases, scaled
    # harmonic mass decreases (both integer-exact)
    for t in range(3):
        assert byt[t + 1]["sum_n_zero"] <= byt[t]["sum_n_zero"]
        assert byt[t + 1]["sum_s_scaled"] <= byt[t]["sum_s_scaled"]
    # t=0: every ball is {v} — exactly one register set per node
    m = 64
    assert byt[0]["sum_n_zero"] == 4 * (m - 1)
    assert effective_diameter(rows) in (2, 3)  # ~90% mass by t>=2


def test_hyperball_clique_saturates_at_one_hop(spark):
    from json_ld_spark.operators.graphops import effective_diameter, hyperball

    nodes = [f"n{i}" for i in range(5)]
    e = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a < b], ["src", "dst"]
    )
    rows = hyperball(e, max_t=2, p=6).collect()
    byt = {r["t"]: r for r in rows}
    # B(v,1) is already the whole clique: rounds 1 and 2 identical
    assert byt[1]["sum_s_scaled"] == byt[2]["sum_s_scaled"]
    assert byt[1]["npairs_r"] == byt[2]["npairs_r"]
    assert effective_diameter(rows) == 1


def test_hyperball_empty_graph(spark):
    from json_ld_spark.operators.graphops import hyperball

    e = spark.createDataFrame([], "src string, dst string")
    rows = hyperball(e, max_t=1, p=6).collect()
    assert [(r["t"], r["npairs_r"]) for r in sorted(rows)] == [(0, 0.0), (1, 0.0)]


# -------------------------------------------------------- modularity


def test_modularity_hand_computed(spark):
    # two triangles bridged by one edge; node 6 unlabeled
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)])
    labels = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")], ["node", "label"]
    )
    rows = {r["community"]: r for r in g.modularity(e, labels).collect()}
    # m = 7; a: in=3, d=7 -> 3/7 - (7/14)^2; b: in=1, d=5; _unlabeled: deg 2
    assert rows["a"]["n_nodes"] == 3
    assert rows["a"]["in_edges"] == 3
    assert rows["a"]["degree_sum"] == 7
    assert rows["a"]["q_contrib_r"] == pytest.approx(3 / 7 - 0.25, abs=1e-6)
    assert rows["b"]["in_edges"] == 1
    assert rows["b"]["degree_sum"] == 5
    assert rows["b"]["q_contrib_r"] == pytest.approx(
        1 / 7 - (5 / 14) ** 2, abs=1e-6
    )
    assert rows["_unlabeled"]["n_nodes"] == 1
    assert rows["_unlabeled"]["in_edges"] == 0
    assert rows["_unlabeled"]["q_contrib_r"] == pytest.approx(
        -((2 / 14) ** 2), abs=1e-6
    )


def test_modularity_single_community_is_zero(spark):
    # the whole graph in one community: Q = m/m - (2m/2m)^2 = 0
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    labels = spark.createDataFrame(
        [(i, "all") for i in range(1, 5)], ["node", "label"]
    )
    [row] = g.modularity(e, labels).collect()
    assert row["community"] == "all"
    assert row["q_contrib_r"] == pytest.approx(0.0, abs=1e-6)


def test_modularity_empty_edges(spark):
    e = spark.createDataFrame([], "src long, dst long")
    labels = spark.createDataFrame([(1, "a")], ["node", "label"])
    assert g.modularity(e, labels).count() == 0


# ------------------------------------------------------- louvain move


def test_louvain_move_hand_computed(spark):
    # triangle {1,2,3}='a' + pendant 4='b' on 3; m=4. Moving 3 to b
    # (gain 2m*1 - 3*1 = 5) beats staying (2m*2 - 3*(7-3) = 4); 4
    # joins a (gain 8-7=1 beats staying 0). 1 and 2 stay.
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    lab = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b")], ["node", "label"]
    )
    out = {
        r["node"]: (r["old_label"], r["new_label"], r["moved"])
        for r in g.louvain_move(e, lab).collect()
    }
    assert out == {
        1: ("a", "a", False),
        2: ("a", "a", False),
        3: ("a", "b", True),
        4: ("b", "a", True),
    }


def test_louvain_move_matches_bruteforce(spark):
    # deterministic pseudo-random graph; half the nodes pre-labeled
    edges = sorted({
        (min(a, b), max(a, b))
        for a, b in (
            ((i * 7 + 3) % 13, (i * 11 + 5) % 13) for i in range(40)
        )
        if a != b
    })
    labels = [(n, f"c{n % 2}") for n in range(13) if n % 3 == 0]
    e = _edges(spark, edges)
    lab = spark.createDataFrame(labels, ["node", "label"])
    got = {
        r["node"]: r["new_label"] for r in g.louvain_move(e, lab).collect()
    }

    # pure-python replay of the synchronized move rule
    from collections import Counter, defaultdict

    und = defaultdict(set)
    for u, v in edges:
        und[u].add(v)
        und[v].add(u)
    m = len(edges)
    k = {n: len(vs) for n, vs in und.items()}
    lmap = dict(labels)
    comm = {n: lmap.get(n, f"_n{n}") for n in und}
    tot = Counter()
    for n in und:
        tot[comm[n]] += k[n]
    expected = {}
    for i in und:
        k_ic = Counter(comm[j] for j in und[i])
        cands = set(k_ic) | {comm[i]}
        best = max(
            cands,
            key=lambda c: (
                2 * m * k_ic.get(c, 0)
                - k[i] * (tot[c] - (k[i] if c == comm[i] else 0)),
                c == comm[i],
                # ASC label tie-break -> invert for max()
                tuple(-ord(ch) for ch in c),
            ),
        )
        expected[i] = best
    assert got == expected


# ----------------------------------------------------- local_clustering

def test_local_clustering_triangle_plus_pendant(spark):
    # triangle 1-2-3 plus pendant 4 hanging off 1:
    # node 1: deg 3, tri 1, lcc = 2*1/(3*2) = 0.333333
    # nodes 2,3: deg 2, tri 1, lcc = 1.0 ; node 4: deg 1, lcc = 0
    from json_ld_spark.operators.graphops import local_clustering

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "src long, dst long"
    )
    got = {r.node: (r.deg, r.n_triangles, r.lcc_r)
           for r in local_clustering(e).collect()}
    assert got == {
        1: (3, 1, 0.333333),
        2: (2, 1, 1.0),
        3: (2, 1, 1.0),
        4: (1, 0, 0.0),
    }


def test_local_clustering_duplicate_and_reversed_edges_collapse(spark):
    from json_ld_spark.operators.graphops import local_clustering

    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1)],
        "src long, dst long",
    )
    got = {r.node: (r.deg, r.n_triangles, r.lcc_r)
           for r in local_clustering(e).collect()}
    assert got == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_local_clustering_empty(spark):
    from json_ld_spark.operators.graphops import local_clustering

    e = spark.createDataFrame([], "src long, dst long")
    assert local_clustering(e).count() == 0


# ------------------------------------------------------------ ppmi_edges

def test_ppmi_edges_hand_computed(spark):
    import math

    from json_ld_spark.operators.graphops import ppmi_edges

    # edges: (a,b,n=3), (a,c,n=1) -> D = 2*(3+1) = 8
    # m_a = 4, m_b = 3, m_c = 1
    # ppmi(a,b) = max(0, ln(3*8/(4*3))) = ln(2) ; ppmi(a,c) = ln(8/4) = ln(2)
    cooc = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], "u string, v string, n_groups long"
    )
    got = {(r.u, r.v): (r.n, r.ppmi_r) for r in ppmi_edges(cooc).collect()}
    ln2 = round(math.log(2.0), 6)
    assert got == {("a", "b"): (3, ln2), ("a", "c"): (1, ln2)}


def test_ppmi_negative_association_clamps_to_zero(spark):
    from json_ld_spark.operators.graphops import ppmi_edges

    # hub h touches everything: pair (h,x) with small n relative to the
    # marginals gets PMI < 0 -> clamped to 0 (the "positive" in PPMI)
    cooc = spark.createDataFrame(
        [("h", "x", 1), ("h", "y", 9), ("x", "y", 9)],
        "u string, v string, n_groups long",
    )
    got = {(r.u, r.v): r.ppmi_r for r in ppmi_edges(cooc).collect()}
    # D = 38, m_h = 10, m_x = 10: pmi(h,x) = ln(38/100) < 0 -> 0.0
    assert got[("h", "x")] == 0.0
    assert got[("h", "y")] > 0.0 and got[("x", "y")] > 0.0


def test_ppmi_empty(spark):
    from json_ld_spark.operators.graphops import ppmi_edges

    cooc = spark.createDataFrame([], "u string, v string, n_groups long")
    assert ppmi_edges(cooc).count() == 0


# ------------------------------------------------- WL refinement


def test_wl_distinguishes_path_positions(spark):
    # path 1-2-3-4-5: round 0 separates ends (deg 1) from middles
    # (deg 2); round 2 separates node 3 (two deg-2 neighbors) from
    # nodes 2/4 (one deg-1, one deg-2 neighbor)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    out = {r["node"]: r for r in g.wl_refinement(e, rounds=2).collect()}
    assert out[1]["wl_color"] == out[5]["wl_color"]
    assert out[2]["wl_color"] == out[4]["wl_color"]
    assert out[3]["wl_color"] != out[2]["wl_color"]
    assert out[1]["wl_color"] != out[2]["wl_color"]
    assert out[1]["class_size"] == 2
    assert out[2]["class_size"] == 2
    assert out[3]["class_size"] == 1


def test_wl_symmetric_graphs_get_identical_histograms(spark):
    # two disjoint copies of the same triangle-with-pendant gadget:
    # corresponding nodes must share colors (WL is isomorphism-
    # invariant), so every class size doubles
    gadget = [(1, 2), (2, 3), (1, 3), (3, 4)]
    copy = [(u + 100, v + 100) for u, v in gadget]
    out = g.wl_refinement(_edges(spark, gadget + copy), rounds=2).collect()
    by_node = {r["node"]: r["wl_color"] for r in out}
    for u in (1, 2, 3, 4):
        assert by_node[u] == by_node[u + 100]
    assert all(r["class_size"] % 2 == 0 for r in out)


def test_wl_regular_graph_stays_monochrome(spark):
    # a 4-cycle is 2-regular and vertex-transitive: 1-WL can never
    # split it — one color class of size 4 after any round count
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    out = g.wl_refinement(e, rounds=3).collect()
    assert len({r["wl_color"] for r in out}) == 1
    assert all(r["class_size"] == 4 for r in out)


# ---------------------------------------------- neighbor sampling


def test_neighbor_sample_respects_fanouts(spark):
    # star: hub 0 with 10 leaves; root 0 keeps exactly 3 at hop 1,
    # each sampled leaf has only the hub back-edge at hop 2
    e = _edges(spark, [(0, i) for i in range(1, 11)])
    out = g.neighbor_sample(e, fanouts=(3, 2), seed="t").collect()
    h1 = [r for r in out if r["root"] == 0 and r["hop"] == 1]
    h2 = [r for r in out if r["root"] == 0 and r["hop"] == 2]
    assert len(h1) == 3
    assert {r["parent"] for r in h1} == {0}
    # each hop-1 child's only neighbor is the hub
    assert {(r["parent"], r["child"]) for r in h2} == {
        (r["child"], 0) for r in h1
    }


def test_neighbor_sample_deterministic_and_edge_subset(spark):
    e = _edges(spark, [(i, j) for i in range(6) for j in range(i + 1, 6)])
    a = sorted(map(tuple, g.neighbor_sample(e, (2, 2), seed="s").collect()))
    b = sorted(map(tuple, g.neighbor_sample(e, (2, 2), seed="s").collect()))
    assert a == b
    edge_set = {(i, j) for i in range(6) for j in range(6) if i != j}
    assert all((r[2], r[3]) in edge_set for r in a)
    # a different seed picks a different (still valid) sample somewhere
    c = sorted(map(tuple, g.neighbor_sample(e, (2, 2), seed="x").collect()))
    assert a != c


def test_neighbor_sample_root_filter(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    out = g.neighbor_sample(
        e, fanouts=(2,), root_filter=lambda c: c % 2 == 0, seed=""
    ).collect()
    assert {r["root"] for r in out} == {2, 4}
    assert all(r["hop"] == 1 for r in out)


# ------------------------------------------------------- SCC


def _tarjan(edges):
    """Reference SCC: iterative Tarjan over an adjacency dict.
    Returns {node: min node id of its SCC}."""
    adj = {}
    nodes = set()
    for s, d in edges:
        nodes.add(s)
        nodes.add(d)
        if s != d:
            adj.setdefault(s, []).append(d)
    index, low, onstack, stack = {}, {}, set(), []
    sccs, counter = [], [0]
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                onstack.add(v)
            recurse = False
            kids = adj.get(v, [])
            for i in range(pi, len(kids)):
                w = kids[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(comp)
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    out = {}
    for comp in sccs:
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def _scc_spark(spark, pairs):
    out = g.strongly_connected_components(_edges(spark, pairs))
    return {r["node"]: r["scc"] for r in out.collect()}


def test_scc_two_cycles_bridged_by_dag_edge(spark):
    # 1->2->3->1 and 10->11->10, bridged 3->10: two SCCs, no merge
    pairs = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10), (3, 10)]
    assert _scc_spark(spark, pairs) == _tarjan(pairs)


def test_scc_pure_dag_chain_all_singletons(spark):
    # descending chain is the naive-peel worst case; coloring does it
    # in one outer round — every node its own SCC
    pairs = [(i + 1, i) for i in range(1, 30)]
    got = _scc_spark(spark, pairs)
    assert got == {v: v for v in range(1, 31)}


def test_scc_cycle_through_smaller_outside_node(spark):
    # 5->6->7->5 with 1->5 and 7->2: node 1's color floods the cycle
    # but 1 is not in it — the class-restricted backward pass must
    # exclude it (regression guard for color!=scc)
    pairs = [(5, 6), (6, 7), (7, 5), (1, 5), (7, 2)]
    assert _scc_spark(spark, pairs) == _tarjan(pairs)


def test_scc_nested_cycles_random_graphs_vs_tarjan(spark):
    import random

    for seed in (7, 99):
        rng = random.Random(seed)
        n = 26
        pairs = sorted(
            {
                (rng.randrange(1, n + 1), rng.randrange(1, n + 1))
                for _ in range(70)
            }
        )
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _scc_spark(spark, pairs) == _tarjan(pairs), seed


def test_scc_empty_and_self_loop_only(spark):
    import pyspark.sql.types as T

    empty = spark.createDataFrame(
        [], T.StructType(
            [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
        )
    )
    out = g.strongly_connected_components(empty)
    assert out is None or out.count() == 0
