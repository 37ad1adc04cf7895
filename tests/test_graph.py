"""Graph analytics: degree vs hand count, PageRank vs numpy power
iteration (same init, damping, synchronous update)."""

import numpy as np


EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 4)]


def test_degree_centrality(spark):
    from ner_spark.pipeline.graph import degree_centrality

    df = spark.createDataFrame(
        [(f"e:{a}", f"e:{b}", a + b) for a, b in EDGES],
        "subj string, obj string, weight long")
    got = {r.node: (r.degree, r.weighted_degree)
           for r in degree_centrality(df).collect()}
    assert got["e:3"] == (3, (2 + 3) + (3 + 1) + (3 + 4))
    assert got["e:5"] == (1, 9)
    assert sum(d for d, _ in got.values()) == 2 * len(EDGES)


def test_triangle_count_known_graph(spark):
    """K4 on {1..4} plus pendant 5: every K4 node closes C(3,2)=3
    triangles, the pendant closes none (and is absent)."""
    from ner_spark.pipeline.graph import triangle_count

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(
        [(f"e:{a}", f"e:{b}") for a, b in k4 + [(4, 5)]],
        "subj string, obj string")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert got == {f"e:{n}": 3 for n in range(1, 5)}


def test_triangle_count_matches_bruteforce(spark):
    """Random graph vs itertools enumeration; input has duplicate,
    reversed, and self-loop edges to exercise canonicalization."""
    import itertools
    import random

    from ner_spark.pipeline.graph import triangle_count

    rng = random.Random(7)
    edges = {(a, b) for a in range(12) for b in range(12)
             if a < b and rng.random() < 0.35}
    noisy = ([(a, b) for a, b in edges]
             + [(b, a) for a, b in list(edges)[::3]]   # reversed dups
             + [(a, a) for a in range(4)])             # self loops
    df = spark.createDataFrame(
        [(f"e:{a}", f"e:{b}") for a, b in noisy], "subj string, obj string")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == {f"e:{n}": c for n, c in want.items()}


def test_pagerank_matches_numpy(spark):
    from ner_spark.pipeline.graph import pagerank

    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, n_iter=10).collect()}

    # numpy oracle on the symmetrized graph
    nodes = sorted({n for e in EDGES for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    sym = {(a, b) for a, b in EDGES} | {(b, a) for a, b in EDGES}
    out_deg = np.zeros(n)
    for a, _ in sym:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        new = np.full(n, 0.15 / n)
        for a, b in sym:
            new[idx[b]] += 0.85 * r[idx[a]] / out_deg[idx[a]]
        r = new
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 1e-8, node
    assert abs(sum(got.values()) - 1.0) < 1e-6  # stochastic (no dangling)


def test_pagerank_distributed_equals_driver(spark):
    """The hybrid's two paths must agree exactly (same update, same
    rounding) — run the loop with threshold 0 to force the join path."""
    from ner_spark.pipeline.graph import pagerank

    df = spark.createDataFrame(EDGES, "src long, dst long")
    drv = {r.node: r.rank for r in pagerank(df, n_iter=6).collect()}
    dist = {r.node: r.rank
            for r in pagerank(df, n_iter=6, driver_threshold=0).collect()}
    assert drv.keys() == dist.keys()
    for k in drv:
        assert abs(drv[k] - dist[k]) < 1e-8


def test_pagerank_directed_sink_nodes_both_paths(spark):
    """Directed graphs: sinks must receive rank rows on BOTH hybrid
    paths; empty edge sets yield an empty frame, not a crash."""
    from ner_spark.pipeline.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    for thr in (200_000, 0):
        got = {r.node: r.rank
               for r in pagerank(df, n_iter=3, undirected=False,
                                 driver_threshold=thr).collect()}
        assert set(got) == {1, 2}, thr
        assert got[2] > got[1]  # the sink accumulates rank
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, undirected=False, driver_threshold=0).count() == 0
    assert pagerank(empty).count() == 0


def test_neighborhood_similarity_matches_bruteforce(spark):
    """Prefix-filtered candidates + exact verify vs python-set Jaccard at
    several thresholds (completeness of the AllPairs prefix bound)."""
    import random

    from ner_spark.pipeline.graph import neighborhood_similarity

    rng = random.Random(11)
    edges = {(a, b) for a in range(14) for b in range(14)
             if a < b and rng.random() < 0.3}
    df = spark.createDataFrame(
        [(f"e:{a:02d}", f"e:{b:02d}") for a, b in edges],
        "subj string, obj string")

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    for t in (0.25, 0.5, 0.75):
        got = {(r.e1, r.e2): (r.shared, r.uni, r.jaccard)
               for r in neighborhood_similarity(df, t).collect()}
        want = {}
        nodes = sorted(adj)
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                sh = len(adj[a] & adj[b])
                un = len(adj[a] | adj[b])
                if sh and sh / un >= t:
                    want[(f"e:{a:02d}", f"e:{b:02d}")] = (sh, un, sh / un)
        assert got == want, t


def _py_kcore(edges, k):
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for nb in adj.pop(n):
                adj[nb].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items() if nb}


def test_kcore_both_paths_match_python_peel(spark):
    """Driver peel and distributed loop must both equal the reference
    peel, including cascade removals (a chain hanging off a clique peels
    link by link) and the empty-core case."""
    import random

    from ner_spark.pipeline.graph import kcore

    rng = random.Random(3)
    edges = {(a, b) for a in range(16) for b in range(16)
             if a < b and rng.random() < 0.25}
    # a chain hanging off node 0: peels in cascade for k >= 2
    edges |= {(0, 100), (100, 101), (101, 102)}
    df = spark.createDataFrame(
        [(f"e:{a}", f"e:{b}") for a, b in edges], "subj string, obj string")
    for k in (2, 3, 5, 30):
        want = {f"e:{n}": d for n, d in _py_kcore(edges, k).items()}
        for thr in (2_000_000, 0):
            got = {r.node: r.degree
                   for r in kcore(df, k=k, driver_threshold=thr).collect()}
            assert got == want, (k, thr)


def test_clustering_coefficient_known_graph(spark):
    """K4 + pendant: K4 nodes have coef 1.0 except node 4 which also
    links the pendant (deg 4, 3 triangles, C(4,2)=6 wedges -> 0.5); the
    pendant has degree 1 -> 0.0 with zero triangles."""
    from ner_spark.pipeline.graph import clustering_coefficient

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(
        [(f"e:{a}", f"e:{b}") for a, b in k4 + [(4, 5)]],
        "subj string, obj string")
    got = {r.node: (r.degree, r.triangles, r.coefficient)
           for r in clustering_coefficient(df).collect()}
    assert got["e:1"] == (3, 3, 1.0)
    assert got["e:4"] == (4, 3, 0.5)
    assert got["e:5"] == (1, 0, 0.0)


def test_label_propagation_paths_agree_and_find_cliques(spark):
    """Two 4-cliques joined by one bridge edge: deterministic LPA must
    give each clique one community, and the driver and distributed paths
    must agree exactly (same sync update, same min-label tie-break)."""
    from ner_spark.pipeline.graph import label_propagation

    c1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
    edges = c1 + c2 + [(4, 5)]
    df = spark.createDataFrame(
        [(f"e:{a}", f"e:{b}") for a, b in edges], "subj string, obj string")
    drv = {r.node: r.community
           for r in label_propagation(df, n_iter=10).collect()}
    dist = {r.node: r.community
            for r in label_propagation(df, n_iter=10,
                                       driver_threshold=0).collect()}
    assert drv == dist
    assert len({drv[f"e:{n}"] for n in range(1, 4)}) == 1   # clique 1 coheres
    assert len({drv[f"e:{n}"] for n in range(6, 9)}) == 1   # clique 2 coheres
    assert drv["e:1"] != drv["e:8"]                          # two communities
