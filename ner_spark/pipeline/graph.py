"""Graph analytics over the co-mention entity graph.

Beyond the reference (which stops at emission): degree centrality and
PageRank over the weighted undirected co-mention edges — the standard
first asks of a constructed KG.  PageRank is the iterative-join shape
(score join edges, aggregate contributions, damping update); at scale each
round is one shuffle on entity id, and ``localCheckpoint`` truncates plan
growth the same way the CC loop does (pipeline/cc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def degree_centrality(edges: DataFrame, src: str = "subj",
                      dst: str = "obj",
                      weight: str | None = "weight") -> DataFrame:
    """(node, degree, weighted_degree) over undirected edges."""
    w = F.col(weight) if weight else F.lit(1)
    sym = edges.select(F.col(src).alias("node"), w.alias("w")).unionByName(
        edges.select(F.col(dst).alias("node"), w.alias("w")))
    return sym.groupBy("node").agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum("w").alias("weighted_degree"))


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge canonicalization shared by every graph operator:
    drop self-loops, order endpoints (u < v), collapse duplicates and
    reversals.  One place, so null/ordering fixes cannot diverge."""
    return (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .filter("u <> v")
            .select(F.least("u", "v").alias("u"),
                    F.greatest("u", "v").alias("v"))
            .distinct())


def triangle_count(edges: DataFrame, src: str = "subj",
                   dst: str = "obj") -> DataFrame:
    """(node, triangles): how many triangles each node participates in,
    over the undirected graph (self-loops dropped, duplicate / reversed
    edges collapsed).  Nodes in no triangle are absent.

    Degree-ordered ("compact-forward") enumeration: every edge is
    oriented from its lower-(degree, id) endpoint to the higher, wedges
    are generated only at each triangle's minimum vertex in that order,
    and a triangle is closed by probing the single oriented edge between
    the two out-neighbors.  Total wedge work is O(m^1.5) regardless of
    hub skew — a degree-D hub generates no wedges unless both neighbors
    out-rank it — vs Θ(Σ deg²) for naive id-ordering, which melts on the
    celebrity entities a co-mention graph always has.  Plan: one degree
    agg + two shuffle equi-joins + one agg; no iteration, no driver
    collect.  The per-node counts are invariant to the orientation used,
    so the DuckDB oracle uses plain id ordering.

    The canonical edge list and its orientation are ``persist()``-ed:
    both are referenced by several joins below, and without a cache each
    reference recomputes the (possibly expensive) upstream that produced
    the edges — at any scale the edge list is the thing to materialize
    once (it is KB-sized next to the corpus).  The per-node result is
    finalized with ``localCheckpoint`` (executor-side, no driver pull)
    and the caches are unpersisted before returning — repeated
    invocations over distinct upstreams (e.g. a bench loop) do not
    accumulate executor storage (kcore/LPA hygiene).
    """
    e = _canonical_edges(edges, src, dst).persist()
    res, oriented = _triangles_canonical(e)
    out = res.localCheckpoint()
    oriented.unpersist()
    e.unpersist()
    return out


def _triangles_canonical(e: DataFrame):
    """Core of :func:`triangle_count` over an ALREADY canonical (and
    ideally persisted) (u, v) edge list — shared with
    :func:`clustering_coefficient` so it does not pay a second
    canonicalization shuffle and cache copy.  Returns ``(result,
    oriented)``; the caller must materialize the result before
    unpersisting the ``oriented`` cache."""
    deg = (e.select(F.col("u").alias("node"))
           .unionByName(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
    ed = (e.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")),
                 "u")
          .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")),
                "v"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi")) \
        .persist()
    wedges = (oriented.alias("x")
              .join(oriented.alias("y"), F.col("x.hi") == F.col("y.lo"))
              .select(F.col("x.lo").alias("a"), F.col("x.hi").alias("b"),
                      F.col("y.hi").alias("c")))
    tri = wedges.join(
        oriented.select(F.col("lo").alias("a"), F.col("hi").alias("c")),
        ["a", "c"])
    return (tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
            .groupBy("node").agg(F.count(F.lit(1)).alias("triangles")),
            oriented)


def clustering_coefficient(edges: DataFrame, src: str = "subj",
                           dst: str = "obj") -> DataFrame:
    """(node, degree, triangles, coefficient): local clustering
    coefficient triangles / C(degree, 2) per node — how clique-like each
    entity's co-mention neighborhood is (near 1: a tight story cluster;
    near 0: a hub bridging unrelated contexts).  Degree-1 nodes have no
    wedge and are reported with coefficient 0.0 like the zero-triangle
    ones.  Reuses :func:`triangle_count` (same O(m^1.5) plan) plus one
    degree agg and a left join; the division is one IEEE double op on
    longs, so the DuckDB oracle hash-matches bit-exactly."""
    e = _canonical_edges(edges, src, dst).persist()
    deg = (e.select(F.col("u").alias("node"))
           .unionByName(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    tri, oriented = _triangles_canonical(e)
    res = (deg.join(tri, "node", "left")
           .select("node", "degree",
                   F.coalesce("triangles", F.lit(0)).alias("triangles"))
           .withColumn(
               "coefficient",
               F.when(F.col("degree") < 2, F.lit(0.0)).otherwise(
                   F.col("triangles").cast("double")
                   / (F.col("degree") * (F.col("degree") - 1) / 2)
                   .cast("double"))))
    out = res.localCheckpoint()  # materialize, then release the caches
    oriented.unpersist()
    e.unpersist()
    return out


def neighborhood_similarity(edges: DataFrame, threshold: float = 0.5,
                            src: str = "subj",
                            dst: str = "obj") -> DataFrame:
    """(e1, e2, shared, uni, jaccard): entity pairs whose co-mention
    neighborhoods overlap with Jaccard ≥ ``threshold`` — the graph-context
    signal for duplicate / conflatable KG entities (two ids that always
    co-occur with the same third parties are usually one entity).

    EXACT under the threshold, with prefix-filtered candidate generation
    (the PPJoin/AllPairs device, Bayardo et al., WWW'07): each node's
    neighbor list is ordered by ascending global neighbor degree
    (rarest-first) and only its first ``d - ceil(t*d) + 1`` neighbors may
    emit candidate pairs — any pair meeting the threshold must share a
    token inside both prefixes, so no qualifying pair is lost, while a
    degree-D celebrity neighbor sitting outside prefixes generates none
    of its Θ(D²) wedges.  Verification joins the candidates back to the
    full adjacency sets and computes the exact intersection; jaccard =
    shared/(d1+d2-shared) is one IEEE double division on long operands,
    bit-identical in Spark and DuckDB, so the exhaustive SQL oracle
    hash-matches.  Adjacency sets are per-node ``collect_set`` rows —
    bounded by the max co-mention degree (KB-sized, not corpus-sized);
    at true web scale cap or hub-split them before this operator.
    """
    e = _canonical_edges(edges, src, dst)
    # the symmetric adjacency is read by three consumers (degree count,
    # prefix ranking, adjacency sets) — persist so the upstream that
    # produced the edges runs once, not per consumer (KB-sized cache)
    sym = (e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
           .unionByName(e.select(F.col("v").alias("node"),
                                 F.col("u").alias("nbr")))).persist()
    nbr_deg = sym.groupBy(F.col("nbr")).agg(F.count(F.lit(1)).alias("nd"))
    ranked = (
        sym.join(nbr_deg, "nbr")
        .withColumn("pos", F.row_number().over(
            Window.partitionBy("node").orderBy("nd", "nbr")))
        .withColumn("d", F.count(F.lit(1)).over(Window.partitionBy("node")))
    )
    # prefix length d - ceil(t*d) + 1; any pair with jaccard >= t shares
    # >= t/(1+t)*(d1+d2) >= t*max(d1,d2) neighbors, so its first common
    # token (in the global rarest-first order) lies in both prefixes.
    # The epsilon guards IEEE round-up on non-dyadic thresholds
    # (0.7*10 == 7.000000000000001 → ceil 8 would shorten the prefix and
    # silently drop qualifying pairs); a one-longer prefix only adds
    # candidates, which the exact verify below filters.
    prefix = ranked.filter(
        F.col("pos") <= F.col("d")
        - F.ceil(F.lit(threshold) * F.col("d") - F.lit(1e-9)) + 1
    ).persist()  # self-joined below: two references
    cands = (prefix.alias("a").join(prefix.alias("b"), "nbr")
             .filter(F.col("a.node") < F.col("b.node"))
             .select(F.col("a.node").alias("e1"),
                     F.col("b.node").alias("e2"))
             .distinct())
    adj = sym.groupBy("node").agg(
        F.collect_set("nbr").alias("nbrs"),
        F.count(F.lit(1)).alias("deg")).persist()  # joined twice below
    verified = (
        cands
        .join(adj.select(F.col("node").alias("e1"),
                         F.col("nbrs").alias("n1"),
                         F.col("deg").alias("d1")), "e1")
        .join(adj.select(F.col("node").alias("e2"),
                         F.col("nbrs").alias("n2"),
                         F.col("deg").alias("d2")), "e2")
        .select("e1", "e2",
                F.size(F.array_intersect("n1", "n2")).cast("long")
                .alias("shared"),
                (F.col("d1") + F.col("d2")).alias("dsum"))
        .select("e1", "e2", "shared",
                (F.col("dsum") - F.col("shared")).alias("uni"))
        .withColumn("jaccard",
                    F.col("shared").cast("double")
                    / F.col("uni").cast("double"))
        .filter(F.col("jaccard") >= threshold)
    )
    out = verified.localCheckpoint()  # materialize, then drop the caches
    adj.unpersist()
    prefix.unpersist()
    sym.unpersist()
    return out


def kcore(edges: DataFrame, k: int = 3, src: str = "subj",
          dst: str = "obj", driver_threshold: int = 2_000_000) -> DataFrame:
    """(node, degree): the maximal subgraph where every node keeps degree
    ≥ k — the standard prune of a noisy co-mention KG (spurious entities
    and their one-off edges peel away; dense, repeatedly-co-mentioned
    cores remain).  Degree reported WITHIN the k-core subgraph.

    Peeling is an iterative fixpoint (remove deg<k nodes, recompute,
    repeat), so no single SQL oracle exists — verified against a pure
    Python peel in tests/test_graph.py.  Hybrid like
    :func:`pagerank` / the CC loop: edge sets under ``driver_threshold``
    peel driver-side (the co-mention graph is KB-sized next to the
    corpus); larger graphs run the distributed loop — each round one
    degree agg + one semi-join filter, ``localCheckpoint`` truncating
    lineage.  Round count is bounded by the peel depth (≤ max coreness
    shells, in practice a handful), not by graph size."""
    e = _canonical_edges(edges, src, dst)
    spark = edges.sparkSession
    if driver_threshold:
        # parallel probe + Arrow gather from cache (cc.py pattern): never
        # a single-task CollectLimit funnel, never an unbounded pull
        e = e.persist()
        if e.count() <= driver_threshold:
            pdf = e.toPandas()
            pairs = list(zip(pdf["u"].to_list(), pdf["v"].to_list()))
            e.unpersist()
            adj: dict = {}
            for a, b in pairs:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            frontier = [n for n, nb in adj.items() if len(nb) < k]
            while frontier:
                nxt = []
                for n in frontier:
                    for nb in adj.pop(n, ()):  # detach n from survivors
                        s = adj.get(nb)
                        if s is not None:
                            s.discard(n)
                            if len(s) == k - 1:  # just dropped below k
                                nxt.append(nb)
                frontier = nxt
            rows = [(str(n), len(nb)) for n, nb in adj.items() if nb]
            return spark.createDataFrame(rows, "node string, degree long") \
                if rows else spark.createDataFrame([],
                                                   "node string, degree long")
    cur = e.localCheckpoint()
    if driver_threshold:
        e.unpersist()  # checkpoint holds the data now (cc.py invariant)
    n_edges = cur.count()
    while True:
        sym = (cur.select(F.col("u").alias("node"))
               .unionByName(cur.select(F.col("v").alias("node"))))
        deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("node").persist()
        nxt = (cur.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
               .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
               .select("u", "v").localCheckpoint())
        keep.unpersist()
        n_next = nxt.count()
        if n_next == n_edges:
            break
        cur, n_edges = nxt, n_next
    sym = (cur.select(F.col("u").cast("string").alias("node"))
           .unionByName(cur.select(F.col("v").cast("string").alias("node"))))
    return sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def label_propagation(edges: DataFrame, n_iter: int = 10,
                      src: str = "subj", dst: str = "obj",
                      driver_threshold: int = 2_000_000) -> DataFrame:
    """(node, community): synchronous label propagation with the
    deterministic min-label tie-break — the cheap community detector for
    a co-mention KG (topic/story clusters without a modularity solver).
    Every node starts as its own label; each round every node adopts the
    most frequent label among its neighbors, ties broken by the SMALLEST
    label so the result is exactly reproducible (plain LPA's random
    tie-break is not).  Fixed ``n_iter`` synchronous rounds (classic LPA
    oscillates on bipartite structures; a fixed budget with deterministic
    ties is the reproducible contract — same statistic both hybrid
    paths).

    Hybrid like :func:`pagerank`: small edge sets run a pure-Python loop
    driver-side; larger graphs run the distributed rounds — each is one
    shuffle (neighbor-label count) + one argmax agg, with
    ``localCheckpoint`` truncating lineage.  Rows-only in the driver
    gate (iterative fixpoint ∉ one SQL query); both paths pinned equal
    in tests/test_graph.py."""
    e = _canonical_edges(edges, src, dst)
    spark = edges.sparkSession
    if driver_threshold:
        e = e.persist()
        if e.count() <= driver_threshold:
            pdf = e.toPandas()
            pairs = list(zip(pdf["u"].to_list(), pdf["v"].to_list()))
            e.unpersist()
            adj: dict = {}
            for a, b in pairs:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            label = {n: n for n in adj}
            for _ in range(n_iter):
                nxt = {}
                for n, nbrs in adj.items():
                    freq: dict = {}
                    for nb in nbrs:
                        lb = label[nb]
                        freq[lb] = freq.get(lb, 0) + 1
                    top = max(freq.values())
                    # min label among the max-frequency ones
                    nxt[n] = min(lb for lb, c in freq.items() if c == top)
                label = nxt
            rows = [(str(n), str(l)) for n, l in sorted(label.items())]
            return spark.createDataFrame(
                rows, "node string, community string") if rows else \
                spark.createDataFrame([], "node string, community string")
    sym = (e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
           .unionByName(e.select(F.col("v").alias("node"),
                                 F.col("u").alias("nbr"))))
    sym = sym.localCheckpoint()
    if driver_threshold:
        e.unpersist()  # checkpoint holds the data now (cc.py invariant)
    labels = sym.select("node").distinct() \
        .withColumn("community", F.col("node")).localCheckpoint()
    for _ in range(n_iter):
        counts = (sym.join(labels.withColumnRenamed("node", "nbr"), "nbr")
                  .groupBy("node", "community")
                  .agg(F.count(F.lit(1)).alias("c")))
        labels = (counts.withColumn(
                      "rk", F.row_number().over(
                          Window.partitionBy("node").orderBy(
                              F.col("c").desc(), F.col("community").asc())))
                  .filter(F.col("rk") == 1)
                  .select("node", "community").localCheckpoint())
    return labels.select(F.col("node").cast("string").alias("node"),
                         F.col("community").cast("string")
                         .alias("community")).orderBy("node")


def _driver_pagerank(spark, pairs: list[tuple[int, int]], n_iter: int,
                     damping: float) -> DataFrame:
    """numpy power iteration — exact same result as the distributed loop,
    for edge sets small enough to collect (mirrors the CC hybrid,
    pipeline/cc.py: the entity graph is KB-sized next to the corpus and
    the join loop's ~3·n_iter Spark stages dominate its runtime there)."""
    import numpy as np

    nodes = sorted({n for p in pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return spark.createDataFrame([], "node long, rank double")
    out_deg = np.zeros(n)
    for a, _ in pairs:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    src_i = np.fromiter((idx[a] for a, _ in pairs), dtype=np.int64,
                        count=len(pairs))
    dst_i = np.fromiter((idx[b] for _, b in pairs), dtype=np.int64,
                        count=len(pairs))
    for _ in range(n_iter):
        contrib = r[src_i] / out_deg[src_i]
        new = np.full(n, (1.0 - damping) / n)
        np.add.at(new, dst_i, damping * contrib)
        r = new
    return spark.createDataFrame(
        [(int(nd), round(float(r[idx[nd]]), 8)) for nd in nodes],
        "node long, rank double")


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             n_iter: int = 10, damping: float = 0.85,
             undirected: bool = True,
             driver_threshold: int = 200_000) -> DataFrame:
    """(node, rank) after ``n_iter`` synchronous power iterations with
    uniform initialization 1/N and dangling-free graphs (undirected
    symmetrization guarantees out-degree ≥ 1 for every node).

    Hybrid like :func:`connected_components`: edge sets under
    ``driver_threshold`` run a numpy power iteration on the driver (same
    result, none of the per-round scheduling latency); larger graphs run
    the distributed join loop.  Deterministic — verified against an
    independent numpy oracle in tests/test_graph.py; the driver
    correctness check is rows-only (a 10-step float fixpoint is not
    expressible as one SQL query)."""
    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst")).filter("src <> dst")
    if undirected:
        e = e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    e = e.distinct()
    if driver_threshold:
        head = e.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            return _driver_pagerank(edges.sparkSession,
                                    [(r.src, r.dst) for r in head],
                                    n_iter, damping)
    e = e.localCheckpoint()
    # nodes from BOTH endpoints: with undirected=False a pure sink has no
    # src row but must still receive rank (keeps the two hybrid paths
    # identical); contributions land via the left join below
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame([], "node long, rank double")
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
             .join(out_deg, "src")
             .select(F.col("dst").alias("node"),
                     (F.col("rank") / F.col("out_deg")).alias("c"))
             .groupBy("node").agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select("node",
                    (F.lit((1.0 - damping) / n)
                     + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0)))
                    .alias("rank"))
            .localCheckpoint()
        )
    return ranks.select("node", F.round("rank", 8).alias("rank"))
