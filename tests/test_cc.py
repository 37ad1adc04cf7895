"""Connected components vs a driver-side union-find oracle."""

import random


def _oracle_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to the minimum label
    return {n: find(n) for n in parent}


def _check(spark, edges):
    from ner_spark.pipeline.cc import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    want = _oracle_components([(a, b) for a, b in edges if a != b])
    # driver union-find fast path
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == want
    # distributed pointer-jumping loop (force it)
    got_d = {r.node: r.component for r in
             connected_components(df, driver_threshold=0).collect()}
    assert got_d == want


def test_cc_simple_chain(spark):
    _check(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])


def test_cc_long_chain_exceeding_one_round(spark):
    _check(spark, [(i, i + 1) for i in range(1, 40)])


def test_cc_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randint(1, 120), rng.randint(1, 120)) for _ in range(180)]
    _check(spark, edges)


def test_cc_self_loops_ignored(spark):
    _check(spark, [(5, 5), (1, 2), (2, 2)])


def test_sameas_redirect_fixture(spark):
    """J10 end-to-end on the redirect fixture: chains compress to the
    minimum id, a multi-redirect joins clusters, dangling redirects
    produce no edge/row."""
    from ner_spark.fixtures.redirects import redirect_rows
    from ner_spark.kb.build import kb_rows_to_df
    from ner_spark.pipeline.triples import sameas_mapping, sameas_triples

    kb_df = kb_rows_to_df(spark, redirect_rows())
    got = {(r.subj, r.obj) for r in
           sameas_triples(sameas_mapping(kb_df)).collect()}
    assert got == {("e:2", "e:1"), ("e:3", "e:1"), ("e:4", "e:1"),
                   ("e:5", "e:1"), ("e:7", "e:6")}


def test_sameas_type_conflicts(spark):
    """Typed redirect fixture: clusters {1,2} (person+thing) and {5,6,7}
    (person+thing) conflict; {3,4} (location only) must not appear."""
    from ner_spark.fixtures.redirects import typed_rows
    from ner_spark.kb.build import kb_rows_to_df
    from ner_spark.pipeline.triples import sameas_type_conflicts

    got = {r.component: (r.n_nodes, r.n_types, r.types)
           for r in sameas_type_conflicts(
               kb_rows_to_df(spark, typed_rows())).collect()}
    assert got == {"e:1": (2, 2, "person,thing"),
                   "e:5": (3, 2, "person,thing")}
