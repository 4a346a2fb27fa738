"""Connected components: chains, stars, isolated vertices, convergence."""

from __future__ import annotations

from arhivum_spark.operators.connected_components import connected_components


def _cc(spark, n_vertices, edge_list, **kw):
    v = spark.createDataFrame([(i,) for i in n_vertices], "id long")
    e = spark.createDataFrame(edge_list or [(0, 0)], "src long, dst long")
    if not edge_list:
        e = e.limit(0)
    out = connected_components(v, e, **kw).collect()
    return {r["id"]: r["component"] for r in out}

def test_long_chain_converges(spark):
    """A 24-node path graph needs multiple min-label iterations — the
    worst-case diameter shape for label propagation."""
    chain = list(range(24))
    got = _cc(spark, chain, [(i, i + 1) for i in range(23)])
    assert set(got.values()) == {0}


def test_disjoint_stars_and_isolates(spark):
    edges = [(0, i) for i in range(1, 5)] + [(10, i) for i in range(11, 15)]
    got = _cc(spark, list(range(20)), edges)
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in range(10, 15)} == {10}
    for iso in range(5, 10):
        assert got[iso] == iso  # isolated vertices keep their own id


def test_no_edges(spark):
    got = _cc(spark, [3, 7, 9], [])
    assert got == {3: 3, 7: 7, 9: 9}


def test_merging_two_stars_via_bridge(spark):
    edges = [(0, 1), (0, 2), (5, 6), (5, 7), (2, 7)]
    got = _cc(spark, list(range(8)), edges)
    assert {got[i] for i in (0, 1, 2, 5, 6, 7)} == {0}
