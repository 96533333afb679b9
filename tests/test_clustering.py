"""Connected-components clustering goldens (synthetic graphs: the fixture
near-dup graph is too tame to exercise chains and multi-hop transitivity)."""

from __future__ import annotations

from columnar_aware_dedup_spark.operators.clustering import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    return {
        r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()
    }


def test_chain_collapses_transitively(spark):
    """A~B, B~C, C~D: one cluster labeled by the min id, even though A and D
    never share an edge (propagation must run multiple rounds)."""
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    """A 24-node path needs ~log-diameter rounds — must still reach the
    fixpoint, not stop early."""
    edges = [(i, i + 1) for i in range(24)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 25


def test_min_id_direction_irrelevant(spark):
    """Edge orientation must not matter (symmetrized internally)."""
    assert _cc(spark, [(5, 2), (2, 9)]) == {2: 2, 5: 2, 9: 2}
