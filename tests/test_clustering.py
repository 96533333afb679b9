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


def test_star_contraction_matches_fixpoint_on_fixture(spark, sf_dir):
    """Both CC algorithms must produce identical labels on the real
    MinHash candidate pairs (star is the r05 default engine; label-prop
    is the spec variant)."""
    from columnar_aware_dedup_spark.operators.clustering import (
        near_dup_clusters,
        near_dup_clusters_labelprop,
    )

    a = sorted(tuple(r) for r in near_dup_clusters(spark, sf_dir).collect())
    b = sorted(
        tuple(r) for r in near_dup_clusters_labelprop(spark, sf_dir).collect()
    )
    assert a == b


def test_star_contraction_conquers_long_chain(spark):
    """A 120-node path has diameter 119: min-label propagation cannot
    finish within its 50-round budget, while the star contraction labels
    the whole chain as one component in O(log n) rounds — the property
    that makes it the 100 TB variant."""
    import pytest

    from columnar_aware_dedup_spark.operators.clustering import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, on_exhaustion="raise")
    labels = connected_components_star(chain).collect()
    assert len(labels) == 121
    assert {r["cluster_id"] for r in labels} == {0}


def test_labelprop_exhaustion_falls_back_to_star(spark):
    """VERDICT r05 brief #8: by default, round-budget exhaustion must NOT
    RuntimeError — the same 120-node chain that trips the diameter bound
    comes back correctly labeled through the star fallback (after the
    partial-label >= star-label parity assert)."""
    from columnar_aware_dedup_spark.operators.clustering import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(chain).collect()
    }
    assert len(got) == 121
    assert set(got.values()) == {0}


def test_star_contraction_multiple_components_and_pairs(spark):
    """Two disjoint components (a triangle + a pair) label to their own
    minima; no cross-contamination."""
    from columnar_aware_dedup_spark.operators.clustering import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(5, 9), (9, 7), (7, 5), (20, 11)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components_star(edges).collect()
    }
    assert got == {5: 5, 7: 5, 9: 5, 11: 11, 20: 11}


def test_pagerank_matches_reference_power_iteration(spark):
    """Star graph 0-{1,2,3,4} plus a detached pair 10-11: ranks must match
    an independent pure-Python power iteration to 1e-9, and the star
    center must be the canonical argmax."""
    from columnar_aware_dedup_spark.operators.clustering import pagerank

    pairs = [(0, 1), (0, 2), (0, 3), (0, 4), (10, 11)]
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["rank"] for r in pagerank(edges).collect()}

    # reference: same symmetric graph, same schedule
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(10):
        inflow = {v: 0.0 for v in nodes}
        for v in nodes:
            share = r[v] / len(adj[v])
            for u in adj[v]:
                inflow[u] += share
        r = {v: 0.15 / n + 0.85 * inflow[v] for v in nodes}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r[v]) < 1e-9, (v, got[v], r[v])
    assert max(got, key=got.get) == 0  # the star center dominates
