"""Connected components / dedup clusters (operators/graph.py).

Hand-built graphs with known components: a chain (worst-case diameter
for label propagation), a triangle (cycle), an isolated pair, and
overlapping pairs sharing a hub. The registered x_dedup_clusters query
is oracle-checked by the sweep; these pin the operator itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hephaestus_spark.operators.graph import connected_components, dedup_clusters


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a BIGINT, id_b BIGINT")


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    got = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_reversed_and_duplicate_edges(spark):
    # direction and multiplicity must not matter
    pairs = _pairs(spark, [(2, 1), (1, 2), (3, 2), (3, 1)])
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_dedup_clusters_canonical_flags(spark):
    pairs = _pairs(spark, [(7, 3), (3, 9), (100, 42)])
    out = dedup_clusters(pairs).collect()
    by_doc = {r.doc_id: (r.cluster_id, r.is_canonical) for r in out}
    assert by_doc == {
        3: (3, True), 7: (3, False), 9: (3, False),
        42: (42, True), 100: (42, False),
    }
    # exactly one canonical per cluster
    canon = [r for r in out if r.is_canonical]
    assert sorted(r.cluster_id for r in canon) == [3, 42]


def test_hub_merges_pairs(spark):
    # pairs sharing a hub doc collapse into one cluster
    pairs = _pairs(spark, [(50, 1), (50, 2), (50, 3)])
    out = dedup_clusters(pairs)
    assert out.select(F.countDistinct("cluster_id")).first()[0] == 1
    assert out.filter("is_canonical").first().doc_id == 1


# ---------------------------------------------------------------------------
# PageRank (operators/graph.py::pagerank)
# ---------------------------------------------------------------------------


def test_pagerank_mass_sums_to_one(spark):
    from hephaestus_spark.operators.graph import pagerank

    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4), (10, 11)])
    pr = pagerank(pairs, n_iter=10).toPandas()
    assert abs(pr["rank"].sum() - 1.0) < 1e-9  # teleport preserves mass
    assert (pr["rank"] > 0).all()


def test_pagerank_degree_monotonicity_and_symmetry(spark):
    from hephaestus_spark.operators.graph import pagerank

    # star: hub 0 touches 1..4; leaves are symmetric
    pairs = _pairs(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    pr = {r.id: r["rank"] for r in pagerank(pairs, n_iter=20).collect()}
    leaves = [pr[i] for i in (1, 2, 3, 4)]
    assert max(leaves) - min(leaves) < 1e-12  # symmetric nodes tie
    assert pr[0] > max(leaves)  # the hub dominates


def test_pagerank_deterministic(spark):
    from hephaestus_spark.operators.graph import pagerank

    pairs = _pairs(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    a = pagerank(pairs, n_iter=8).toPandas().sort_values("id").reset_index(drop=True)
    b = pagerank(pairs, n_iter=8).toPandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)


def test_pagerank_uniform_on_regular_graph(spark):
    from hephaestus_spark.operators.graph import pagerank

    # cycle of 5: 2-regular, stationary distribution is exactly uniform
    pairs = _pairs(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)])
    pr = pagerank(pairs, n_iter=5).toPandas()
    assert (abs(pr["rank"] - 0.2) < 1e-12).all()
