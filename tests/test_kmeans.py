"""Lloyd k-means invariants (operators/kmeans.py).

No SQL oracle (iterative), but the mechanics are exact and checkable:
deterministic run-to-run, objective non-increasing across rounds,
returned assignments are the true arg-min against returned centroids,
and every cluster id is within range.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hephaestus_spark.operators.kmeans import assign_clusters, lloyd_kmeans
from hephaestus_spark.sources import load_table


def _vectors(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_kmeans_objective_non_increasing(spark, sf_dir):
    _, _, obj = lloyd_kmeans(_vectors(spark, sf_dir), k=4, n_iter=3)
    assert len(obj) == 4  # 3 rounds + final assignment
    for a, b in zip(obj, obj[1:]):
        assert b <= a + 1e-9, obj


def test_kmeans_deterministic(spark, sf_dir):
    a1, _, _ = lloyd_kmeans(_vectors(spark, sf_dir), k=4, n_iter=2)
    a2, _, _ = lloyd_kmeans(_vectors(spark, sf_dir), k=4, n_iter=2)
    p1 = a1.orderBy("vec_id").toPandas()
    p2 = a2.orderBy("vec_id").toPandas()
    assert p1.cluster_id.tolist() == p2.cluster_id.tolist()


def test_kmeans_assignment_is_argmin(spark, sf_dir):
    assigned, cent, _ = lloyd_kmeans(_vectors(spark, sf_dir), k=4, n_iter=2)
    # recompute the arg-min independently and compare
    re_assigned = assign_clusters(_vectors(spark, sf_dir), cent)
    diff = (
        assigned.alias("a")
        .join(re_assigned.alias("b"), "vec_id")
        .filter(F.col("a.cluster_id") != F.col("b.cluster_id"))
    )
    assert diff.count() == 0
    ks = assigned.select(F.min("cluster_id"), F.max("cluster_id")).first()
    assert ks[0] >= 0 and ks[1] <= 3
