"""ANN quality invariants (x_ann_lsh / x_ann_ivf vs q34 brute force).

LSH/IVF recall is probabilistic by design (rows-only in the driver
gate), but the *mechanics* are deterministic and checkable:
- signatures are seed-fixed → identical results run-to-run;
- every returned neighbor shares >= 1 band key with its query
  (the defining candidate-generation property);
- reported cos_sim is the exact cosine (rerank is exact on candidates);
- ranks are 1..k, dense, and never include the query itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import hephaestus_spark.queries  # noqa: F401 — registration
from hephaestus_spark.operators import similarity as sim
from hephaestus_spark.registry import QUERIES
from hephaestus_spark.sources import load_table


def test_lsh_ann_invariants(spark, sf_dir):
    out = QUERIES["x_ann_lsh"](spark, sf_dir).toPandas()
    assert set(out.columns) == {"query_id", "vec_id", "cos_sim", "rn"}
    assert (out.query_id != out.vec_id).all()
    for _, grp in out.groupby("query_id"):
        ranks = sorted(grp.rn)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
        # ranking order agrees with the scores
        ordered = grp.sort_values(["rn"])
        sims = list(ordered.cos_sim)
        assert all(a >= b - 1e-12 for a, b in zip(sims, sims[1:]))


def test_lsh_ann_deterministic(spark, sf_dir):
    a = QUERIES["x_ann_lsh"](spark, sf_dir).toPandas().sort_values(["query_id", "rn"])
    b = QUERIES["x_ann_lsh"](spark, sf_dir).toPandas().sort_values(["query_id", "rn"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_lsh_neighbors_share_a_band(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = e.select(F.size("embedding").alias("d")).first()["d"]
    planes = sim.hyperplanes(n_bits=16, dim=dim, seed=42)
    bands = sim.lsh_bands(sim.lsh_signature(e, planes)).select(
        "vec_id", "band", "band_key"
    )
    out = QUERIES["x_ann_lsh"](spark, sf_dir).select("query_id", "vec_id")
    qb = bands.withColumnRenamed("vec_id", "query_id")
    shared = (
        out.join(bands, "vec_id")
        .join(qb, ["query_id", "band", "band_key"])
        .select("query_id", "vec_id")
        .distinct()
    )
    assert shared.count() == out.count()


def test_embed_near_dup_matches_brute_force(spark, sf_dir):
    """The registered banded-LSH near-dup query must reproduce the
    all-pairs brute-force result — brute force lives HERE (test oracle
    only), never as the registered plan (it's O(n^2) at corpus scale)."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    corpus = e.union(dup)
    a, b = corpus.alias("a"), corpus.alias("b")
    brute = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            sim.cosine("a.embedding", "b.embedding").alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.99)
        # the registered query emits round(cos_sim, 4); match it here
        .select("id_a", "id_b", F.round(F.col("cos_sim"), 4).alias("cos_sim"))
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    banded = (
        QUERIES["x_embed_near_dup"](spark, sf_dir)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert banded.equals(brute)


def test_cosine_bit_identical_across_engines(spark, sf_dir, oracle):
    """The q34 / x_embed_near_dup oracles assume DuckDB's list_sum uses
    the same left-to-right naive double accumulation as Spark's
    ``aggregate`` (ADVICE r3: an undocumented DuckDB implementation
    detail). Assert the RAW, unrounded doubles are bit-identical so a
    DuckDB summation-order change is caught here, not at the driver."""
    from hephaestus_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id").between(0, 4)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qvec")
    )
    spark_raw = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.cosine("_qvec", "embedding").alias("c"))
        .toPandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    duck_raw = oracle.execute(
        """
        SELECT q.vec_id AS query_id, e.vec_id,
               list_sum(list_transform(list_zip(q.embedding, e.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS c
        FROM embeddings q, embeddings e
        WHERE q.vec_id BETWEEN 0 AND 4 AND e.vec_id <> q.vec_id
        ORDER BY query_id, e.vec_id
        """
    ).df().reset_index(drop=True)
    assert len(spark_raw) == len(duck_raw)
    # bit-identical: exact equality, no tolerance
    assert (spark_raw.c.values == duck_raw.c.values).all()


def test_lsh_rerank_is_exact_cosine(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = QUERIES["x_ann_lsh"](spark, sf_dir)
    q = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qvec"))
    recheck = (
        out.join(e, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            "cos_sim",
            sim.cosine("_qvec", "embedding").alias("exact"),
        )
        .filter(F.abs(F.col("cos_sim") - F.col("exact")) > 1e-9)
    )
    assert recheck.count() == 0


def test_ivf_multiprobe_invariants(spark, sf_dir):
    """nprobe=2 mechanics: ranks dense, no self-match, every returned
    neighbor's (unique) inverted list is one of the query's 2 probed
    centroids, and the candidate pool is a superset of single-probe —
    so per-rank similarity never degrades vs nprobe=1."""
    from hephaestus_spark.queries.similarity import label_centroids

    out = QUERIES["x_ann_ivf"](spark, sf_dir).toPandas()
    assert (out.query_id != out.vec_id).all()
    for _, grp in out.groupby("query_id"):
        assert sorted(grp.rn) == list(range(1, len(grp) + 1))
        assert len(grp) <= 5

    e = load_table(spark, sf_dir, "embeddings")
    cent = label_centroids(e)
    corpus_list = sim.ivf_assign(e, cent).select("vec_id", "centroid_id").toPandas()
    probed = (
        sim.ivf_assign(e.filter(F.col("vec_id").between(0, 4)), cent, n_probe=2)
        .select(F.col("vec_id").alias("query_id"), "centroid_id")
        .toPandas()
    )
    probe_sets = probed.groupby("query_id").centroid_id.apply(set).to_dict()
    corpus_map = dict(zip(corpus_list.vec_id, corpus_list.centroid_id))
    for row in out.itertuples():
        assert corpus_map[row.vec_id] in probe_sets[row.query_id]

    single = sim.ivf_assign(
        e.filter(F.col("vec_id").between(0, 4)), cent, n_probe=1
    ).select(F.col("vec_id").alias("query_id"), "centroid_id").toPandas()
    single_map = dict(zip(single.query_id, single.centroid_id))
    # the nearest centroid is always among the probes (superset property)
    for q, c in single_map.items():
        assert c in probe_sets[q]
