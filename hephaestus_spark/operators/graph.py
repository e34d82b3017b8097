"""Connected components over pair edges (dedup-cluster assignment).

After near-dup pair generation (MinHash/LSH verify, embedding cosine),
a training-data pipeline must turn PAIRS into CLUSTERS: transitively
connected documents form one duplicate group, and exactly one canonical
document per group survives. That is connected components with the
minimum member id as the cluster label.

Algorithm: iterative min-label propagation — every node starts labeled
with its own id; each round, every node takes the min of its label and
its neighbors' labels; fixpoint = components labeled by their min id.
Each round is one join (edges x labels) + one min-aggregation, both
keyed shuffles that scale with |edges|; rounds needed = graph diameter
(duplicate clusters are near-cliques, so 2-3 rounds in practice). The
driver-side loop only runs a convergence COUNT per round — no data is
ever collected. For adversarial long-chain graphs at planetary scale,
the published large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) halves path lengths per
round; the propagation round below is the building block either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`; the
    component label is the minimum node id in the component.

    Each iteration persists its labels and unpersists the previous
    round's (the lineage would otherwise grow a join per round and
    recompute from scratch on every action)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .persist()
    )
    try:
        for _ in range(max_iter):
            prop = edges.join(labels, edges.u == labels.id).select(
                F.col("v").alias("id"), "label"
            )
            new_labels = (
                labels.union(prop).groupBy("id").agg(F.min("label").alias("label"))
            ).persist()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )
        # The returned frame reads the final round's cache (one row per
        # paired node — small); it stays persisted so consumers don't
        # replay the iteration lineage.
        return labels.select("id", F.col("label").alias("component"))
    finally:
        edges.unpersist()


def pagerank(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an undirected pair graph — the third iterative-
    algorithm demo beside connected components (above) and Lloyd
    k-means (operators/kmeans.py), exercising the join+agg-per-round
    pattern WITH per-round normalization (teleport).

    Edges are made bidirectional, so every node has out-degree >= 1 and
    no dangling-mass correction is needed: each round preserves total
    probability mass exactly — N * (1-d)/N + d * sum(rank) = 1.

    Per round: one equi-join (edges x ranks on src) + one keyed sum on
    dst + a teleport floor for nodes with no in-contribution. Each
    round's ranks are ``localCheckpoint``ed (eager): persist alone
    truncates execution but the LOGICAL plan still grows a join per
    round, and past ~15 rounds analyzer cost explodes — checkpointing
    cuts the lineage so every round optimizes the same constant-size
    plan (production: reliable ``checkpoint`` dir for fault tolerance).
    The driver holds only loop control — no data collect, so the
    identical plan runs per-round on a 1000-executor graph. Fixed
    n_iter: power iteration converges geometrically at rate ~damping
    (0.85^10 ≈ 0.2 residual); callers needing tighter convergence raise
    n_iter — each extra round is one more join+agg, nothing else
    grows."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    out_deg = edges.groupBy("u").agg(F.count("*").alias("deg"))
    ed = edges.join(out_deg, "u").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("u").alias("id")).distinct().localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - damping) / n_nodes
    for _ in range(n_iter):
        contribs = (
            ed.join(ranks, ed.u == ranks.id)
            .select(F.col("v").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def dedup_clusters(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Cluster assignment for dedup: every paired doc gets its cluster
    id (min doc id in the component) and a canonical flag (true for
    exactly the minimum member, the doc a keep-one-per-group dedup
    retains)."""
    cc = connected_components(pairs, src=src, dst=dst)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
