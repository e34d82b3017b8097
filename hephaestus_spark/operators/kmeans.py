"""Lloyd k-means over an embedding column (iterative algorithm shape).

The iterative-ML pattern done Spark-right: the MODEL (k centroids,
k x dim doubles) lives on the driver and is re-broadcast each round as
a literal one-row frame; the DATA never leaves the executors. Each
round is (a) assignment — crossJoin with the broadcast centroids +
arg-min window, all JVM higher-order functions — and (b) update —
posexplode + per-(cluster, position) mean, one keyed shuffle linear in
|vectors| * dim. Collecting k*dim numbers per round is not a
driver-side loop over data: it is the textbook model/data split
(pyspark.ml's own KMeans does the same via treeAggregate).

Determinism: init = the k lowest-id vectors, fixed round count, double
arithmetic — identical results run-to-run and across partitionings
(per-cluster means use Spark's avg; its accumulation order is
partition-dependent in general, but the final assignment is stable for
well-separated data; the registered query is rows-only for this
reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _sq_dist(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b},"
        f" (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *"
        f" (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment (squared L2, deterministic tiebreak
    on centroid id). Centroids broadcast; one window keyed on the
    vector id."""
    joined = vectors.crossJoin(F.broadcast(centroids))
    scored = joined.select(
        id_col, vec_col, "cluster_id", _sq_dist(vec_col, "centroid").alias("_d")
    )
    w = W.partitionBy(id_col).orderBy(F.col("_d").asc(), F.col("cluster_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "cluster_id", F.col("_d").alias("sq_dist"))
    )


def lloyd_kmeans(
    vectors: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, list[float]]:
    """Returns (assignments, centroids, per-round objective).

    assignments: (id, cluster_id, sq_dist) at the final round;
    centroids: (cluster_id, centroid array<double>);
    objective: sum of squared distances after each assignment round
    (non-increasing — asserted in tests)."""
    spark = vectors.sparkSession
    cent = (
        vectors.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("centroid")
        )
        .collect()
    )
    cent_rows = [(i, r["centroid"]) for i, r in enumerate(cent)]
    objective: list[float] = []
    assigned = None
    for _ in range(n_iter):
        cent_df = spark.createDataFrame(
            cent_rows, "cluster_id INT, centroid ARRAY<DOUBLE>"
        )
        assigned = assign_clusters(vectors, cent_df, id_col, vec_col)
        stats = assigned.select(
            "cluster_id", F.posexplode(vec_col).alias("pos", "v"), "sq_dist"
        )
        upd = (
            stats.groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cluster_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster_id", F.expr("transform(pm, x -> x.m)").alias("centroid"))
        )
        obj = assigned.agg(F.sum("sq_dist")).first()[0]
        objective.append(float(obj))
        new_cent = {r["cluster_id"]: r["centroid"] for r in upd.collect()}
        # empty clusters keep their previous centroid
        cent_rows = [(cid, new_cent.get(cid, c)) for cid, c in cent_rows]
    # final assignment against the FINAL centroids, so the returned
    # (assignments, centroids) pair is self-consistent
    cent_df = spark.createDataFrame(cent_rows, "cluster_id INT, centroid ARRAY<DOUBLE>")
    assigned = assign_clusters(vectors, cent_df, id_col, vec_col)
    objective.append(float(assigned.agg(F.sum("sq_dist")).first()[0]))
    return (
        assigned.select(id_col, "cluster_id", "sq_dist"),
        cent_df,
        objective,
    )
