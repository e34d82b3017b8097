"""jaccard_verify (r15): the persist-barrier verify must be
value-identical to the naive select+filter form it replaced."""

from pyspark.sql import functions as F

from hephaestus_spark.operators.textops import jaccard_verify


def _frames(spark):
    rows = [
        (1, 2, [10, 20, 30, 40, 50], [10, 20, 30, 40, 60]),   # J = 4/6
        (1, 3, [10, 20, 30, 40, 50], [10, 20, 30, 40, 50]),   # J = 1.0
        (2, 3, [10, 20], [30, 40]),                            # J = 0
        (4, 5, [1, 2, 3, 4, 5, 6, 7, 8, 9],
               [1, 2, 3, 4, 5, 6, 7, 8, 10]),                  # J = 8/10
    ]
    return spark.createDataFrame(
        rows, "id_a int, id_b int, sh_a array<int>, sh_b array<int>"
    )


def test_matches_naive_form(spark):
    joined = _frames(spark)
    got = jaccard_verify(joined, ["id_a", "id_b"], threshold=0.8)
    nc = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    jac = nc * 1.0 / (
        F.size("sh_a").cast("bigint") + F.size("sh_b").cast("bigint") - nc
    )
    naive = joined.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.8
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    assert got.count() == 2  # J=1.0 and J=0.8 survive; 4/6 and 0 do not


def test_threshold_boundary_inclusive(spark):
    got = jaccard_verify(_frames(spark), ["id_a", "id_b"], threshold=0.8)
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    assert (4, 5) in pairs  # exactly 0.8 — >= is inclusive
