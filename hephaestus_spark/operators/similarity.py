"""Vector similarity operators over embedding columns.

Embeddings are plain ``array<float>`` columns; all math happens in
built-in higher-order functions (zip_with/aggregate — JVM-side), so no
Python crosses the hot path. Cast to double FIRST: the accumulator must
match the oracle's double arithmetic, and float32 accumulation loses
enough precision to flip 4dp rounding.

Scale paths:
- brute-force top-k: fine when the query set is small (broadcast the
  queries, stream the corpus — one pass, no shuffle).
- IVF-style: assign vectors to coarse centroids, search only the
  closest buckets — turns ANN into a bucket equi-join.
- random-hyperplane LSH: sign-bit signatures bucket candidates for
  near-dup joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0 AS DOUBLE),"
            f" (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"
        )
    )


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Cosine top-k of each query vector over the corpus.

    Broadcast the (small) query side; the corpus streams through one
    projection + per-query ranking window. Shuffle is only on query_id
    (tiny cardinality) for the window."""
    from pyspark.sql.window import Window as W

    from hephaestus_spark.sources.tables import spread_scan

    q = queries.select(
        F.col(id_col).alias(query_id), F.col(vec_col).alias("_qvec")
    )
    # r15 (guide §2.5): the per-(row x query) dot products are the
    # expensive stage; when the corpus scan cannot split (single-row-
    # group local file: 0.59 s on 1 of 32 cores at sf0.1), spread it by
    # the vector id first. No-op when the scan already splits >= cores.
    joined = spread_scan(corpus, id_col).join(
        F.broadcast(q), F.col(id_col) != F.col(query_id)
    )
    scored = joined.select(
        query_id,
        id_col,
        cosine("_qvec", vec_col).alias("cos_sim"),
    )
    w = W.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, id_col, "cos_sim", F.col("rn").cast("bigint").alias("rn"))
    )


def hyperplanes(n_bits: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constants).

    Seed-fixed so signatures are reproducible run-to-run; the planes are
    tiny (n_bits x dim doubles) and are inlined into the plan as literal
    arrays — nothing to broadcast, nothing to ship."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def lsh_signature(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "sig",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) signature: bit i is set iff
    v . plane_i > 0. Pure JVM projection (zip_with/aggregate over literal
    arrays) — no UDF, no shuffle; at 100 TB this runs scan-side and the
    signature is what you persist/partition by."""
    sig = F.lit(0)
    for i, hp in enumerate(planes):
        arr = "array(" + ",".join(f"CAST({x} AS DOUBLE)" for x in hp) + ")"
        d = F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> CAST(x AS DOUBLE) * y),"
            f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        sig = sig + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn(out_col, sig.cast("int"))


def lsh_bands(
    df: DataFrame,
    sig_col: str = "sig",
    n_bands: int = 4,
    bits_per_band: int = 4,
) -> DataFrame:
    """Explode a signature into (band, band_key) rows. Vectors sharing a
    band key are join candidates — the banding turns pairwise search
    into an equi-join whose fan-out is bounded by bucket size, which is
    what survives at corpus scale."""
    mask = (1 << bits_per_band) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (
                    F.shiftright(F.col(sig_col), b * bits_per_band).bitwiseAND(mask)
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = df.withColumn("_b", F.explode(bands))
    return exploded.select(*df.columns, "_b.band", "_b.band_key")


def hyperplane_band_keys(
    df: DataFrame,
    planes: list[list[float]],
    bits_per_band: int = 16,
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-band hyperplane-LSH keys in ONE JVM projection.

    All len(planes) dot products are computed by a single `transform`
    over a literal plane matrix, sliced into ``len(planes) //
    bits_per_band`` bands of sign bits, and exploded to (band, band_key)
    rows. Vectors whose cosine is near 1 agree on almost every sign bit,
    so they collide in some band w.h.p. (identical vectors collide in
    EVERY band — exact duplicates are never missed). bits_per_band sets
    bucket granularity (16 bits -> 65k buckets per band, the knob that
    bounds self-join fan-out at corpus scale); the band count sets
    recall. No UDF, no shuffle — runs scan-side."""
    n_bands = len(planes) // bits_per_band
    mat = "array(" + ",".join(
        "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in p) + ")" for p in planes
    ) + ")"
    dots = (
        f"transform({mat}, p -> aggregate(zip_with({vec_col}, p,"
        f" (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    bands = (
        f"transform(sequence(0, {n_bands - 1}), b -> struct(b AS band,"
        f" aggregate(sequence(0, {bits_per_band - 1}), 0,"
        f" (acc, i) -> acc + IF(_dots[b * {bits_per_band} + i] > 0,"
        f" shiftleft(1, i), 0)) AS band_key))"
    )
    cols = list(df.columns)
    return (
        df.withColumn("_dots", F.expr(dots))
        .withColumn("_b", F.explode(F.expr(bands)))
        .select(*cols, F.col("_b.band").alias("band"), F.col("_b.band_key").alias("band_key"))
    )


def band_hot_buckets(
    bands: DataFrame, cap: int, band_col: str = "band", key_col: str = "band_key"
) -> DataFrame:
    """(band, band_key, bucket_rows) of LSH band buckets larger than
    ``cap`` — what ``drop_hot_band_buckets`` removes. Keep it separate
    so callers can count/log the cut (no silent truncation): a hot
    hyperplane bucket means a dense direction cluster whose self-join
    is quadratic in the bucket, the one skew channel banding leaves."""
    return (
        bands.groupBy(band_col, key_col)
        .agg(F.count("*").alias("bucket_rows"))
        .filter(F.col("bucket_rows") > cap)
    )


def drop_hot_band_buckets(
    bands: DataFrame, cap: int, band_col: str = "band", key_col: str = "band_key"
) -> DataFrame:
    """Exclude rows of band buckets larger than ``cap`` (VERDICT r2
    item 8) via a count window over the band key — the partitioning the
    downstream band join uses anyway, so the cap adds no extra shuffle.
    A pair living in a dropped bucket can still collide in its other
    bands — the cap trades bounded recall loss for a bounded worst-case
    join; ``band_hot_buckets`` reports what a cap drops."""
    from pyspark.sql.window import Window as W

    return (
        bands.withColumn(
            "_bn", F.count("*").over(W.partitionBy(band_col, key_col))
        )
        .filter(F.col("_bn") <= cap)
        .drop("_bn")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids (IVF
    coarse quantizer).

    Corpus vectors use n_probe=1 (each lives in exactly one inverted
    list); query vectors use n_probe>1 for multi-probe search — probing
    the runner-up centroids recovers neighbors that fell just across a
    Voronoi boundary, the standard IVF recall knob. Output has one row
    per (vector, probed centroid).

    Centroids broadcast (they're few); arg-top-n via ranking window on
    the centroid candidates per vector — the window shuffle is keyed on
    the vector id, so it scales with the corpus, never the centroids."""
    from pyspark.sql.window import Window as W

    joined = corpus.crossJoin(F.broadcast(centroids))
    scored = joined.select(
        id_col,
        vec_col,
        centroid_id,
        cosine(vec_col, centroid_vec).alias("_sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col(centroid_id).asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_probe)
        .drop("_rn", "_sim")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the ANN compression path that makes 100 TB
# of embeddings searchable. A d-dim vector becomes m sub-vector codes
# (one byte-ish each, k codewords per subspace): 64 float32 dims -> 8
# int codes is a ~32x memory/bandwidth cut, and query scoring becomes
# m table lookups (ADC) instead of d multiplies. References: Jegou et
# al., "Product Quantization for Nearest Neighbor Search" (public
# paper); same layout Faiss IVF-PQ uses.
# ---------------------------------------------------------------------------


def _lit_vec(v) -> str:
    return "array(" + ",".join(f"CAST({float(x)!r} AS DOUBLE)" for x in v) + ")"


def _lit_mat(mat) -> str:
    return "array(" + ",".join(_lit_vec(r) for r in mat) + ")"


def _pq_sub(vec_col: str, j: int, d: int) -> str:
    """SQL: subspace-j slice of the vector, as doubles (1-based slice)."""
    return (
        f"transform(slice({vec_col}, {j * d + 1}, {d}), x -> CAST(x AS DOUBLE))"
    )


def _pq_code_expr(vec_col: str, codebook, j: int, d: int) -> str:
    """SQL: nearest-codeword index (0-based) for subspace j.

    transform over the literal codebook computes the k squared
    distances; array_position(min) takes the FIRST minimum — a
    deterministic lowest-index tiebreak in both training and encoding."""
    cb = _lit_mat(codebook)
    sub = _pq_sub(vec_col, j, d)
    dists = (
        f"transform({cb}, c -> aggregate(zip_with({sub}, c,"
        f" (x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), (a, v) -> a + v))"
    )
    return f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Train m per-subspace codebooks (k codewords each) with Lloyd
    rounds. Returns the codebook cube as a Python list [m][k][d/m] —
    the MODEL lives on the driver (m*k*d doubles, ~8 KB here), exactly
    the kmeans model/data split; the data never leaves executors.

    Per round ONE job over the corpus: codes for all m subspaces are
    scan-side expressions against the literal codebook cube (no
    crossJoin — k distance exprs per subspace, codegen'd), and the
    update is a single keyed shuffle on (subspace, code, position)
    whose output is m*k*d rows. Rounds are driver-controlled only.

    Determinism: init = sub-vectors of the k lowest-id vectors; FIRST-
    minimum tiebreak in assignment; empty codes keep their previous
    codeword. Same corpus -> same codebooks, run-to-run."""
    dim = len(vectors.select(vec_col).first()[0])
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    d = dim // m
    seed_rows = (
        vectors.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(vec_col)
        .collect()
    )
    assert len(seed_rows) >= k, f"need >= {k} vectors to seed {k} codewords"
    cube = [
        [[float(r[0][j * d + p]) for p in range(d)] for r in seed_rows]
        for j in range(m)
    ]
    for _ in range(n_iter):
        code_cols = [
            F.expr(_pq_code_expr(vec_col, cube[j], j, d)).alias(f"_c{j}")
            for j in range(m)
        ]
        enc = vectors.select(vec_col, *code_cols)
        sub = enc.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.col(f"_c{j}").alias("code"),
                            F.expr(_pq_sub(vec_col, j, d)).alias("sv"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("s")
        ).select("s.j", "s.code", F.posexplode("s.sv").alias("pos", "v"))
        means = (
            sub.groupBy("j", "code", "pos")
            .agg(F.avg("v").alias("mv"))
            .collect()
        )
        new_cube = [[list(cw) for cw in cb] for cb in cube]  # keep empties
        for r in means:
            new_cube[r["j"]][r["code"]][r["pos"]] = float(r["mv"])
        cube = new_cube
    return cube


def pq_encode(
    df: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """array<int> of m nearest-codeword indices per vector — a pure
    scan-side projection against the literal codebooks (no UDF, no
    shuffle, no model broadcast round-trip). This column is what a
    100 TB deployment persists instead of raw floats."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    codes = ", ".join(_pq_code_expr(vec_col, codebooks[j], j, d) for j in range(m))
    return df.withColumn(out_col, F.expr(f"array({codes})"))


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: list,
    k_final: int = 5,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    query_id: str = "query_id",
) -> DataFrame:
    """ADC (asymmetric distance) top-k with exact rerank.

    Each query precomputes its LUT — sqdist(query sub-vector, codeword)
    for all m*k cells — as one scan-side array<array<double>>; the
    (small) query side broadcasts with its LUTs attached. Scoring a
    corpus row is then m element_at lookups + adds, NOT d multiplies:
    the bandwidth shape that scans billions of codes per node. The top
    ``rerank`` ADC candidates per query are re-scored with exact cosine
    on the raw vectors and the true top ``k_final`` emitted — standard
    PQ practice (quantization error moves neighbors a few ranks, almost
    never out of the top-R)."""
    from pyspark.sql.window import Window as W

    m = len(codebooks)
    d = len(codebooks[0][0])
    luts = "array(" + ", ".join(
        f"transform({_lit_mat(codebooks[j])}, c -> aggregate("
        f"zip_with({_pq_sub('_qvec', j, d)}, c, (x, y) -> (x - y) * (x - y)),"
        f" CAST(0 AS DOUBLE), (a, v) -> a + v))"
        for j in range(m)
    ) + ")"
    q = queries.select(
        F.col(id_col).alias(query_id), F.col(vec_col).alias("_qvec")
    ).withColumn("_lut", F.expr(luts))
    # [] indexing is 0-based in Spark SQL (element_at is the 1-based one)
    adc = (
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS DOUBLE),"
        f" (acc, j) -> acc + _lut[j][{codes_col}[j]])"
    )
    scored = (
        codes_df.join(F.broadcast(q), F.col(id_col) != F.col(query_id))
        .select(query_id, id_col, vec_col, "_qvec", F.expr(adc).alias("_adc"))
    )
    w = W.partitionBy(query_id).orderBy(F.col("_adc").asc(), F.col(id_col).asc())
    cands = scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= rerank
    )
    w2 = W.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        cands.select(query_id, id_col, cosine("_qvec", vec_col).alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k_final)
        .select(query_id, id_col, "cos_sim", F.col("rn").cast("bigint").alias("rn"))
    )


def ivfpq_encode(
    assigned: DataFrame,
    centroids: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """IVF-PQ index rows: (id, list, residual PQ codes, raw vector).

    Classic Jegou-style composition: each vector is PQ-encoded on its
    RESIDUAL from its coarse centroid (residuals concentrate near the
    origin, so the same codebook budget quantizes them much more finely
    than raw vectors). The residual is a zip_with projection against
    the broadcast centroid row, and the codes come from the literal
    codebooks — everything scan-side after the one broadcast join. At
    100 TB the output is written partitioned by ``centroid_id``: each
    probe then reads exactly nprobe partitions."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    res = (
        f"zip_with({vec_col}, {centroid_vec},"
        f" (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
    )
    withres = assigned.join(F.broadcast(centroids), centroid_id).withColumn(
        "_res", F.expr(res)
    )
    codes = ", ".join(_pq_code_expr("_res", codebooks[j], j, d) for j in range(m))
    return withres.select(
        id_col, centroid_id, vec_col, F.expr(f"array({codes})").alias("pq_codes")
    )


def ivfpq_topk(
    index: DataFrame,
    queries_assigned: DataFrame,
    centroids: DataFrame,
    codebooks: list,
    k_final: int = 5,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
    query_id: str = "query_id",
) -> DataFrame:
    """ADC search over an IVF-PQ index with exact rerank.

    ``queries_assigned`` carries one row per (query, probed centroid)
    (ivf_assign with n_probe > 1). Each probe row computes its OWN LUT
    against the query's residual from THAT centroid — the asymmetric
    trick that makes residual coding work — then scores only the rows
    of the probed list via the (centroid_id) equi-join: the corpus
    outside the probed lists is never touched (partition pruning at
    scale). Scoring = m lookups; top-``rerank`` ADC candidates get an
    exact-cosine rerank on the raw vectors."""
    from pyspark.sql.window import Window as W

    m = len(codebooks)
    d = len(codebooks[0][0])
    qres = (
        f"zip_with(_qvec, {centroid_vec},"
        f" (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
    )
    luts = "array(" + ", ".join(
        f"transform({_lit_mat(codebooks[j])}, c -> aggregate("
        f"zip_with({_pq_sub('_qres', j, d)}, c, (x, y) -> (x - y) * (x - y)),"
        f" CAST(0 AS DOUBLE), (a, v) -> a + v))"
        for j in range(m)
    ) + ")"
    q = (
        queries_assigned.select(
            F.col(id_col).alias(query_id),
            F.col(vec_col).alias("_qvec"),
            centroid_id,
        )
        .join(F.broadcast(centroids), centroid_id)
        .withColumn("_qres", F.expr(qres))
        .withColumn("_lut", F.expr(luts))
        .select(query_id, "_qvec", centroid_id, "_lut")
    )
    adc = (
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS DOUBLE),"
        f" (acc, j) -> acc + _lut[j][pq_codes[j]])"
    )
    scored = (
        index.join(
            F.broadcast(q),
            (index[centroid_id] == q[centroid_id])
            & (F.col(id_col) != F.col(query_id)),
        )
        .select(query_id, id_col, vec_col, "_qvec", F.expr(adc).alias("_adc"))
    )
    # a corpus vector lives in exactly one list, but a query probing
    # several lists scores it once per probe only if lists overlap —
    # they don't (unique corpus assignment), so no dedup is needed
    w = W.partitionBy(query_id).orderBy(F.col("_adc").asc(), F.col(id_col).asc())
    cands = scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= rerank
    )
    w2 = W.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        cands.select(query_id, id_col, cosine("_qvec", vec_col).alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k_final)
        .select(query_id, id_col, "cos_sim", F.col("rn").cast("bigint").alias("rn"))
    )
