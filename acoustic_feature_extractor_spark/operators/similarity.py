"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH-bucketed (random
hyperplane) and IVF (coarse-centroid) variants as the scale path. Dot
products stay JVM-side via ``zip_with`` + ``aggregate`` (no Python);
per-query top-k via window row_number.

Scale notes: brute force broadcasts the (small) query set and scans the
corpus once — linear, shuffle-free until the per-query top-k (one shuffle
keyed by query, k rows per query survive the partial top-k thanks to
AQE/partial sort). LSH cuts the scanned fraction to colliding buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL for zero-norm vectors (a bare division
    would abort the job under Spark 4's default ANSI mode — null instead
    ranks the degenerate vector last / fails threshold filters)."""
    denom = l2norm(a) * l2norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force, broadcast queries).

    Output: (query_id, neighbor_id, rank) — rank 1..k by cosine desc,
    neighbor_id asc tiebreak (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    j = c.crossJoin(F.broadcast(q))
    if not include_self:
        j = j.where(F.col("query_id") != F.col("neighbor_id"))
    scored = j.withColumn("_cos", cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("_cos", 6).alias("cos_sim"))
    )


def _hyperplane(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane weights in [-1, 1).

    Pure arithmetic (same mix as datagen) so the projection is reproducible
    anywhere — no RNG state shipped to executors.
    """
    mix, mod = 2654435761, 2147483647
    return [
        (((plane * 10_007 + d + seed) * mix) % mod) / (mod / 2.0) - 1.0
        for d in range(dim)
    ]


def lsh_bucket(
    vec: Column, dim: int, n_planes: int = 8, seed: int = 42
) -> Column:
    """Random-hyperplane LSH bucket id (int in [0, 2^n_planes))."""
    bucket = F.lit(0)
    for p in range(n_planes):
        wts = F.array(*[F.lit(w) for w in _hyperplane(dim, p, seed)])
        bit = F.when(dot(vec, wts) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    At scale the corpus is pre-bucketed (partitioned by bucket); a query
    touches one partition instead of the full scan. Recall is tunable via
    n_planes / multi-probe (not implemented: probe = exact bucket only).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_bkt", lsh_bucket(F.col("_qv"), dim, n_planes, seed))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).withColumn("_bkt", lsh_bucket(F.col("_cv"), dim, n_planes, seed))
    j = c.join(F.broadcast(q), "_bkt").where(F.col("query_id") != F.col("neighbor_id"))
    scored = j.withColumn("_cos", cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("_cos", 6).alias("cos_sim"))
    )


def _nearest_centroid_cols(vec: Column, centroids: list[list[float]], n_probe: int) -> Column:
    """Array of the ``n_probe`` nearest centroid ids (by cosine) for ``vec``.

    Centroids are literal arrays (driver-picked, tiny), so the whole
    assignment is one JVM-side expression — no join, no Python.
    """
    sims = F.array(
        *[
            F.struct(
                cosine(vec, F.array(*[F.lit(float(x)) for x in c])).alias("sim"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(sims)), 1, n_probe)
    return F.transform(top, lambda s: s["cid"])


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization.

    Centroids = a deterministic stratified pick of corpus vectors (the
    reference's linspace subsample shape,
    ``/root/reference/src/extractor/extract_f0_range.py:177-184``); every
    corpus vector is assigned to its nearest centroid (its inverted list),
    and a query scans only its ``n_probe`` nearest lists. ``n_probe =
    n_centroids`` degrades gracefully to exact brute force (tests pin
    this).

    Scale shape: the corpus is partitioned by centroid id (at rest:
    partition the table by ``_cid``), a query touches n_probe/n_centroids
    of the data; the only shuffle is the per-query top-k.
    """
    total = corpus.count()
    n_centroids = max(1, min(n_centroids, total))
    # deterministic hash-strided pick (no global sort/row_number — a
    # single-partition rank at 10^12 rows is exactly the anti-pattern):
    # keep ids whose hash falls on the stride, take the first n by id via
    # distributed TakeOrdered.
    stride = max(1, total // (n_centroids * 4))
    picked = (
        corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
        .where(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(stride)) == 0)
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    if len(picked) < n_centroids:  # tiny corpus fallback
        picked = (
            corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
            .orderBy(id_col)
            .limit(n_centroids)
            .collect()
        )
    centroids = [list(r["_v"]) for r in picked]

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_cv")
    ).withColumn(
        "_cid", F.element_at(_nearest_centroid_cols(F.col("_cv"), centroids, 1), 1)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_qv")
    ).withColumn(
        "_cid",
        F.explode(_nearest_centroid_cols(F.col("_qv"), centroids, n_probe)),
    )
    j = c.join(F.broadcast(q), "_cid").where(F.col("query_id") != F.col("neighbor_id"))
    scored = j.withColumn("_cos", cosine(F.col("_qv"), F.col("_cv")))
    wk = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("_cos", 6).alias("cos_sim"))
    )


def embedding_neardup_exact(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "numpy",  # "numpy" (Arrow-batched matmul) | "jvm"
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (broadcast self-join verify).

    The exact primitive: all (a, b) with a < b and cosine ≥ threshold. At
    scale this is the *verify* stage run on candidate pairs only; as a
    standalone query it broadcasts the smaller projection (id, vec) and
    scans the corpus once. Use :func:`embedding_neardup_pairs` (LSH
    blocking) when the corpus is too large for the O(n²) verify.

    ``method="numpy"``: each corpus partition multiplies its normalized
    block against the broadcast normalized matrix with one BLAS matmul
    inside ``mapInPandas`` — the charter's "vectorized Pandas UDF" path,
    ~10x the interpreted per-pair HOF. ``method="jvm"`` keeps everything
    in Catalyst expressions (no Python) for environments where that
    matters more than speed.
    """
    if method == "numpy":
        import numpy as np
        import pandas as pd
        from typing import Iterator

        rows = df.select(id_col, F.col(vec_col).cast("array<double>")).collect()
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        mat = np.array([r[1] for r in rows], dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = np.inf  # zero vectors match nothing
        unit = mat / norms
        spark = df.sparkSession
        b_ids = spark.sparkContext.broadcast(ids)
        b_unit = spark.sparkContext.broadcast(unit)
        thr = float(threshold)

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            all_ids, all_unit = b_ids.value, b_unit.value
            for pdf in batches:
                block = np.array(list(pdf["_v"]), dtype=np.float64)
                bn = np.linalg.norm(block, axis=1, keepdims=True)
                bn[bn == 0] = np.inf
                block = block / bn
                sims = block @ all_unit.T  # (batch, corpus)
                bi, ci = np.nonzero(sims >= thr)
                lid = pdf["_id"].to_numpy()[bi]
                rid = all_ids[ci]
                keep = lid < rid
                yield pd.DataFrame(
                    {
                        "id_a": lid[keep],
                        "id_b": rid[keep],
                        "cos_sim": np.round(sims[bi, ci][keep], 6),
                    }
                )

        return df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ).mapInPandas(kernel, schema="id_a long, id_b long, cos_sim double")
    # pre-normalize ONCE per row: higher-order-function expressions are
    # interpreted (not codegen'd), so recomputing both norms per PAIR
    # multiplies the dominant cost by ~3x on the O(n^2) join
    v = F.col(vec_col).cast("array<double>")
    norm = l2norm(v)
    unit = F.when(norm != 0.0, F.transform(v, lambda x: x / norm))
    a = df.select(F.col(id_col).alias("id_a"), unit.alias("_ua"))
    b = df.select(F.col(id_col).alias("id_b"), unit.alias("_ub"))
    return (
        a.crossJoin(F.broadcast(b))
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", dot(F.col("_ua"), F.col("_ub")))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing + verify."""
    v = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_bkt", lsh_bucket(F.col("_v"), dim, n_planes, seed))
    a = v.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), "_bkt")
    b = v.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), "_bkt")
    return (
        a.join(b, "_bkt")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("_va"), F.col("_vb")))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )
