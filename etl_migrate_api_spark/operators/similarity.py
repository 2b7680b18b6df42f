"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline; LSH-bucketed
(random-hyperplane, deterministic md5-derived planes) as the scale path.

100 TB posture: the brute-force path is a broadcast of the (small) query
set against a full scan of the corpus — linear, no shuffle of the corpus.
The LSH path buckets the corpus once (narrow map), then joins query
buckets to corpus buckets — sublinear candidate sets, still engine-pure
expressions (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_migrate_api_spark.functions.vectors import cosine_similarity


def bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id).

    The query side is broadcast; ranking tie-breaks on neighbor id so the
    result is a total order (engine-agnostic)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = q.join(c, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def hyperplane_sign_bits(vec: Column, n_planes: int, dim: int) -> Column:
    """Deterministic random-hyperplane LSH key (string of n_planes bits).

    Plane p's weight for dimension d is +1/-1 from the low bit of md5
    nibble — reproducible across engines and runs (no RNG state to ship
    to executors)."""
    def bit(p: Column, d_idx: Column) -> Column:
        nib = F.conv(
            F.substring(F.md5(F.concat(p.cast("string"), F.lit("_"), d_idx.cast("string"))), 1, 1),
            16,
            10,
        ).cast("int")
        return (nib % 2) * 2 - 1  # ±1

    def plane_dot(p: Column) -> Column:
        prods = F.zip_with(
            vec,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, d: x.cast("double") * bit(p, d).cast("double"),
        )
        return F.aggregate(prods, F.lit(0.0), lambda a, x: a + x)

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(plane_dot(p) >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket.

    Returns (query_id, rank, neighbor_id, bucket). Recall < 1 by design;
    compare against bruteforce_topk for quality measurement."""
    key = hyperplane_sign_bits(F.col(vec_col), n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), key.alias("bucket")
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), key.alias("bucket")
        )
    )
    scored = q.join(c, "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "bucket",
        "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "bucket")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: assign every vector to its
    nearest-centroid cell (argmax cosine, tie-break on centroid id),
    then rank only within the query's cell.

    The classic IVF layout for vector search at scale: the corpus is
    partitioned ONCE by cell (at 100 TB: written bucketed by cell_id so
    repeated queries prune to one bucket); a query probes 1 cell (nprobe
    =1 here; raising nprobe = unioning more cells). Centroids are data
    (a tiny broadcast dim), so the whole operator is joins + windows —
    no UDFs, no training dependency (callers pass k-means output or any
    deterministic sample as centroids)."""
    cent = F.broadcast(
        centroids.select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_v")
        )
    )

    def assign(df: DataFrame, idc: str, vc: str) -> DataFrame:
        scored = df.join(cent).select(
            F.col(idc),
            F.col(vc),
            "cent_id",
            cosine_similarity(F.col(vc), F.col("cent_v")).alias("cs"),
        )
        w = Window.partitionBy(idc).orderBy(F.col("cs").desc(), F.col("cent_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col(idc), F.col(vc), F.col("cent_id").alias("cell"))
        )

    c = assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "neighbor_id",
        "cv",
    )
    q = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id",
        "qv",
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "cell",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int"), "neighbor_id", F.col("cell").cast("int"))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key."""
    base = df.select(
        F.col(id_col).alias("id"),
        (F.col(block_col) if block_col else F.lit(1)).alias("blk"),
        F.col(vec_col).alias("v"),
    )
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_similarity(F.col("a.v"), F.col("b.v")).alias("sim"),
        )
        .where(F.col("sim") > threshold)
    )
