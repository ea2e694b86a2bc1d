"""Similarity search over embedding columns (array<float>).

- ``cosine`` / ``dot``: JVM-side zip_with + aggregate — no UDF, stays in
  whole-stage codegen.
- ``brute_force_topk``: exact top-k neighbors for a small query set. The
  query side is broadcast, so the big side is scanned once with no shuffle;
  per-query top-k via window row_number. This is the correctness baseline.
- ``lsh_topk``: the scale path — random-hyperplane (sign) LSH buckets both
  sides; only same-bucket (multi-probe: Hamming<=1) pairs are scored. At
  10^12 vectors the bucket join replaces the broadcast-scan's full scoring
  pass; planes are tiny driver-computed constants (deterministic seed).
- ``cosine_near_dup_pairs``: embedding near-duplicate detection for the
  dedup pipeline (pairs above a cosine threshold, banded by LSH bucket).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session shuffle width: broadcast pair
    joins inherit the probe side's file-partition count (1 for a one-file
    table), so the scoring pass must be spread explicitly."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k for each query id (queries drawn from the corpus).

    Deterministic ranking: (rounded cosine desc, candidate id asc) so ties
    resolve identically in any engine. Self-matches excluded.
    """
    base = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = _spread(base).crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = F.round(cosine(F.col("vec"), F.col("qvec")), round_digits)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        scored.select("query_id", "vec_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constants, ~KBs)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit j = 1 iff vec . plane_j > 0."""
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(float(x)).cast("double") for x in p]))
        bucket = bucket + F.when(d > 0, F.lit(1 << j).cast("long")).otherwise(0)
    return bucket


def lsh_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH bucket
    (plus Hamming-1 probes). Recall measured against brute force in tests;
    at scale the bucket equi-join is the only shuffle."""
    planes = _hyperplanes(dim, n_planes, seed)
    base = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
    ).withColumn("bucket", lsh_bucket(F.col("vec"), planes))
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    if multiprobe:
        probes = F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << j).cast("long"))
                    for j in range(n_planes)
                ],
            )
        ).alias("probe")
        queries = queries.select("query_id", "qvec", probes)
    else:
        queries = queries.select("query_id", "qvec", F.col("qbucket").alias("probe"))
    cand = _spread(base).join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("probe")) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = F.round(cosine(F.col("vec"), F.col("qvec")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id", sim.alias("cosine_sim"))
        .dropDuplicates(["query_id", "vec_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    exact: bool = False,
) -> DataFrame:
    """Pairs with cosine >= threshold. exact=True scores all id<id pairs
    (oracle mode, small inputs); default blocks by LSH bucket — high-cosine
    pairs collide with high probability and precision stays exact because
    every candidate is re-scored."""
    # norms are per-vector, not per-pair: precompute once so each pair
    # evaluates a single dot-product fold instead of three
    base = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).withColumn("nrm", norm(F.col("vec")))
    if not exact:
        planes = _hyperplanes(dim, n_planes, seed)
        base = base.withColumn("bucket", lsh_bucket(F.col("vec"), planes))
    a = _spread(base).alias("a")
    b = base.alias("b")
    cond = F.col("a.vec_id") < F.col("b.vec_id")
    if not exact:
        cond = cond & (F.col("a.bucket") == F.col("b.bucket"))
    # guarded projection barrier (see dedup.ngram_jaccard_pairs): the dot
    # product evaluates exactly once per pair, in a projection, never inside
    # the join condition
    dp = F.when(F.spark_partition_id() >= 0, dot(F.col("a.vec"), F.col("b.vec")))
    paired = a.join(b, cond).select(
        F.col("a.vec_id").alias("vec_id_a"),
        F.col("b.vec_id").alias("vec_id_b"),
        (F.col("a.nrm") * F.col("b.nrm")).alias("nn"),
        dp.alias("dp"),
    )
    sim = F.round(F.col("dp") / F.col("nn"), 6)
    return (
        paired.select("vec_id_a", "vec_id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )
