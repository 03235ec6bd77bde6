"""Similarity search over embedding columns (array<float>).

Reference lineage: pgvector semantic search (arkham-frame/services/
vectors.py:888-934 — cosine `<=>`, L2 `<->`, dot `<#>`; ivfflat ANN index
vectors.py:469-548). Spark restatement:

- brute_force_topk: exact top-k by cosine/dot/L2 against a query vector —
  native zip_with/aggregate fold, TakeOrderedAndProject for the top-k.
  The baseline path; at 10^12 rows this is one scan + per-partition top-k.
- lsh_bucket_topk: random-hyperplane LSH (sign bits of dot with H seeded
  pseudo-planes derived from xxhash — no stored plane matrix) → probe only
  the query's bucket (optionally multi-probe neighbors at Hamming 1). The
  scale path: the scan prunes to ~1/2^H of the corpus per probe.
- pairwise_cosine_above: all pairs with cosine ≥ τ via block self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _fold_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(_fold_dot(a, a))


def _score(metric: str, v, q):
    if metric == "cosine":
        return _fold_dot(v, q) / (_norm(v) * _norm(q))
    if metric == "dot":
        return _fold_dot(v, q)
    if metric == "l2":
        return -F.sqrt(
            F.aggregate(
                F.zip_with(v, q, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    raise ValueError(f"unknown metric {metric}")


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.select(F.col(id_col), _score(metric, v, q).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _plane_component(h_bit: int, dim_idx, plane_idx):
    # pseudo-plane component in {-1, +1} from a 64-bit mix of (dim, plane):
    # deterministic, identical on any executor, no plane matrix to broadcast
    mixed = F.xxhash64(
        F.concat_ws(":", dim_idx.cast("string"), plane_idx.cast("string"))
    )
    return F.when(mixed.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def hyperplane_bucket(vec_col, n_planes: int = 12):
    """Bucket id = sign bits of dot(v, plane_j) for H pseudo-random ±1 planes."""
    v = vec_col
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda j: F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.sequence(F.lit(0), F.size(v) - 1),
                    lambda x, i: x * _plane_component(1, i, j),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(n_planes)])
    return F.aggregate(
        F.zip_with(bits, powers, lambda b, p: b * p),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def lsh_bucket_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN: probe the query's hyperplane bucket (+ Hamming-1 neighbors)."""
    v = F.col(vec_col).cast("array<double>")
    bucketed = emb.select(
        F.col(id_col), v.alias("v"), hyperplane_bucket(v, n_planes).alias("bucket")
    )

    spark = emb.sparkSession
    qdf = spark.createDataFrame([(query_vec,)], f"qv: array<double>").select(
        F.col("qv"), hyperplane_bucket(F.col("qv"), n_planes).alias("qbucket")
    )
    qrow = qdf.collect()[0]
    qbucket = qrow["qbucket"]
    probes = [qbucket] + (
        [qbucket ^ (1 << j) for j in range(n_planes)] if multiprobe else []
    )

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.where(F.col("bucket").isin(probes))
        .select(F.col(id_col), _score("cosine", F.col("v"), q).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def pairwise_cosine_above_banded(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs via BANDED hyperplane LSH (OR-construction):
    B bands of R sign-bits each; a pair is a candidate if ANY band matches,
    then exact cosine ≥ threshold verifies. For cosine ≥ 0.9999 (θ ≈ 0.014
    rad) the per-pair miss probability is (1 − (1−θ/π)^R)^B ≈ 1e-14 at
    B=8, R=4 — the hyperplane analogue of the MinHash-LSH band join in
    operators.dedup, and the scale path over the single-bucket variant
    (which has no amplification and misses plane-straddling pairs)."""
    v = F.col(vec_col).cast("array<double>")
    total_planes = bands * rows_per_band
    bits = emb.select(
        F.col(id_col), v.alias("v"),
        hyperplane_bucket(v, total_planes).alias("allbits"),
    )
    banded = bits.select(
        F.col(id_col), "v",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("allbits"), b * rows_per_band).bitwiseAND(
                        F.lit((1 << rows_per_band) - 1)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    a, c = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("cosine", _score("cosine", F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def pairwise_cosine_above(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Near-duplicate embedding pairs: bucket by hyperplane LSH, exact cosine
    within buckets (embedding-cosine near-dup for training pipelines)."""
    v = F.col(vec_col).cast("array<double>")
    b = emb.select(
        F.col(id_col), v.alias("v"), hyperplane_bucket(v, n_planes).alias("bucket")
    )
    a, c = b.alias("a"), b.alias("b")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        _score("cosine", F.col("a.v"), F.col("b.v")).alias("cosine"),
    )
    return pairs.where(F.col("cosine") >= threshold)
