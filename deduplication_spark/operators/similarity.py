"""Similarity search over embedding columns (array<float>).

Two paths, sharing one scoring definition:

- `cosine_topk` — brute-force exact top-k: cross join + sequential-fold
  dot products (JVM codegen; no Python). The correctness baseline and
  the right choice when the query set is small.
- `lsh_topk` — the scale path: random-hyperplane (sign) LSH buckets
  candidates first, so each query scores only vectors sharing a bucket
  in some table. Same bucket_pairs-style grouping discipline as the
  text tiers; recall is tunable via (n_tables, n_bits).

Random hyperplanes are drawn from a seeded generator and folded into a
broadcast literal array, so bucketing is deterministic and pure
Catalyst (no UDF): sign bit b of table t = sign(v . h[t*bits+b]),
packed into one long per table.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(c):
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


def with_cosine(pairs: DataFrame, a_col: str = "qv", b_col: str = "v") -> DataFrame:
    return pairs.withColumn(
        "cos_sim",
        _dot(F.col(a_col), F.col(b_col))
        / (_norm(F.col(a_col)) * _norm(F.col(b_col))),
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force: (query_id, neighbor_id, cos_sim, rank)."""
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    sims = with_cosine(
        q.crossJoin(e).filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_tables: int = 8,
    n_bits: int = 12,
    seed: int = 0x5EED,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds (table_idx, bucket) rows per input row — one per hash table.

    bucket = the n_bits sign pattern of the vector against that table's
    hyperplanes, packed into a long. Pure Catalyst over a broadcast
    literal hyperplane matrix.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_bits, dim))
    v = F.col(vec_col).cast("array<double>")
    tables = []
    for t in range(n_tables):
        bits = [
            F.when(
                _dot(
                    v,
                    F.array(
                        *[F.lit(float(x)) for x in planes[t * n_bits + b]]
                    ),
                )
                >= 0,
                F.lit(1 << b).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for b in range(n_bits)
        ]
        acc = bits[0]
        for x in bits[1:]:
            acc = acc + x
        tables.append(
            F.struct(F.lit(t).alias("table_idx"), acc.alias("bucket"))
        )
    return df.select("*", F.explode(F.array(*tables)).alias("_h")).select(
        *df.columns, F.col("_h.table_idx"), F.col("_h.bucket")
    )


def cosine_near_dup(
    embeddings: DataFrame,
    threshold: float,
    method: str = "lsh",
    dim: int | None = None,
    n_tables: int = 16,
    n_bits: int = 8,
    seed: int = 0x5EED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a_id, b_id, cos_sim)
    with cos_sim >= threshold and a_id < b_id.

    The embedding analog of the text near-dup tiers (reference semantic:
    duplicate detection by content equality, src/dictionary.c:49-59,
    relaxed to angular similarity).

    method="brute" — exact all-pairs. O(n^2): the oracle baseline for
    small frames and correctness checks only, mirroring `cosine_topk`.

    method="lsh" — the scale path: self-join on hyperplane-LSH
    (table_idx, bucket) so only vectors sharing a bucket in some table
    are ever scored; no cross join materializes. Recall is governed by
    (n_tables, n_bits) against the threshold's angle: with the defaults
    (16 tables x 8 bits) a cos >= 0.9 pair collides in >= 1 table with
    p ~= 0.996. Meant for high thresholds (>= ~0.9) — at low thresholds
    the collision probability (and thus recall) collapses, which is why
    the brute path stays the oracle.
    """
    e = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    if method == "brute":
        a = e.select(F.col("_id").alias("a_id"), F.col("_v").alias("qv"))
        b = e.select(F.col("_id").alias("b_id"), F.col("_v").alias("v"))
        cand = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
    elif method == "lsh":
        if dim is None:
            raise ValueError("dim is required for method='lsh'")
        hb = hyperplane_buckets(e, dim, n_tables, n_bits, seed, "_v")
        a = hb.select(
            F.col("_id").alias("a_id"), F.col("_v").alias("qv"),
            "table_idx", "bucket",
        )
        b = hb.select(
            F.col("_id").alias("b_id"), F.col("_v").alias("v"),
            "table_idx", "bucket",
        )
        cand = (
            a.join(b, ["table_idx", "bucket"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "qv", "b_id", "v")
            .distinct()
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return (
        with_cosine(cand)
        .filter(F.round("cos_sim", 4) >= threshold)
        .select("a_id", "b_id", F.round("cos_sim", 4).alias("cos_sim"))
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_tables: int = 8,
    n_bits: int = 12,
    seed: int = 0x5EED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only (query, vector) pairs sharing an LSH
    bucket in at least one table. Equi-join on (table_idx, bucket) — the
    100 TB-shaped plan: no cross join ever materializes."""
    eb = hyperplane_buckets(embeddings, dim, n_tables, n_bits, seed, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        "table_idx",
        "bucket",
    )
    qb = hyperplane_buckets(queries, dim, n_tables, n_bits, seed, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        "table_idx",
        "bucket",
    )
    cand = (
        qb.join(eb, ["table_idx", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "v")
        .distinct()
    )
    sims = with_cosine(cand)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
