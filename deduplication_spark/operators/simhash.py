"""Near-duplicate tier 3: 64-bit SimHash fingerprints + pigeonhole
chunk bucketing + exact Hamming verification.

Complements MinHash: SimHash is sensitive to *weighted bit agreement*
across the whole shingle set, catching high-overlap docs whose Jaccard
sits just under the LSH S-curve. Candidates are verified by exact
Hamming distance, so the tier adds recall without precision cost.

Pigeonhole guarantee: split 64 bits into `simhash_chunks` equal chunks;
any pair with Hamming distance <= hamming_radius (< chunks) must agree
exactly on at least one chunk, so bucketing on (chunk_idx, chunk_value)
finds ALL such pairs — no probabilistic miss (unlike LSH banding).

All Catalyst built-ins except the fingerprint UDF itself
(functions/hashing.py::make_simhash_udf).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..functions.hashing import make_simhash_udf
from .candidates import bucket_pairs


def with_simhash(docs_with_shingles: DataFrame) -> DataFrame:
    """Adds `simhash` (bigint; NULL for empty shingle sets)."""
    udf = make_simhash_udf()
    return docs_with_shingles.withColumn("simhash", udf(F.col("shingles")))


def simhash_chunk_buckets(
    docs_with_simhash: DataFrame, cfg: DedupConfig, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_val): chunk c = bits [c*w, (c+1)*w) of the
    fingerprint, w = 64 / simhash_chunks. shiftright on bigint is
    arithmetic, so the top chunk is masked after the shift."""
    width = 64 // cfg.simhash_chunks
    mask = (1 << width) - 1
    sh = F.col("simhash")
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftright(sh, c * width).bitwiseAND(F.lit(mask)).alias("chunk_val"),
            )
            for c in range(cfg.simhash_chunks)
        ]
    )
    return (
        docs_with_simhash.filter(sh.isNotNull())
        .select(id_col, F.explode(chunks).alias("c"))
        .select(id_col, F.col("c.chunk_idx"), F.col("c.chunk_val"))
    )


def verify_hamming(
    pairs: DataFrame,
    docs_with_simhash: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
) -> DataFrame:
    """(a, b, hamming) for pairs with Hamming(simhash_a, simhash_b) <=
    hamming_radius. bit_count(a XOR b) — pure codegen; the join sides
    carry only two longs per row."""
    f = docs_with_simhash.select(F.col(id_col).alias("_id"), "simhash")
    return (
        pairs.join(f.select(F.col("_id").alias("a"), F.col("simhash").alias("_sa")), "a")
        .join(f.select(F.col("_id").alias("b"), F.col("simhash").alias("_sb")), "b")
        .withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .filter(F.col("hamming") <= cfg.hamming_radius)
        .select("a", "b", "hamming")
    )


def simhash_edges(
    docs_with_shingles: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    with_metrics: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """End-to-end tier from a docs frame that already has `shingles`.

    Returns (verified edges (a, b, hamming), candidate metrics), both
    eagerly materialized. `enriched` is persisted while the tier runs
    (it feeds the bucket path and BOTH sides of the Hamming join — the
    SimHash UDF would otherwise evaluate up to 3x) and released BEFORE
    returning — same persist-hygiene fix as minhash_edges. Pass
    with_metrics=False to skip the candidate-accounting aggregation
    (metrics is None); it cannot be returned lazily once the cache is
    released."""
    enriched = with_simhash(docs_with_shingles).persist()
    try:
        buckets = simhash_chunk_buckets(enriched, cfg, id_col)
        cand = bucket_pairs(
            buckets, ["chunk_idx", "chunk_val"], id_col=id_col, cap=cfg.bucket_pair_cap
        )
        edges = verify_hamming(
            cand.pairs, enriched.select(id_col, "simhash"), cfg, id_col
        ).localCheckpoint(eager=True)
        metrics = cand.metrics.localCheckpoint(eager=True) if with_metrics else None
    finally:
        enriched.unpersist()
    return edges, metrics
