"""Near-duplicate tier 2: k-shingles -> MinHash signatures -> LSH band
buckets -> capped candidate pairs -> exact-Jaccard verification.

Reference semantic being generalized: block byte-equality dedup
(/root/reference/src/dictionary.c:49-78) relaxed from "identical bytes"
to "shingle-set Jaccard >= threshold" (BASELINE.json north_star).

Dataflow (one map stage + two shuffles before verification):
  docs --[codegen: shingle_hashes]--> shingles
       --[pandas UDF: minhash]-->   signature array<long>[num_perm]
       --[codegen: band_hash_col]-> band hashes array<long>[bands]
       --posexplode-->              (doc_id, band_idx, band_hash)
       --bucket_pairs-->            candidate (a, b)
       --verify_jaccard-->          edges (a, b, jaccard >= t)

Probability a pair with Jaccard j becomes a candidate:
1 - (1 - j^r)^b. At the default b=32, r=4: midpoint (1/32)^(1/4) ~ 0.42
and j >= 0.8 pairs are caught w.p. 1 - (1-0.8^4)^32 ~ 1 - 5e-8 — the
analytic backing for the >= 0.99 recall target (BASELINE.md). The
b=16 x r=8 alternative caps at 0.947 at j=0.8 and cannot meet it; the
low midpoint's extra candidates are pruned by estimate bands + exact
verification (operators/candidates.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..functions.hashing import band_hash_col, band_key_col, make_minhash_udf
from ..functions.text import shingle_hashes
from .candidates import (
    CandidateResult,
    bucket_pairs,
    estimate_prefilter,
    verify_jaccard,
)


def with_shingles(
    docs: DataFrame, cfg: DedupConfig, text_col: str = "text"
) -> DataFrame:
    """Adds `shingles` (distinct hashed k-grams; empty for short docs)."""
    return docs.withColumn(
        "shingles", shingle_hashes(text_col, cfg.shingle_k, cfg.hash_seed)
    )


def with_minhash(docs_with_shingles: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Adds `minhash` (array<long>[num_perm]; NULL for empty shingle sets)."""
    udf = make_minhash_udf(cfg.num_perm, cfg.hash_seed)
    return docs_with_shingles.withColumn("minhash", udf(F.col("shingles")))


def band_buckets(docs_with_minhash: DataFrame, cfg: DedupConfig, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, band_idx, band_hash) — one row per (doc, band).

    Short docs (NULL minhash — the partial-block analog,
    /root/reference/src/compressor.c:88-93) are excluded here and
    handled by the exact tier only.
    """
    return (
        docs_with_minhash.filter(F.col("minhash").isNotNull())
        .select(
            id_col,
            F.posexplode(
                band_hash_col("minhash", cfg.rows_per_band, cfg.bands, cfg.hash_seed)
            ).alias("band_idx", "band_hash"),
        )
    )


def band_key_buckets(
    docs_with_minhash: DataFrame, cfg: DedupConfig, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, band_key) — compact membership frame for the candidate
    path: one combined 8-byte key per (doc, band) instead of the
    (band_idx, band_hash) pair `band_buckets` emits for inspection.
    This frame feeds the LSH tier's dominant exchange (corpus x bands
    rows), so key bytes per row are the scale lever; see
    functions.hashing.band_key_col for the collision analysis."""
    return docs_with_minhash.filter(F.col("minhash").isNotNull()).select(
        id_col,
        F.explode(
            band_key_col("minhash", cfg.rows_per_band, cfg.bands, cfg.hash_seed)
        ).alias("band_key"),
    )


def lsh_candidates(
    docs_with_minhash: DataFrame, cfg: DedupConfig, id_col: str = "doc_id"
) -> CandidateResult:
    buckets = band_key_buckets(docs_with_minhash, cfg, id_col)
    return bucket_pairs(
        buckets, ["band_key"], id_col=id_col, cap=cfg.bucket_pair_cap
    )


def minhash_near_edges(
    pairs: DataFrame,
    signatures: DataFrame,
    cfg: DedupConfig,
    texts: DataFrame | None = None,
    id_col: str = "doc_id",
    prefilter_sigs: bool = False,
) -> DataFrame:
    """Estimate-screen + verify candidate pairs -> (a, b) near edges.

    THE decision procedure of the MinHash tier, shared by the full
    pipeline (texts = the corpus) and the increment prober (texts =
    new batch ∪ base docs when available) so the two implementations
    can never silently desynchronize — any change to the margin
    arithmetic or the borderline tie applies to both.

    Three confidence bands from the signature estimator (margins and
    their sigma analysis documented on DedupConfig.est_reject_margin /
    est_accept_margin): reject below t - reject_margin, accept above
    t + accept_margin, exact-verify the borderline sliver against
    re-shingled `texts`. With texts=None (an increment without
    base-corpus access), borderline pairs are decided by the estimate
    at the threshold itself — unbiased, but a pair within ~sigma can
    flip vs a verified run (documented trade, increment.py).

    `signatures` = (id_col, minhash); `texts` = (id_col, text) —
    shingles are recomputed for the borderline DOCS only (storing them
    corpus-wide costs ~7 KB/row, rivaling the corpus itself).

    `prefilter_sigs=True` (r06, the increment's probe path): when the
    signature table is a LARGE stored index (~1 KB of minhash per row),
    the two estimate joins would each stream the full table against the
    broadcast pair set — twice the index's dominant column per
    increment. Materialize the pairs, semi-join the signature table
    down to just the ids the pairs touch (ONE index scan), checkpoint
    that small slice, and let both estimate joins read the slice.
    Result-identical (the joins only ever read those ids); off by
    default because the full pipeline's signature frame is already a
    small in-memory checkpoint where the extra pass is pure overhead.
    """
    if prefilter_sigs:
        pairs = pairs.localCheckpoint(eager=True)
        ids = (
            pairs.select(F.col("a").alias(id_col))
            .union(pairs.select(F.col("b").alias(id_col)))
            .distinct()
        )
        signatures = signatures.join(
            ids, id_col, "left_semi"
        ).localCheckpoint(eager=True)
    screened = estimate_prefilter(
        pairs,
        signatures,
        id_col=id_col,
        min_estimate=max(
            0.0, cfg.jaccard_verify_threshold - cfg.est_reject_margin
        ),
    ).localCheckpoint(eager=True)
    hi_conf = min(1.0, cfg.jaccard_verify_threshold + cfg.est_accept_margin)
    accepted = screened.filter(F.col("estimate") >= hi_conf)
    borderline = screened.filter(F.col("estimate") < hi_conf)
    if texts is None:
        return accepted.select("a", "b").union(
            borderline.filter(
                F.col("estimate") >= cfg.jaccard_verify_threshold
            ).select("a", "b")
        )
    border_ids = (
        borderline.select(F.col("a").alias(id_col))
        .union(borderline.select(F.col("b").alias(id_col)))
        .distinct()
    )
    # eager checkpoint (r06): verify_jaccard joins this frame on BOTH
    # pair sides, and without materialization the whole text-scan +
    # borderline-join + re-shingle UDF subtree evaluates twice (two
    # full passes over the corpus text). The frame is tiny (borderline
    # docs only) — one materialization, two cheap reads.
    border_shingles = (
        with_shingles(texts.join(border_ids, id_col), cfg)
        .select(id_col, "shingles")
        .localCheckpoint(eager=True)
    )
    verified = verify_jaccard(
        borderline.select("a", "b"),
        border_shingles,
        id_col=id_col,
        threshold=cfg.jaccard_verify_threshold,
    )
    return accepted.select("a", "b").union(verified.select("a", "b"))


def minhash_edges(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_metrics: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """End-to-end tier: returns (verified edges (a,b,jaccard), metrics),
    both eagerly materialized (localCheckpoint).

    `enriched` is persisted while the tier runs — it feeds the
    candidate path AND both sides of the verify join, so without the
    cache the corpus-wide shingle + MinHash UDF subtree would execute
    up to 3x. The cache is released BEFORE returning (round-4 advice:
    a lazy return kept the persist alive forever, accumulating cached
    partitions across calls in a long-lived session); eager
    materialization is what makes the early unpersist safe. Callers
    that only want edges pass with_metrics=False, which skips the
    candidate-accounting aggregation entirely (metrics is None) —
    a lazy metrics frame cannot be returned, as it would recompute the
    whole band-explode subtree after the cache is gone."""
    enriched = with_minhash(
        with_shingles(docs.select(id_col, text_col), cfg), cfg
    ).persist()
    try:
        cand = lsh_candidates(enriched, cfg, id_col)
        edges = verify_jaccard(
            cand.pairs,
            enriched.select(id_col, "shingles"),
            id_col=id_col,
            feature_col="shingles",
            threshold=cfg.jaccard_verify_threshold,
        ).localCheckpoint(eager=True)
        metrics = cand.metrics.localCheckpoint(eager=True) if with_metrics else None
    finally:
        enriched.unpersist()
    return edges, metrics
