"""Candidate-pair generation from equality buckets, with explicit skew
handling — the Spark-native replacement for the reference's O(N*D)
dictionary probe (/root/reference/src/dictionary.c:49-59) generalized to
similarity buckets (LSH bands, SimHash chunks, content chunks).

Design (SURVEY.md §4.2 item 1):

1. Rows arrive as (id, *key_cols) — one row per (doc, bucket) membership.
2. A window over the bucket key ranks members by id. This is a sort-based
   shuffle: hot keys (boilerplate buckets at web scale) spill instead of
   OOM-ing a hash aggregate.
3. Members ranked <= cap take the all-pairs path: sorted collect_list
   (bounded by cap, so the array can never explode) -> pairwise expansion
   entirely in Catalyst (nested transform + flatten), C(m,2) pairs.
4. Members ranked > cap take the chain path: each links to its window
   predecessor via lag(). The first chained member's predecessor has rank
   cap, i.e. is inside the head group — so every bucket stays one
   connected component while emitting only m-1-ish edges for giant
   buckets instead of C(m,2). Dropped-pair counts are reported, never
   silent (SURVEY.md §7 hard part c).
5. Pairs are deduped across buckets/bands BEFORE verification so each
   (a, b) is verified once.

Everything downstream must verify candidates (Jaccard / Hamming /
substring) — capping changes which pairs are *tested*, never what a
verified edge means.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _all_pairs(arr):
    """Catalyst expression: sorted array -> array<struct<a,b>> of all
    C(m,2) ordered pairs (a < b). No Python; stays in codegen."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


@dataclass
class CandidateResult:
    pairs: DataFrame          # (a, b) with a < b, distinct
    metrics: DataFrame        # (n_buckets, n_capped_buckets,
                              #  n_candidate_edges, dropped_pairs)
    shared: DataFrame | None = None  # persisted memberships (reuse_input=True);
                                     # caller unpersists after both jobs ran


def bucket_pairs(
    bucketed: DataFrame,
    key_cols: list[str],
    id_col: str = "doc_id",
    cap: int = 200,
    reuse_input: bool = False,
) -> CandidateResult:
    """(id, *key) bucket memberships -> distinct candidate pairs (a, b), a<b.

    `cap` bounds the all-pairs expansion per bucket; the overflow is
    chain-linked (connectivity-preserving) and counted in metrics.

    `reuse_input=True` persists the membership frame so the pairs job and
    the metrics job evaluate the upstream derivation (CDC UDF pass / band
    explode) exactly once — set it when both DataFrames will be acted on.
    """
    if reuse_input:
        bucketed = bucketed.persist()
    w = Window.partitionBy(*key_cols).orderBy(id_col)
    # bucket size alongside the rank: both window functions share one
    # partition+sort pass (same window spec, whole-partition frame for
    # the count), so filtering singleton buckets costs nothing extra —
    # and at LSH-like bucket distributions ~95%+ of buckets are
    # singletons, so dropping them BEFORE the collect_list aggregation
    # removes almost all of its per-group array allocations (r06,
    # measured: bucket_pairs over 1.6M memberships 2.15 s -> see
    # OPTIMIZATION_r06.md)
    wm = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = bucketed.select(id_col, *key_cols).withColumn(
        "_rn", F.row_number().over(w)
    ).withColumn("_m", F.count(F.lit(1)).over(wm))

    head = (
        ranked.filter((F.col("_m") >= 2) & (F.col("_rn") <= cap))
        .groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
    )
    head_pairs = (
        head.filter(F.size("_ids") >= 2)
        .select(F.explode(_all_pairs(F.col("_ids"))).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )

    tail = (
        ranked.withColumn("_prev", F.lag(id_col).over(w))
        .filter(F.col("_rn") > cap)
        .select(
            F.least("_prev", id_col).alias("a"),
            F.greatest("_prev", id_col).alias("b"),
        )
    )

    pairs = head_pairs.union(tail).filter(F.col("a") != F.col("b")).distinct()

    sizes = bucketed.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("m"))
    metrics = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("m") > cap, 1).otherwise(0)).alias("n_capped_buckets"),
        F.sum(
            F.when(
                F.col("m") <= cap, F.col("m") * (F.col("m") - 1) / 2
            ).otherwise(F.lit(cap) * (cap - 1) / 2 + (F.col("m") - cap))
        ).cast("long").alias("n_candidate_edges"),
        F.sum(
            F.when(
                F.col("m") > cap,
                F.col("m") * (F.col("m") - 1) / 2
                - (F.lit(cap) * (cap - 1) / 2 + (F.col("m") - cap)),
            ).otherwise(0)
        ).cast("long").alias("dropped_pairs"),
    )
    return CandidateResult(
        pairs=pairs, metrics=metrics, shared=bucketed if reuse_input else None
    )


def estimate_prefilter(
    pairs: DataFrame,
    signatures: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    min_estimate: float = 0.5,
) -> DataFrame:
    """Cheap MinHash-estimate screen before exact verification.

    est = fraction of equal signature components (the MinHash Jaccard
    estimator, sigma = sqrt(j(1-j)/num_perm) ~ 0.035 at num_perm=128).
    Screening at 0.5 for a 0.8 exact threshold is ~8 sigma of margin —
    recall loss is negligible while LSH false candidates (a j=0.3 pair
    still collides in some band with p~0.23 at b=32/r=4) are dropped
    before the expensive shingle-array join: signatures are ~1 KB/row
    vs ~7 KB/row for shingle sets at 1k tokens.
    """
    s = signatures.select(F.col(id_col).alias("_sid"), F.col(sig_col).alias("_sv"))
    eq = F.size(
        F.filter(
            F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda m: m
        )
    )
    return (
        pairs.join(s.select(F.col("_sid").alias("a"), F.col("_sv").alias("_sa")), "a")
        .join(s.select(F.col("_sid").alias("b"), F.col("_sv").alias("_sb")), "b")
        .withColumn("estimate", eq / F.size("_sa"))
        .filter(F.col("estimate") >= min_estimate)
        .select("a", "b", "estimate")
    )


def verify_jaccard(
    pairs: DataFrame,
    features: DataFrame,
    id_col: str = "doc_id",
    feature_col: str = "shingles",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact set-Jaccard verification of candidate pairs.

    `features[feature_col]` must be a DISTINCT-element array (shingle
    hashes). Jaccard = |A∩B| / (|A|+|B|-|A∩B|) via array_intersect —
    built-in, codegen'd. Returns (a, b, jaccard) for pairs >= threshold.

    Scale note: two shuffle joins on the id; the feature table is
    projected to (id, features) only, so the shuffle never carries text.
    Run estimate_prefilter first when candidate volume is high.

    The pairs are explicitly repartitioned first: array_intersect cost is
    per-ROW, not per-byte, so AQE's byte-based partition coalescing
    otherwise funnels the whole verification onto a couple of cores
    (measured 3x slowdown at local[32]).
    """
    spark = pairs.sparkSession
    pairs = pairs.repartition(2 * spark.sparkContext.defaultParallelism, "a")
    f = features.select(
        F.col(id_col).alias("_fid"), F.col(feature_col).alias("_fv")
    )
    fa = f.select(F.col("_fid").alias("a"), F.col("_fv").alias("_va"))
    fb = f.select(F.col("_fid").alias("b"), F.col("_fv").alias("_vb"))
    inter = F.size(F.array_intersect("_va", "_vb"))
    union = F.size("_va") + F.size("_vb") - inter
    return (
        pairs.join(fa, "a")
        .join(fb, "b")
        .withColumn(
            "jaccard",
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
