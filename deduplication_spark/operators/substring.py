"""Near-duplicate tier 4: long exact-substring duplicates.

Catches pairs sharing a verbatim span >= cfg.substring_min_len chars
that shingle/MinHash misses (the span being a small fraction of either
doc keeps Jaccard far below threshold). Two stages:

1. **Candidates** — content-defined chunking (functions/chunking.py):
   each doc -> chunks with content fingerprints; docs sharing any
   fully-interior chunk of a shared span get identical fingerprints,
   so a groupBy(chunk_fp) bucket join finds them. Same skew-capped
   bucket_pairs machinery as the LSH tier (giant buckets = boilerplate).
2. **Verification** — exact common-substring test at L = substring_min_len
   via Rabin-Karp L-gram fingerprint intersection (vectorized numpy in a
   pandas UDF; a pair passes iff the docs share some length-L substring).
   This replaces the SURVEY's per-group suffix-array sketch with an
   equivalent-semantics, fully-vectorizable check: "exists common
   substring >= L" needs only ONE fingerprint-set intersection, not the
   full suffix array (monotonicity: any longer common span contains an
   L-gram).

Scale: the verify join carries text for candidate pairs only (post-cap,
post-anti-join against already-found edges in the pipeline), never for
the full corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import DedupConfig
from .candidates import CandidateResult, bucket_pairs


def make_chunk_udf(cfg: DedupConfig):
    """pandas UDF: text -> array<struct<fp:bigint, len:int>> of CDC chunks.

    Chunks shorter than chunk_min_len exist only at forced boundaries;
    all fingerprints are content-only (offset-independent).
    """
    min_len, avg_len, max_len = cfg.chunk_min_len, cfg.chunk_avg_len, cfg.chunk_max_len

    @pandas_udf("array<struct<fp:bigint,len:int>>")
    def cdc_chunk_fps(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # batch-global kernel: one gear matmul + one prefix-poly per
        # Arrow batch — the per-doc cdc_chunks call was numpy-call-
        # overhead-bound on ~1 KB web docs (measured 5x on the 1M-doc
        # cand_substring stage; bit-identical output, property-tested)
        from deduplication_spark.functions.chunking import cdc_chunks_batch

        for series in it:
            payloads = [
                t.encode("utf-8") if t is not None else None for t in series
            ]
            chunked = cdc_chunks_batch(payloads, min_len, avg_len, max_len)
            yield pd.Series(
                [
                    [(fp, ln) for (_s, ln, fp) in chunks]
                    if chunks is not None
                    else None
                    for chunks in chunked
                ],
                dtype=object,
            )

    return cdc_chunk_fps


def make_chunk_shape_udf(cfg: DedupConfig):
    """pandas UDF: text -> struct<covered_bytes:bigint, max_len_ok:boolean,
    head_min_len_ok:boolean, n_chunks_bounded:boolean> — the chunk-geometry
    invariants of q_cdc_chunks computed INSIDE the chunk UDF pass.

    The unfused formulation shipped the full chunk array back to the JVM
    and then re-evaluated `transform(coalesce(chunks, []))` once per
    invariant in an interpreted Project (8 traversals/row — higher-order
    functions don't codegen). Folding the geometry checks into the same
    Python batch that computes the chunks removes the array Arrow
    transfer and the interpreted traversals entirely (guide §4.1/§4.2);
    the arithmetic mirrors the Catalyst expressions exactly:
    ceil/floor over float division matches Spark's double `/` for any
    realistic byte length (exact in float64 below 2^53)."""
    import math

    min_len, avg_len, max_len = cfg.chunk_min_len, cfg.chunk_avg_len, cfg.chunk_max_len

    @pandas_udf(
        "struct<covered_bytes:bigint,max_len_ok:boolean,"
        "head_min_len_ok:boolean,n_chunks_bounded:boolean>"
    )
    def chunk_shape(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        from deduplication_spark.functions.chunking import cdc_chunks_batch

        for series in it:
            payloads = [
                t.encode("utf-8") if t is not None else None for t in series
            ]
            chunked = cdc_chunks_batch(payloads, min_len, avg_len, max_len)
            rows = []
            for chunks in chunked:
                lens = (
                    [ln for (_s, ln, _fp) in chunks] if chunks is not None else []
                )
                s, n = sum(lens), len(lens)
                rows.append(
                    (
                        s,
                        all(ln <= max_len for ln in lens),
                        all(ln >= min_len for ln in lens[:-1]),
                        n >= math.ceil(s / max_len)
                        and n <= math.floor((s - 1) / min_len) + 1,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "covered_bytes",
                    "max_len_ok",
                    "head_min_len_ok",
                    "n_chunks_bounded",
                ],
                index=series.index,
            )

    return chunk_shape


def chunk_buckets(
    docs: DataFrame, cfg: DedupConfig, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, chunk_fp) memberships, distinct, chunks >= chunk_min_len
    only (sub-min forced-boundary fragments are too collision-prone as
    candidate keys)."""
    udf = make_chunk_udf(cfg)
    return (
        docs.select(id_col, F.explode(udf(F.col(text_col))).alias("c"))
        .filter(F.col("c.len") >= cfg.chunk_min_len)
        .select(id_col, F.col("c.fp").alias("chunk_fp"))
        .distinct()
    )


def substring_candidates(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    reuse_input: bool = False,
) -> CandidateResult:
    """`reuse_input=True` persists the chunk memberships so the CDC UDF
    pass runs once even when both pairs and metrics are acted on."""
    buckets = chunk_buckets(docs, cfg, id_col, text_col)
    return bucket_pairs(
        buckets,
        ["chunk_fp"],
        id_col=id_col,
        cap=cfg.bucket_pair_cap,
        reuse_input=reuse_input,
    )


def verify_substring(
    pairs: DataFrame,
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b) pairs that share an exact substring of length >=
    substring_min_len (utf-8 byte-level; exact for ASCII text)."""
    L = cfg.substring_min_len
    # per-row Rabin-Karp cost, not per-byte: defeat AQE byte-based
    # coalescing (see candidates.verify_jaccard)
    spark = pairs.sparkSession
    pairs = pairs.repartition(2 * spark.sparkContext.defaultParallelism, "a")
    t = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    joined = (
        pairs.join(t.select(F.col("_id").alias("a"), F.col("_t").alias("_ta")), "a")
        .join(t.select(F.col("_id").alias("b"), F.col("_t").alias("_tb")), "b")
    )

    @pandas_udf("boolean")
    def shares_long_span(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        from deduplication_spark.functions.chunking import has_common_gram

        for frame in it:
            ta, tb = frame.iloc[:, 0], frame.iloc[:, 1]
            yield pd.Series(
                [
                    has_common_gram(x.encode("utf-8"), y.encode("utf-8"), L)
                    if x is not None and y is not None
                    else False
                    for x, y in zip(ta, tb)
                ]
            )

    return (
        joined.withColumn("_ok", shares_long_span(F.struct("_ta", "_tb")))
        .filter(F.col("_ok"))
        .select("a", "b")
    )


def substring_edges(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    exclude_pairs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end tier. `exclude_pairs` (a, b) — candidates already found
    by cheaper tiers — are anti-joined away before the (text-carrying)
    verification join."""
    cand = substring_candidates(docs, cfg, id_col, text_col)
    pairs = cand.pairs
    if exclude_pairs is not None:
        pairs = pairs.join(exclude_pairs.select("a", "b"), ["a", "b"], "left_anti")
    edges = verify_substring(pairs, docs, cfg, id_col, text_col)
    return edges, cand.metrics
