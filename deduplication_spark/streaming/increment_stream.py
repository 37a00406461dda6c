"""Streaming NEAR-duplicate dedup: a document stream continuously
probed against a growing member-level signature index.

The production composition for an always-on crawl ingest: Structured
Streaming owns the source/trigger/exactly-once bookkeeping, and each
microbatch runs the batch-incremental prober (`increment.dedup_increment`
— exact hash probe + MinHash-LSH band join vs the index, the batch
generalization of the reference's insert-if-absent dictionary loop,
/root/reference/src/dictionary.c:61-78). The index is driver-held
lineage-cut state (`localCheckpoint` per batch; at production scale it
would be a compacted Iceberg table rewritten per batch) that grows by
exactly the new batch's member rows.

Contrast with `incremental.stream_dedup_flags` (exact-only, per-hash
Spark state): that path keeps state INSIDE the state store and cannot
express a band join (near-dup candidates need cross-group joins, which
per-key streaming state cannot see). Routing each microbatch through
the batch prober is the standard Spark answer (foreachBatch) — every
tier, cap, and metric of the batch path applies unchanged.

Semantics and trades, all inherited from `increment.dedup_increment`:
- doc_ids must be monotone across batches (append-only crawl);
  violated -> ValueError, never silent misassignment.
- without base texts, borderline LSH candidates are decided by the
  signature estimate at the threshold (unbiased; documented trade).
- a batch bridging two earlier clusters emits merge rows; assignments
  written for earlier batches are NOT rewritten (append-only sink) —
  the merges output is the compaction work list, exactly like the
  batch path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import DedupConfig
from ..increment import dedup_increment

INDEX_SCHEMA = (
    "member_id long, cluster_id long, content_hash binary, "
    "minhash array<bigint>"
)


def empty_index(spark: SparkSession) -> DataFrame:
    """A zero-row member index (cold start: no base corpus)."""
    return spark.createDataFrame([], INDEX_SCHEMA)


@dataclass
class StreamIncrementState:
    """Driver-held cross-batch state: the live member index plus
    per-batch metrics (batch_id -> dedup_increment metrics)."""

    index: DataFrame
    batch_metrics: dict = field(default_factory=dict)


def stream_dedup_increment(
    stream: DataFrame,
    state: StreamIncrementState,
    assignments_dir: str,
    merges_dir: str | None = None,
    cfg: DedupConfig | None = None,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Start the streaming prober. Returns the StreamingQuery.

    Each microbatch: dedup_increment(batch, state.index) -> append the
    batch's (doc_id, cluster_id, is_canonical) to `assignments_dir`
    (plus merge rows to `merges_dir` when given), then advance
    state.index (lineage-cut). Initialize `state` with `empty_index`
    for a cold start or a `build_index`/`index_from_enriched` frame to
    resume from a batch run.
    """
    cfg = cfg or DedupConfig()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = dedup_increment(
            spark,
            batch_df,
            state.index,
            cfg,
            id_col=id_col,
            text_col=text_col,
        )
        inc.assignments.write.mode("append").parquet(assignments_dir)
        if merges_dir is not None:
            inc.merges.withColumn(
                "batch_id", F.lit(batch_id)
            ).write.mode("append").parquet(merges_dir)
        # lineage cut: without it the index plan grows by one
        # dedup_increment per batch and re-executes from batch 0
        state.index = inc.index.localCheckpoint(eager=True)
        state.batch_metrics[batch_id] = inc.metrics

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
