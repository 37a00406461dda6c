"""Streaming NEAR-duplicate dedup: a document stream continuously
probed against a growing member-level signature index.

The production composition for an always-on crawl ingest: Structured
Streaming owns the source progress tracking (checkpointed offsets,
at-least-once foreachBatch), and each microbatch runs the batch
incremental prober (`increment.dedup_increment` — exact hash probe +
MinHash-LSH band join vs the index, the batch generalization of the
reference's insert-if-absent dictionary loop,
/root/reference/src/dictionary.c:61-78).

Contrast with `incremental.stream_dedup_flags` (exact-only, per-hash
Spark state): that path keeps state INSIDE the state store and cannot
express a band join (near-dup candidates need cross-group joins, which
per-key streaming state cannot see). Routing each microbatch through
the batch prober is the standard Spark answer (foreachBatch) — every
tier, cap, and metric of the batch path applies unchanged.

Restart/replay contract (foreachBatch is AT-LEAST-ONCE; this module
makes each batch idempotent instead of pretending exactly-once):

- With `index_dir`, the index is versioned per batch
  (`index_dir/batch=N` = the index AFTER batch N; the initial index is
  written as `batch=-1` — an Iceberg deployment would make these table
  snapshots). Batch N always probes version N-1 read from disk, and
  (re)writes its outputs with overwrite — so a replayed or
  crash-restarted batch recomputes byte-identical results, and a
  restart needs only the same `checkpoint_dir` + `index_dir` (a fresh
  cold StreamIncrementState is fine).
- Without `index_dir` (in-memory index only), a batch that cannot be
  served from the live in-memory lineage (state.last_batch != N-1)
  raises instead of silently probing a wrong index — restart requires
  re-running from a fresh checkpoint.
- Assignments/merges are written per batch to `<dir>/batch=N` with
  overwrite (partition discovery exposes `batch` as a column), so
  replays cannot duplicate rows.

Semantics inherited from `increment.dedup_increment`: doc_ids monotone
across batches (violated -> ValueError); without base texts, borderline
LSH candidates are decided by the signature estimate (documented
trade). A batch bridging two earlier clusters emits merge rows; rows
already written for earlier batches are NOT rewritten in place —
`resolved_assignments` folds the accumulated merge log into the final
view (the compaction step, exactly like the batch path's remap).
"""

from __future__ import annotations

import os
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


def empty_index(
    spark: SparkSession,
    cfg: DedupConfig | None = None,
    with_simhash: bool = False,
) -> DataFrame:
    """A zero-row member index (cold start: no base corpus).

    Pass `cfg` to pin the signature config on the minhash column
    (exactly like increment.index_from_enriched) — then a restart that
    probes persisted index versions with a DRIFTED config (hash_seed /
    shingle_k / band layout) fails fast with ConfigMismatch instead of
    silently collapsing LSH recall to exact-only.

    `with_simhash=True` adds the 8-byte simhash column so a cold-start
    stream can run the simhash increment tier (index schema is sticky
    across increments — the first batch decides it)."""
    schema = INDEX_SCHEMA + (", simhash long" if with_simhash else "")
    df = spark.createDataFrame([], schema)
    return _pin_sig(df, cfg) if cfg is not None else df


def _pin_sig(index: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Validate-then-stamp the signature-config pin — shared helper
    (increment.pin_sig_config) so the streaming version writer and the
    batch CLI can never drift in pin format; an existing mismatched pin
    raises ConfigMismatch BEFORE anything is persisted (round-4
    advice: a warm index pinned to a drifted config must not be
    re-stamped, or a batch-0 restart would pass the guard and let LSH
    recall collapse silently)."""
    from ..increment import pin_sig_config

    return pin_sig_config(index, cfg)


@dataclass
class StreamIncrementState:
    """Driver-held cross-batch state: the live member index, the last
    batch it reflects (-1 = initial), and per-batch metrics."""

    index: DataFrame
    last_batch: int = -1
    batch_metrics: dict = field(default_factory=dict)


def _version_path(index_dir: str, batch_id: int) -> str:
    return os.path.join(index_dir, f"batch={batch_id}")


def _require_local(path: str | None, what: str) -> None:
    """The restart/versioning source of truth in this module is
    os.path.exists/isdir/listdir, which silently report 'missing' for
    non-local URIs (s3://, hdfs://) — `had_initial` would be False on
    every batch, batch=-1 overwritten each batch, and a restarted
    batch 0 would probe the cold in-memory index instead of the
    persisted warm initial. Fail fast the way io.py's lineage writer
    explicitly skips remote run_dirs: a remote deployment should back
    these dirs with Iceberg table snapshots (module docstring) or
    mount the store locally."""
    if path is None:
        return
    if "://" in path:
        # even file:// would break: os.path.exists("file:///x") is False
        raise ValueError(
            f"{what}={path!r}: URI schemes are not supported — this "
            "module resolves versions/restarts via the local filesystem "
            "(os.path), which cannot see scheme-qualified stores; use a "
            "plain local path, or an Iceberg-backed deployment"
        )


def stream_dedup_increment(
    stream: DataFrame,
    state: StreamIncrementState,
    assignments_dir: str,
    merges_dir: str | None = None,
    index_dir: str | None = None,
    docs_dir: str | None = None,
    cfg: DedupConfig | None = None,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    collect_stats: bool = False,
    tiers: tuple[str, ...] = ("exact", "minhash"),
) -> StreamingQuery:
    """Start the streaming prober. Returns the StreamingQuery.

    `tiers` is forwarded to `dedup_increment` per microbatch (add
    "simhash" for the pigeonhole tier — requires an index carrying the
    simhash column, e.g. `empty_index(..., with_simhash=True)` for a
    cold start or a pipeline-built warm index).

    Each microbatch: dedup_increment(batch, index@N-1) -> overwrite the
    batch's (doc_id, cluster_id, is_canonical) under
    `assignments_dir/batch=N` (merge rows under `merges_dir/batch=N`
    when given, index version under `index_dir/batch=N`), then advance
    state. Initialize `state` with `empty_index` for a cold start or a
    `build_index`/`index_from_enriched` frame to continue from a batch
    run. Pass `index_dir` for restartability (see module docstring).

    `docs_dir` is the streaming analog of `dedup_increment`'s
    `base_docs`: each batch's raw (doc_id, text) is persisted under
    `docs_dir/batch=N`, and later batches pass the accumulated store so
    BORDERLINE LSH candidates get exact-Jaccard verification instead of
    the estimate-at-threshold decision (a pair within ~1 sigma of the
    threshold can otherwise flip vs a batch run — the trade the batch
    docstring documents). In production this is simply the crawl's
    document table; only the borderline sliver's texts are ever read.
    The FIRST batch has no prior store but still gets exact
    verification: an empty base_docs frame is passed, so
    `dedup_increment` verifies new-new borderline pairs against the
    batch's own texts (texts = batch ∪ base) — with docs_dir set,
    EVERY batch's decisions match the batch pipeline's, including
    batch 0.
    """
    cfg = cfg or DedupConfig()
    _require_local(index_dir, "index_dir")
    _require_local(docs_dir, "docs_dir")
    _require_local(assignments_dir, "assignments_dir")
    _require_local(merges_dir, "merges_dir")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # ---- resolve the index this batch must probe: version N-1 ----
        if index_dir is not None:
            want = batch_id - 1
            initial = _version_path(index_dir, -1)
            had_initial = os.path.exists(os.path.join(initial, "_SUCCESS"))
            if not had_initial:
                if (
                    os.path.isdir(initial)
                    and state.index.limit(1).count() == 0
                ):
                    # a batch=-1 DIRECTORY without _SUCCESS means a
                    # prior run crashed mid-write of its initial index,
                    # and the restart came up COLD (empty state). That
                    # partial initial may have been a WARM-start index —
                    # overwriting it with the empty one would
                    # permanently classify every duplicate of the warm
                    # base as unique, silently. A warm restart (non-
                    # empty state.index) legitimately rewrites the
                    # partial dir; a cold one must decide explicitly.
                    raise RuntimeError(
                        f"partial initial index at {initial} (no "
                        "_SUCCESS — a previous run crashed before "
                        "committing it) and this restart's state is "
                        "EMPTY. Re-supply the original warm index in "
                        "StreamIncrementState, or delete the partial "
                        "directory for a genuine cold start."
                    )
                # pin the signature config on the persisted version so a
                # restart with a drifted config fails fast (the
                # increment's ConfigMismatch guard reads this metadata)
                _pin_sig(state.index, cfg).write.mode("overwrite").parquet(
                    initial
                )
            if want == -1 and had_initial:
                # restart of batch 0: the PERSISTED initial version is
                # the source of truth — a cold StreamIncrementState
                # (empty index) must not shadow a warm-start initial
                # written by the original process
                index_in = spark.read.parquet(initial)
            elif state.last_batch == want:
                # fast path: for want >= 0 the in-memory frame was read
                # back from the persisted version, so memory == disk
                index_in = state.index
            else:  # restart or in-session replay: read the version
                index_in = spark.read.parquet(_version_path(index_dir, want))
        elif state.last_batch == batch_id - 1:
            index_in = state.index
        else:
            raise RuntimeError(
                f"batch {batch_id} needs index version {batch_id - 1} but "
                f"in-memory state is at {state.last_batch} and no "
                "index_dir was configured — cannot replay/restart "
                "safely; pass index_dir (versioned index) or restart "
                "from a fresh checkpoint"
            )

        base_docs = None
        if docs_dir is not None:
            prior = [
                p
                for p in (os.listdir(docs_dir) if os.path.isdir(docs_dir) else [])
                if p.startswith("batch=")
                and int(p.split("=")[1]) < batch_id
            ]
            if prior:
                base_docs = spark.read.parquet(
                    *[os.path.join(docs_dir, p) for p in prior]
                ).select(id_col, text_col)
            else:
                # first batch: no prior store, but verification must
                # still run — an EMPTY base frame makes dedup_increment
                # exact-verify new-new borderline pairs against the
                # batch's own texts (texts = batch ∪ base). Without
                # this, batch 0's borderline pairs would be decided by
                # the MinHash estimate while every later batch (and the
                # batch pipeline) exact-verifies — a borderline pair in
                # the first batch could flip vs ground truth.
                base_docs = batch_df.select(id_col, text_col).limit(0)

        inc = dedup_increment(
            spark,
            batch_df,
            index_in,
            cfg,
            base_docs=base_docs,
            id_col=id_col,
            text_col=text_col,
            # per-batch candidate accounting (dropped pairs etc.) lands
            # in state.batch_metrics[batch_id]["lsh_candidates"]
            collect_stats=collect_stats,
            tiers=tiers,
        )
        if docs_dir is not None:
            batch_df.select(id_col, text_col).write.mode("overwrite").parquet(
                os.path.join(docs_dir, f"batch={batch_id}")
            )
        # per-batch overwrite => replays are idempotent, never append dups
        inc.assignments.write.mode("overwrite").parquet(
            os.path.join(assignments_dir, f"batch={batch_id}")
        )
        if merges_dir is not None:
            inc.merges.write.mode("overwrite").parquet(
                os.path.join(merges_dir, f"batch={batch_id}")
            )
        if index_dir is not None:
            # every persisted version carries the sig-config pin, even
            # when the run started from an unpinned in-memory index
            _pin_sig(inc.index, cfg).write.mode("overwrite").parquet(
                _version_path(index_dir, batch_id)
            )
            # read back: the persisted version is the lineage cut
            state.index = spark.read.parquet(_version_path(index_dir, batch_id))
        else:
            state.index = inc.index.localCheckpoint(eager=True)
        state.last_batch = batch_id
        state.batch_metrics[batch_id] = inc.metrics

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def resolved_assignments(
    spark: SparkSession, assignments_dir: str, merges_dir: str | None = None
) -> DataFrame:
    """The final merged view of a streaming run: per-batch assignment
    rows with the accumulated cross-batch merges folded in.

    Merges are applied in batch order: batch i's merge target is a
    cluster id that is live AT batch i and can only be remapped by a
    LATER batch's map. The maps are composed to a single root map ON
    THE DRIVER (the merge log is broadcast-sized by construction — one
    row per bridged base cluster, collected here exactly as the batch
    list used to be) and applied with ONE broadcast join. The previous
    formulation joined once per batch, growing the logical plan
    linearly with batch count — planning time and driver memory blew
    up on long-running streams even though each step was tiny.
    is_canonical is recomputed against the final cluster id.
    """
    # same guard as the write path: os.path.isdir on a URI-scheme
    # merges_dir is silently False, which would DROP the whole merge
    # log and return stale pre-merge cluster ids — loud beats wrong
    _require_local(merges_dir, "merges_dir")
    a = spark.read.parquet(assignments_dir).select(
        "doc_id", "cluster_id"
    )
    if merges_dir is not None and os.path.isdir(merges_dir):
        rows = (
            spark.read.parquet(merges_dir)
            .select("batch", "old_cluster_id", "merged_into")
            .collect()
        )
        rows.sort(key=lambda r: r["batch"])
        root: dict[int, int] = {}
        for r in rows:
            old, into = r["old_cluster_id"], r["merged_into"]
            # batch order => `into` is live at this batch; resolve any
            # EARLIER chain ending at `old`, and `into` itself may be
            # remapped by a later batch — handled because later rows
            # update every key currently pointing at their `old`
            root = {k: (into if v == old else v) for k, v in root.items()}
            root[old] = into
        if root:
            m = F.broadcast(
                spark.createDataFrame(
                    list(root.items()), "old_cluster_id long, merged_into long"
                )
            )
            a = a.join(m, a.cluster_id == m.old_cluster_id, "left").select(
                "doc_id",
                F.coalesce("merged_into", "cluster_id").alias("cluster_id"),
            )
    return a.withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
