"""Incremental (streaming) exact-dedup over a document stream.

The reference is batch-only (whole file in memory,
/root/reference/src/bin_io.c:39-46); the streaming analog of its
dictionary is Structured Streaming state: the first arrival of each
content hash is the canonical document, later arrivals are flagged
duplicates. Watermarking bounds state exactly the way the reference's
dictionary is bounded by the file's unique blocks — except here state
ages out (late duplicates beyond the watermark are treated as fresh,
an explicit and documented trade).

Two modes:

- `stream_exact_dedup` — `dropDuplicatesWithinWatermark` on the
  content hash: built-in state store, at-least-once canonical
  semantics. The high-throughput path.
- `stream_dedup_flags` — `transformWithStateInPandas`-free variant
  using flatMapGroupsWithState semantics via
  `applyInPandasWithState`: emits EVERY row with (is_duplicate,
  canonical_first_seen_ts), not just survivors.

Batch parity: at `trigger(availableNow=True)` over a static directory,
survivors == batch exact tier canonicals (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_exact_dedup(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup on a streaming DataFrame.

    NULL-text docs (content_hash NULL) bypass the dedup state and are
    all emitted: dropDuplicatesWithinWatermark treats NULL keys as
    EQUAL, which would silently swallow every missing-text doc after
    the first — the batch exact tier keeps them as singletons
    (pipeline.py filters NULL hashes), and streaming must match."""
    hashed = stream.withColumn("content_hash", F.sha2(F.col(text_col), 256))
    deduped = (
        hashed.filter(F.col("content_hash").isNotNull())
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    return deduped.unionByName(hashed.filter(F.col("content_hash").isNull()))


def stream_dedup_flags(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_timeout_ms: int | None = 3_600_000,
) -> DataFrame:
    """Stateful per-hash dedup that emits every row, flagged.

    Output: (doc_id, content_hash, is_duplicate, canonical_doc_id).
    State per content_hash: the first-seen doc_id (the dictionary entry,
    /root/reference/src/dictionary.c:61-78). State is bounded by the
    PROCESSING-time timeout below — this mode has no event-time
    semantics (use `stream_exact_dedup` for watermarked dedup; a
    previous `ts_col` parameter here was accepted but never applied,
    which read as a promise of event-time bounding it did not keep).

    `state_timeout_ms=None` disables the processing-time state timeout.
    Use None for bounded runs under trigger(availableNow): with
    ProcessingTimeTimeout the query never self-terminates (Spark keeps
    scheduling timeout-handling batches), so an availableNow parity run
    blocks until the caller's awaitTermination deadline. Continuous
    production streams keep the timeout — that is what bounds state.
    """
    import pandas as pd

    # ONLY (id, hash) enter the stateful shuffle: the output schema
    # needs nothing else, and keeping all upstream columns would ship
    # full documents (text/binary payloads) through Arrow and buffer an
    # entire hash group's rows in one pandas frame — a viral boilerplate
    # content with millions of copies in a microbatch would OOM the
    # executor for data the function never reads
    hashed = stream.withColumn(
        "content_hash", F.sha2(F.col(text_col), 256)
    ).select(id_col, "content_hash")
    # NULL-text docs never enter the stateful path: a NULL group key
    # would cluster every missing-text doc into one bogus duplicate
    # group (the batch tier keeps them singletons — same fix the
    # pipeline's exact tier and the increment prober carry); they are
    # emitted directly as their own canonicals
    null_rows = hashed.filter(F.col("content_hash").isNull()).select(
        F.col(id_col),
        F.col("content_hash"),
        F.lit(False).alias("is_duplicate"),
        F.col(id_col).alias("canonical_doc_id"),
    )
    hashed = hashed.filter(F.col("content_hash").isNotNull())

    def dedup_group(key, frames, state: GroupState):
        (content_hash,) = key
        if state_timeout_ms is not None and state.hasTimedOut:
            state.remove()
            return
        canonical = state.get[0] if state.exists else None
        # Concat ALL chunks before electing: Spark hands one group as
        # multiple pandas chunks, so a per-chunk election could pick a
        # later chunk's id over an earlier-but-larger one — the min must
        # be over the whole group this microbatch to match the
        # min(doc_id) batch oracle. Buffer size is one hash group's rows
        # (duplicate multiplicity of a single content), not the batch.
        rows = pd.concat(list(frames), ignore_index=True).sort_values(id_col)
        out = []
        for doc_id in rows[id_col]:
            doc_id = int(doc_id)
            if canonical is None:
                canonical = doc_id
                out.append((doc_id, content_hash, False, doc_id))
            else:
                out.append((doc_id, content_hash, True, canonical))
        state.update((canonical,))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(
            out,
            columns=[id_col, "content_hash", "is_duplicate", "canonical_doc_id"],
        )

    flagged = hashed.groupBy("content_hash").applyInPandasWithState(
        dedup_group,
        outputStructType=(
            f"{id_col} long, content_hash string, "
            "is_duplicate boolean, canonical_doc_id long"
        ),
        stateStructType="canonical long",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if state_timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
    return flagged.unionByName(null_rows)
