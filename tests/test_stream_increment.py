"""Streaming near-dup increment (streaming/increment_stream.py):
foreachBatch routing of microbatches through the batch prober must be
faithful to the equivalent chain of batch dedup_increment calls, and
the driver-held index must advance batch-over-batch."""

import os

import pytest
from pyspark.sql import functions as F

from deduplication_spark.config import DedupConfig
from deduplication_spark.corpus import generate_corpus, write_corpus
from deduplication_spark.increment import dedup_increment
from deduplication_spark.streaming.increment_stream import (
    StreamIncrementState,
    empty_index,
    stream_dedup_increment,
)

N_DOCS = 600
BATCHES = [(0, 200), (200, 400), (400, 600)]


@pytest.fixture(scope="module")
def docs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_inc_corpus")
    write_corpus(generate_corpus(N_DOCS), str(d))
    return spark.read.parquet(str(d / "documents.parquet"))


@pytest.fixture(scope="module")
def src_dir(docs, tmp_path_factory):
    """One parquet part file per batch, written in id order so the file
    stream (maxFilesPerTrigger=1) replays the batches monotonically."""
    d = str(tmp_path_factory.mktemp("stream_inc_src"))
    for i, (lo, hi) in enumerate(BATCHES):
        part = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1)
        part.write.parquet(os.path.join(d, f"tmp_b{i}"))
        # move the single part file into the source dir under an
        # id-ordered name; the dir itself is the streaming source
        import glob
        import shutil

        [f] = glob.glob(os.path.join(d, f"tmp_b{i}", "part-*.parquet"))
        shutil.move(f, os.path.join(d, f"batch_{i}.parquet"))
        shutil.rmtree(os.path.join(d, f"tmp_b{i}"))
    return d


@pytest.fixture(scope="module")
def streamed(spark, docs, src_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("stream_inc_out")
    state = StreamIncrementState(index=empty_index(spark))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_dedup_increment(
        stream,
        state,
        assignments_dir=str(out / "assignments"),
        merges_dir=str(out / "merges"),
        cfg=DedupConfig(),
        checkpoint_dir=str(out / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)
    return state, spark.read.parquet(str(out / "assignments"))


def test_three_microbatches_ran(streamed):
    state, _ = streamed
    assert sorted(state.batch_metrics) == [0, 1, 2]
    assert [state.batch_metrics[i]["n_new_docs"] for i in range(3)] == [
        hi - lo for lo, hi in BATCHES
    ]


def test_every_doc_assigned_once(streamed):
    _, assignments = streamed
    assert assignments.count() == N_DOCS
    assert assignments.select("doc_id").distinct().count() == N_DOCS


def test_index_advances_to_full_membership(streamed):
    state, _ = streamed
    assert state.index.count() == N_DOCS


def test_matches_equivalent_batch_chain(spark, docs, streamed):
    """The streaming run must equal the same three dedup_increment
    calls chained by hand (same machinery, same batch boundaries,
    deterministic kernels)."""
    _, stream_assign = streamed
    cfg = DedupConfig()
    index = empty_index(spark)
    rows = {}
    for lo, hi in BATCHES:
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        inc = dedup_increment(spark, batch, index, cfg)
        for r in inc.assignments.collect():
            rows[r["doc_id"]] = (r["cluster_id"], r["is_canonical"])
        index = inc.index.localCheckpoint(eager=True)
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in stream_assign.collect()
    }
    assert got == rows


def test_cross_batch_exact_dup_probes_first_batch(spark, docs, streamed):
    """An exact duplicate pair split across batches must land in one
    cluster with the earlier doc as canonical."""
    _, assignments = streamed
    h = docs.withColumn("h", F.sha2("text", 256))
    pair = (
        h.alias("a")
        .join(h.alias("b"), F.col("a.h") == F.col("b.h"))
        .filter(
            (F.col("a.doc_id") < BATCHES[0][1])
            & (F.col("b.doc_id") >= BATCHES[1][0])
        )
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .first()
    )
    assert pair is not None, "corpus should contain a cross-batch exact dup"
    amap = {
        r["doc_id"]: r["cluster_id"] for r in assignments.collect()
    }
    assert amap[pair["x"]] == amap[pair["y"]]
