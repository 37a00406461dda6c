"""Streaming incremental dedup: batch parity at availableNow."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deduplication_spark.corpus import generate_corpus, write_corpus
from deduplication_spark.streaming.incremental import (
    stream_dedup_flags,
    stream_exact_dedup,
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    write_corpus(generate_corpus(300, with_jaccard=False), str(d))
    # file-stream sources need a DIRECTORY of parquet parts
    docs_dir = str(d / "docs_dir")
    spark.read.parquet(os.path.join(str(d), "documents.parquet")).write.parquet(
        docs_dir
    )
    return docs_dir


def _run_stream(spark, df, out_dir: str) -> pd.DataFrame:
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    return spark.read.parquet(out_dir).toPandas()


def test_stream_exact_dedup_matches_batch(spark, stream_dir, tmp_path):
    schema = spark.read.parquet(
        stream_dir
    ).schema
    src = spark.readStream.schema(schema).parquet(
        stream_dir
    )
    out = _run_stream(
        spark,
        stream_exact_dedup(src).select("doc_id", "content_hash"),
        str(tmp_path / "out"),
    )
    batch = (
        spark.read.parquet(stream_dir)
        .withColumn("content_hash", F.sha2("text", 256))
    )
    n_unique = batch.select("content_hash").distinct().count()
    # one survivor per unique content
    assert len(out) == n_unique
    assert out["content_hash"].nunique() == n_unique


def test_stream_dedup_flags_every_row(spark, stream_dir, tmp_path):
    schema = spark.read.parquet(
        stream_dir
    ).schema
    src = spark.readStream.schema(schema).parquet(
        stream_dir
    )
    # state_timeout_ms=None: with ProcessingTimeTimeout the availableNow
    # query never self-terminates and this test burns awaitTermination's
    # full deadline (see streaming/incremental.py docstring)
    out = _run_stream(
        spark, stream_dedup_flags(src, state_timeout_ms=None), str(tmp_path / "out")
    )
    batch = spark.read.parquet(stream_dir)
    assert len(out) == batch.count()  # every row emitted, flagged
    n_unique = (
        batch.select(F.sha2("text", 256).alias("h")).distinct().count()
    )
    assert (~out["is_duplicate"]).sum() == n_unique
    # canonical is a member of the same hash group and non-duplicate
    canon = out[~out["is_duplicate"]]
    assert (canon["doc_id"] == canon["canonical_doc_id"]).all()


def test_stream_null_text_docs_stay_singletons(spark, tmp_path):
    """Batch parity for missing text: the batch exact tier keeps
    NULL-text docs as singletons (NULL hashes never group), but
    dropDuplicatesWithinWatermark treats NULL keys as EQUAL and a NULL
    group key clusters them — both streaming modes must bypass the
    dedup state for NULL hashes and emit every such doc."""
    import datetime

    src_dir = str(tmp_path / "src")
    ts = datetime.datetime(2025, 1, 1)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["same text", "same text", None, None, "other"],
            "warc_ts": [ts] * 5,
        }
    )
    spark.createDataFrame(pdf).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    src = spark.readStream.schema(schema).parquet(src_dir)
    out = _run_stream(
        spark,
        stream_exact_dedup(src).select("doc_id", "content_hash"),
        str(tmp_path / "out1"),
    )
    # 1 survivor for "same text", 1 for "other", BOTH NULL-text docs
    assert len(out) == 4
    assert out["content_hash"].isna().sum() == 2

    src = spark.readStream.schema(schema).parquet(src_dir)
    out = _run_stream(
        spark,
        stream_dedup_flags(src, state_timeout_ms=None),
        str(tmp_path / "out2"),
    )
    assert len(out) == 5  # every row emitted
    nulls = out[out["content_hash"].isna()].sort_values("doc_id")
    assert list(nulls["doc_id"]) == [3, 4]
    assert not nulls["is_duplicate"].any()
    assert list(nulls["canonical_doc_id"]) == [3, 4]  # own canonicals
