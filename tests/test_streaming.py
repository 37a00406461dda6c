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
