"""Reference-semantics parity (SURVEY.md §5.2 layer 3).

A ~20-line pure-Python re-expression of the reference's exact dedup loop
(/root/reference/src/compressor.c:105-114 + src/dictionary.c:49-78:
frame fixed-width samples into fixed-size blocks, drop the trailing
partial block, assign first-occurrence IDs by byte equality) serves as
oracle; the Spark exact-tier groupBy must reproduce its
(dict_size, block->cluster multiset) exactly, with min-position
canonical standing in for first-occurrence (equivalent under the
original ordering).

Runs on the real sensor capture at /root/reference/samples/T_raw.bin
(read-only) when present, else on the FIXTURES.md §2 synthetic walk.
"""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SAMPLE = "/root/reference/samples/T_raw.bin"


def load_stream() -> bytes:
    if os.path.exists(SAMPLE):
        with open(SAMPLE, "rb") as f:
            return f.read()
    # FIXTURES.md §2: random walk with plateaus, default_rng(7)
    rng = np.random.default_rng(7)
    steps = rng.choice([-1, 0, 0, 0, 0, 1], size=40_000)
    vals = (1000 + np.cumsum(steps)).astype("<u2")
    return vals.tobytes()


def reference_dedup(data: bytes, width: int, block_samples: int):
    """The C algorithm, re-expressed: returns (dict_size, block_ids)."""
    bsz = width * block_samples
    num_blocks = len(data) // bsz  # trailing partial block dropped
    dict_ids: dict[bytes, int] = {}
    block_ids = []
    for b in range(num_blocks):
        blk = data[b * bsz : (b + 1) * bsz]
        if blk not in dict_ids:
            dict_ids[blk] = len(dict_ids)  # first-occurrence ID
        block_ids.append(dict_ids[blk])
    return len(dict_ids), block_ids


@pytest.mark.parametrize("block_samples", [2, 8, 32])
def test_exact_tier_reproduces_reference(spark, block_samples):
    width = 2
    data = load_stream()
    dict_size, block_ids = reference_dedup(data, width, block_samples)

    bsz = width * block_samples
    num_blocks = len(data) // bsz
    pdf = pd.DataFrame(
        {
            "pos": range(num_blocks),
            "block": [data[b * bsz : (b + 1) * bsz] for b in range(num_blocks)],
        }
    )
    df = spark.createDataFrame(pdf)
    w = Window.partitionBy("block")
    out = (
        df.withColumn("canon_pos", F.min("pos").over(w))
        .select("pos", "canon_pos")
        .collect()
    )

    # same dictionary size
    canon = {r["canon_pos"] for r in out}
    assert len(canon) == dict_size

    # same partition of blocks into clusters: reference IDs are dense in
    # first-occurrence order, ours are min-position — the induced
    # partitions must be identical
    by_pos = {r["pos"]: r["canon_pos"] for r in out}
    ref_clusters: dict[int, list[int]] = {}
    for pos, rid in enumerate(block_ids):
        ref_clusters.setdefault(rid, []).append(pos)
    ours_clusters: dict[int, list[int]] = {}
    for pos in range(num_blocks):
        ours_clusters.setdefault(by_pos[pos], []).append(pos)
    assert sorted(ref_clusters.values()) == sorted(ours_clusters.values())

    # first-occurrence equivalence: each reference dict entry's first
    # position IS our canonical position
    firsts = sorted(v[0] for v in ref_clusters.values())
    assert firsts == sorted(canon)
