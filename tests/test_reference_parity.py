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

SAMPLES_DIR = "/root/reference/samples"
SAMPLE = os.path.join(SAMPLES_DIR, "T_raw.bin")

# the reference's dataset->width mapping (scripts/encode_bench.sh:20-25)
# plus the two seven-day captures it ships alongside
ALL_SAMPLES = [
    ("T_raw.bin", 2),
    ("RH_raw.bin", 2),
    ("lux_raw.bin", 2),
    ("P_raw.bin", 4),
    ("seven_day_T.bin", 2),
    ("seven_day_RH.bin", 2),
]


def load_stream(name: str = "T_raw.bin") -> bytes:
    p = os.path.join(SAMPLES_DIR, name)
    if os.path.exists(p):
        with open(p, "rb") as f:
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


@pytest.mark.parametrize(
    ("sample", "width"),
    ALL_SAMPLES + [("T_raw.bin", 1), ("T_raw.bin", 4)],
)
def test_parity_all_samples_and_widths(spark, sample, width):
    """Every shipped capture at its encode_bench width (plus widths 1/4
    on T_raw, compressor.c:46-50 validates {1,2,4,8}): the Spark exact
    tier must reproduce the reference dictionary size and the exact
    block->cluster partition."""
    data = load_stream(sample)
    block_samples = 8
    dict_size, block_ids = reference_dedup(data, width, block_samples)
    assert dict_size > 0

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
    assert len({r["canon_pos"] for r in out}) == dict_size
    by_pos = {r["pos"]: r["canon_pos"] for r in out}
    # identical partitions (reference IDs are first-occurrence-dense,
    # ours min-position — same equivalence classes)
    ref_clusters: dict[int, list[int]] = {}
    for pos, rid in enumerate(block_ids):
        ref_clusters.setdefault(rid, []).append(pos)
    ours: dict[int, list[int]] = {}
    for pos in range(num_blocks):
        ours.setdefault(by_pos[pos], []).append(pos)
    assert sorted(ref_clusters.values()) == sorted(ours.values())


@pytest.mark.parametrize("block_samples", [2, 8])
def test_byte_identical_reconstruction(spark, block_samples):
    """decompress(compress(x)) == x[:num_blocks*bsz] — the reference's
    decode gather (compressor.c:320-341) re-expressed as our gather
    join: every position joined to its canonical block's payload, then
    concatenated in order. Byte-for-byte identical to the input prefix
    (the dropped trailing partial block is the reference's own
    semantics, compressor.c:88-93)."""
    width = 2
    data = load_stream()
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
    assign = df.withColumn("canon_pos", F.min("pos").over(w)).select(
        "pos", "canon_pos"
    )
    # dictionary = canonical blocks only; gather join reconstructs
    dictionary = df.select(
        F.col("pos").alias("canon_pos"), F.col("block").alias("payload")
    ).join(
        assign.select("canon_pos").distinct(), "canon_pos"
    )
    rows = (
        assign.join(dictionary, "canon_pos")
        .select("pos", "payload")
        .orderBy("pos")
        .collect()
    )
    reconstructed = b"".join(r["payload"] for r in rows)
    assert reconstructed == data[: num_blocks * bsz]
