"""Batch-incremental dedup (increment.py):

- every cross-batch exact duplicate probes into its base cluster
- combined recall >= 0.99 over pairs the increment tiers can catch
- a bridge doc merges two base clusters, reported in `merges`
- the updated index drives a second increment (self-sustaining loop)
- the monotone-id contract is enforced
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deduplication_spark.config import DedupConfig
from deduplication_spark.corpus import generate_corpus, write_corpus
from deduplication_spark.increment import (
    build_index,
    dedup_increment,
    index_from_enriched,
)
from deduplication_spark.pipeline import dedup

N_DOCS = 800
CUT = 400  # doc_id < CUT -> base corpus, >= CUT -> increment batch


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_DOCS)


@pytest.fixture(scope="module")
def docs(spark, corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("inc_corpus")
    write_corpus(corpus, str(d))
    return spark.read.parquet(str(d / "documents.parquet"))


@pytest.fixture(scope="module")
def split(docs):
    return (
        docs.filter(F.col("doc_id") < CUT),
        docs.filter(F.col("doc_id") >= CUT),
    )


@pytest.fixture(scope="module")
def inc_run(spark, split):
    base_df, new_df = split
    cfg = DedupConfig()
    base_res = dedup(spark, base_df, cfg)
    index = build_index(base_df, base_res.assignments, cfg)
    inc = dedup_increment(spark, new_df, index, cfg, base_docs=base_df)
    return base_res, inc


def _combined_map(base_res, inc) -> dict[int, int]:
    merge = {
        r["old_cluster_id"]: r["merged_into"] for r in inc.merges.collect()
    }
    cmap = {
        r["doc_id"]: merge.get(r["cluster_id"], r["cluster_id"])
        for r in base_res.assignments.collect()
    }
    cmap.update(
        {r["doc_id"]: r["cluster_id"] for r in inc.assignments.collect()}
    )
    return cmap


def test_index_from_enriched_matches_build_index(split, inc_run):
    """The zero-recompute index (base run's enriched snapshot) must be
    row-identical to the recomputed one — same fused kernel, same
    config, so signatures are bit-equal."""
    base_df, _ = split
    base_res, _ = inc_run
    cfg = DedupConfig()
    a = build_index(base_df, base_res.assignments, cfg)
    b = index_from_enriched(base_res.enriched, base_res.assignments)
    cols = ["member_id", "cluster_id", "content_hash", "minhash"]
    assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
        map(tuple, b.select(*cols).collect())
    )


def test_every_new_doc_assigned(split, inc_run):
    _, new_df = split
    _, inc = inc_run
    rows = inc.assignments.collect()
    assert len(rows) == new_df.count()
    assert all(r["cluster_id"] is not None for r in rows)
    for r in rows:
        assert r["is_canonical"] == (r["doc_id"] == r["cluster_id"])


def test_cross_batch_exact_dups_probe_existing_cluster(corpus, inc_run):
    base_res, inc = inc_run
    cmap = _combined_map(base_res, inc)
    tp = corpus.truth_pairs
    exact = tp[tp["class"] == "exact"]
    assert len(exact) > 50
    assert all(
        cmap[a] == cmap[b]
        for a, b in exact[["doc_id_a", "doc_id_b"]].itertuples(index=False)
    )


def test_combined_recall(corpus, inc_run):
    """>= 0.99 over pairs the combined base+increment run can catch:
    base-internal pairs get all four tiers; pairs touching the new
    batch get exact + MinHash-LSH (the increment tiers — substring
    spans crossing the batch boundary are full-rerun-only by design)."""
    base_res, inc = inc_run
    cmap = _combined_map(base_res, inc)
    cfg = DedupConfig()
    tp = corpus.truth_pairs
    both_base = (tp["doc_id_a"] < CUT) & (tp["doc_id_b"] < CUT)
    near_ok = (tp["class"] != "near") | (
        tp["true_jaccard"] >= cfg.jaccard_verify_threshold
    )
    catchable = tp[near_ok & (both_base | (tp["class"] != "substring"))]
    assert len(catchable) > 100
    hits = sum(
        cmap[a] == cmap[b]
        for a, b in catchable[["doc_id_a", "doc_id_b"]].itertuples(index=False)
    )
    recall = hits / len(catchable)
    assert recall >= 0.99, f"recall {recall:.4f} ({hits}/{len(catchable)})"


def test_bridge_doc_merges_base_clusters(spark):
    """base: b1 = X+A, b2 = X+B with j(b1,b2) ~ 0.71 (separate
    clusters); increment: n = X with j(n, b1) = j(n, b2) ~ 0.83 —
    n bridges both, the merge is reported, cluster min-id wins."""
    X = " ".join(f"w{i}" for i in range(200))
    A = " ".join(f"a{i}" for i in range(40))
    B = " ".join(f"b{i}" for i in range(40))
    cfg = DedupConfig()
    base_df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "text": [X + " " + A, X + " " + B]}
        )
    )
    # exact+minhash only: the full run's substring tier would already
    # link b1,b2 through the shared 200-token span — the merge scenario
    # needs them in distinct base clusters
    base_res = dedup(spark, base_df, cfg, tiers=("exact", "minhash"))
    assert base_res.assignments.select("cluster_id").distinct().count() == 2

    index = build_index(base_df, base_res.assignments, cfg)
    new_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10], "text": [X]})
    )
    inc = dedup_increment(spark, new_df, index, cfg, base_docs=base_df)

    merges = inc.merges.collect()
    assert [(m["old_cluster_id"], m["merged_into"]) for m in merges] == [(2, 1)]
    [assign] = inc.assignments.collect()
    assert assign["cluster_id"] == 1 and not assign["is_canonical"]
    idx = inc.index.collect()
    assert {r["cluster_id"] for r in idx} == {1}
    assert {r["member_id"] for r in idx} == {1, 2, 10}  # member granularity


def test_updated_index_drives_next_increment(spark, split, inc_run):
    """Second increment against the UPDATED index: an exact copy of a
    first-increment canonical probes into that doc's cluster."""
    _, new_df = split
    _, inc = inc_run
    cfg = DedupConfig()
    canon = (
        inc.assignments.filter(F.col("is_canonical")).select("doc_id").first()
    )["doc_id"]
    text = new_df.filter(F.col("doc_id") == canon).first()["text"]
    nxt = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10_000], "text": [text]})
    )
    inc2 = dedup_increment(spark, nxt, inc.index, cfg)
    [row] = inc2.assignments.collect()
    assert row["cluster_id"] == canon and not row["is_canonical"]
    assert inc2.merges.count() == 0


def test_config_mismatch_fails_fast(spark, split, inc_run):
    """An index built at one signature config must refuse a probe at
    another (silently incomparable signatures -> recall ~0 otherwise)."""
    from deduplication_spark.io import ConfigMismatch

    base_res, inc = inc_run
    pinned = index_from_enriched(
        base_res.enriched, base_res.assignments, cfg=DedupConfig()
    )
    drifted = DedupConfig(hash_seed=0xBAD5EED)
    nxt = spark.createDataFrame(
        pd.DataFrame({"doc_id": [20_000], "text": ["drifted config batch"]})
    )
    with pytest.raises(ConfigMismatch, match="signature config"):
        dedup_increment(spark, nxt, pinned, drifted)

    # width mismatch is caught even without the metadata pin
    unpinned = inc.index.select(
        "member_id", "cluster_id", "content_hash",
        F.slice("minhash", 1, 64).alias("minhash"),
    )
    with pytest.raises(ConfigMismatch, match="minhash width"):
        dedup_increment(spark, nxt, unpinned, DedupConfig())


def test_empty_batch_short_circuits(spark, split, inc_run):
    """An empty increment returns instantly with the unchanged index —
    no LSH self-screen of the base index against itself."""
    _, new_df = split
    _, inc = inc_run
    empty = new_df.filter(F.lit(False))
    res = dedup_increment(spark, empty, inc.index, DedupConfig())
    assert res.metrics["n_new_docs"] == 0
    assert res.assignments.count() == 0
    assert res.merges.count() == 0
    assert res.index is inc.index
    assert res.assignments.columns == ["doc_id", "cluster_id", "is_canonical"]
    assert res.merges.columns == ["old_cluster_id", "merged_into"]


def test_id_contract_enforced(spark, split, inc_run):
    base_df, _ = split
    _, inc = inc_run
    cfg = DedupConfig()
    overlapping = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["overlap id batch"]})
    )
    with pytest.raises(ValueError, match="must exceed"):
        dedup_increment(spark, overlapping, inc.index, cfg)
