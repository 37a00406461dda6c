"""Reproducible flagship ground-truth check (round-3 verdict item 2).

Runs the full tiered pipeline (`near_dup_assignments`) AND the
config-rendered DuckDB ground truth (`_near_dup_truth_sql(CFG)`:
recursive-CTE transitive closure over exact ∪ uncapped k-gram-Jaccard
edges) on the same documents table, joins on doc_id, and reports the
assignment diff count. This is the one-command re-derivation of the
"0 diffs at sf0.001/0.01/0.1" claim in BENCH/BASELINE.md — previously
asserted from driver runs at 0.001/0.01 only, with the sf0.1 number not
reproducible from the repo.

Usage:
    python tools/truth_check.py [sf_dir ...]
        (default: /root/testdata/sf0.001 /root/testdata/sf0.01
                  /root/testdata/sf0.1)

Writes BENCH/truth_check.json: per-sf {n_docs, n_diffs, n_clusters_spark,
n_clusters_truth, wall_sec} plus the config fingerprint the truth SQL
was rendered from.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from deduplication_spark.session import get_spark  # noqa: E402


def check(spark, sf_dir: str) -> dict:
    t0 = time.time()
    spark_df = (
        entry.q_near_dup_assignments(spark, sf_dir)
        .select("doc_id", "cluster_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    path = os.path.join(sf_dir, "documents.parquet").replace("'", "''")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    truth = (
        con.execute(entry._NEAR_DUP_TRUTH_SQL)
        .df()[["doc_id", "cluster_id"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(spark_df) == len(truth), (len(spark_df), len(truth))
    assert (spark_df["doc_id"].values == truth["doc_id"].values).all()
    diffs = int((spark_df["cluster_id"].values != truth["cluster_id"].values).sum())
    return {
        "sf_dir": sf_dir,
        "n_docs": int(len(truth)),
        "n_diffs": diffs,
        "n_clusters_spark": int(spark_df["cluster_id"].nunique()),
        "n_clusters_truth": int(truth["cluster_id"].nunique()),
        "wall_sec": round(time.time() - t0, 1),
    }


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark(app_name="truth_check")
    spark.sparkContext.setLogLevel("ERROR")
    from deduplication_spark.increment import _sig_fingerprint

    out = {
        "sig_config": _sig_fingerprint(entry.CFG),
        "jaccard_verify_threshold": entry.CFG.jaccard_verify_threshold,
        "results": [check(spark, d) for d in dirs],
    }
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "truth_check.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
