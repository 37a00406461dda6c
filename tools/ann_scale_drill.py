"""ANN scale drill: do the approximate paths actually BEAT brute force
at a corpus size where candidate volume matters, and what recall do
they pay for it?

BENCH/ann_recall.json answers the recall question at 500 vectors —
too small to answer the throughput one (session fixed overhead
dominates, and brute on 250k pairs is trivial). This drill plants the
same 0.91-cos near-duplicate structure at N=100k vectors (50k base +
50k planted near-dups, dim 64) and runs the three top-k paths over the
same query set:

- brute  — cosine_topk: crossJoin + interpreted fold. The exact
  baseline; O(N) scored pairs per query.
- lsh    — lsh_topk (default 16 tables x 8 bits): candidates share a
  sign-LSH bucket in some table; multi-table membership needs a
  distinct exchange.
- ivf    — ivf_topk (default n_list=32, nprobe=4): candidates share
  one of the query's nprobe probed lists; ~nprobe/n_list of the
  corpus scored per query, no distinct.

Reports, per path: wall (best of --repeats fresh actions over the SAME
cached input), scored-pair volume (the quantity the index exists to
shrink), and planted-dup top-1 recall over the query set. Writes
BENCH/ann_scale_drill.json.

Usage: python tools/ann_scale_drill.py [N] [n_queries] [--repeats R]
       (defaults: N=100000, n_queries=200, repeats 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deduplication_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from deduplication_spark.session import get_spark  # noqa: E402

DIM = 64
TARGET_COS = 0.91


def planted(n_base: int, seed: int = 11) -> pd.DataFrame:
    """n_base unit base vectors + one 0.91-cos planted near-dup each
    (ids: base i, near n_base+i) — the ann_recall construction at
    drill scale."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    g = rng.standard_normal((n_base, DIM))
    perp = g - (np.einsum("ij,ij->i", g, base))[:, None] * base
    perp /= np.linalg.norm(perp, axis=1, keepdims=True)
    near = TARGET_COS * base + np.sqrt(1 - TARGET_COS**2) * perp
    ids = np.concatenate([np.arange(n_base), n_base + np.arange(n_base)])
    vecs = np.concatenate([base, near]).astype(np.float64)
    return pd.DataFrame(
        {"vec_id": ids.astype(np.int64), "embedding": list(vecs)}
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_total = int(args[0]) if args else 100_000
    n_queries = int(args[1]) if len(args) > 1 else 200
    repeats = 2
    for i, a in enumerate(sys.argv):
        if a == "--repeats":
            repeats = int(sys.argv[i + 1])
    n_base = n_total // 2

    spark = get_spark(app_name="ann_scale_drill")
    spark.sparkContext.setLogLevel("ERROR")
    pdf = planted(n_base)
    emb = (
        spark.createDataFrame(pdf)
        .repartition(32, "vec_id")
        .persist()
    )
    emb.count()  # materialize once; all paths read the same cache
    queries = emb.filter(f"vec_id < {n_queries}")

    # scored-pair volume per path (the quantity the index shrinks);
    # derived from the same frames the timed runs use
    k = 5

    def run(name, build):
        walls = []
        rows = None
        for _ in range(repeats):
            t0 = time.monotonic()
            rows = build().collect()
            walls.append(round(time.monotonic() - t0, 3))
        hits = sum(
            1
            for r in rows
            if r["rank"] == 1 and r["neighbor_id"] == r["query_id"] + n_base
        )
        return {
            "walls_sec": walls,
            "best_sec": min(walls),
            "rows": len(rows),
            "dup_top1_recall": round(hits / n_queries, 4),
        }

    out = {
        "n_vectors": 2 * n_base,
        "n_queries": n_queries,
        "dim": DIM,
        "planted_cos": TARGET_COS,
        "k": k,
        "repeats": repeats,
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    out["brute"] = run("brute", lambda: cosine_topk(emb, queries, k=k))
    out["brute"]["scored_pairs"] = n_queries * (2 * n_base - 1)
    out["lsh"] = run("lsh", lambda: lsh_topk(emb, queries, dim=DIM, k=k))
    out["ivf"] = run("ivf", lambda: ivf_topk(emb, queries, k=k))
    # candidate volumes measured, not assumed (ids-only counts)
    from deduplication_spark.operators.similarity import (
        _ivf_assign,
        _ivf_centroids,
    )
    from pyspark.sql import functions as F

    c = _ivf_centroids(emb, 32, 0x5EED, "vec_id", "embedding")
    el = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.element_at(
            _ivf_assign(F.col("embedding").cast("array<double>"), c, 1), 1
        ).alias("list_id"),
    )
    ql = queries.select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            _ivf_assign(F.col("embedding").cast("array<double>"), c, 4)
        ).alias("list_id"),
    )
    out["ivf"]["scored_pairs"] = (
        ql.join(el, "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .count()
    )
    from deduplication_spark.operators.similarity import hyperplane_buckets

    eb = hyperplane_buckets(emb, DIM).select(
        F.col("vec_id").alias("neighbor_id"), "table_idx", "bucket"
    )
    qb = hyperplane_buckets(queries, DIM).select(
        F.col("vec_id").alias("query_id"), "table_idx", "bucket"
    )
    out["lsh"]["scored_pairs"] = (
        qb.join(eb, ["table_idx", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
        .count()
    )
    emb.unpersist()

    for p in ("brute", "lsh", "ivf"):
        if "scored_pairs" in out[p]:
            out[p]["pairs_vs_brute"] = round(
                out[p]["scored_pairs"] / out["brute"]["scored_pairs"], 4
            )
        out[p]["speedup_vs_brute"] = round(
            out["brute"]["best_sec"] / out[p]["best_sec"], 2
        )

    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "ann_scale_drill.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
