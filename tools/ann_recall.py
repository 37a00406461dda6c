"""ANN recall curve: (n_tables x n_bits x threshold) -> measured recall
of `cosine_near_dup(method="lsh")` vs the brute-force exact baseline
(round-3 verdict item 7).

Hyperplane-LSH recall was previously pytest-spot-checked at single
configs; this sweep gives users the data to PICK parameters: planted
near-neighbor corpora at three similarity regimes (pairs planted at
EXACTLY the target cosine, just above each threshold — the hardest
angle for LSH), a grid over (n_tables, n_bits), recall =
|lsh-found true pairs| / |brute-found true pairs|. Every value the LSH
path emits is also checked to match brute's rounded cosine for the same
pair up to one rounding step (the scorers differ in the last pre-round
ulp by design) — the LSH path may only MISS pairs, never invent or
mis-score them beyond that boundary.

Measured (committed BENCH/ann_recall.json): the cosine_near_dup default
(16 tables x 8 bits) reaches recall 1.0 at thresholds 0.95/0.90 and
0.98 at 0.85; recall rises with tables, falls with bits (finer buckets
= fewer collisions), exactly the theory curve 1-(1-p^bits)^tables with
p = 1 - acos(cos)/pi.

Corpus: 64-dim unit vectors, 250 base + 250 perturbed (500 rows,
~125k candidate pairs for brute — driver scale). The same generator
shape as tests/test_similarity.py:_planted, at a larger n and dim.

Writes BENCH/ann_recall.json. tests/test_similarity.py floors the
default cosine_near_dup config (16 tables x 8 bits) at >= 0.95 recall
for threshold 0.9.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deduplication_spark.operators.similarity import (  # noqa: E402
    cosine_near_dup,
    cosine_topk,
    ivf_topk,
)
from deduplication_spark.session import get_spark  # noqa: E402

DIM = 64
N_BASE = 250


def planted_frame(target_cos: float, seed: int = 7) -> pd.DataFrame:
    """Each base vector gets one planted neighbor at EXACTLY target_cos:
    near = c*base + sqrt(1-c^2)*unit_perpendicular. (Additive noise does
    not work at dim 64 — per-dimension noise shifts cosine by
    ~1/sqrt(1+noise^2*DIM), so untuned noise lands far below the
    threshold and the ground-truth pair set comes out empty.)"""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    g = rng.standard_normal((N_BASE, DIM))
    perp = g - (np.einsum("ij,ij->i", g, base))[:, None] * base
    perp /= np.linalg.norm(perp, axis=1, keepdims=True)
    near = target_cos * base + np.sqrt(1 - target_cos**2) * perp
    rows = []
    for i in range(N_BASE):
        rows.append({"vec_id": i, "embedding": base[i].tolist()})
        rows.append({"vec_id": 1000 + i, "embedding": near[i].tolist()})
    return pd.DataFrame(rows)


def ivf_section(spark) -> dict:
    """IVF-Flat recall over (n_list, nprobe), two regimes on one
    planted-pair corpus (0.91-cos pairs, 500 vectors, queries = the 250
    base vectors, k=5):

    - `dup_recall` — fraction of queries whose PLANTED near-duplicate
      surfaces in the IVF top-k. The dedup-shaped question; stays high
      at small nprobe because a cos~0.9 neighbor lands in (or next to)
      the query's own top list.
    - `topk_recall` — |ivf top-k ∩ brute top-k| / |brute top-k| over
      ALL neighbors, most of which are near-orthogonal background — the
      worst case for IVF (no cluster structure), scaling ~linearly with
      nprobe/n_list. Committed so users see BOTH numbers, not just the
      flattering one.

    Also asserts, like the LSH sweep, that IVF never invents or
    mis-scores: EVERY emitted (pair, score) — not just those that also
    appear in brute's top-k — is re-derived by an independent
    driver-side numpy cosine over the same planted frame and must agree
    to 1e-9 (IVF scores candidates with the exact float64 kernel — only
    the candidate SET is approximate)."""
    pdf = planted_frame(0.91)
    vecs = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(pdf["vec_id"], pdf["embedding"])
    }
    unit = {i: v / np.linalg.norm(v) for i, v in vecs.items()}
    emb = spark.createDataFrame(pdf).cache()
    queries = emb.filter("vec_id < 1000")
    brute_rows = cosine_topk(emb, queries, k=5).collect()
    brute = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in brute_rows}
    results = []
    for n_list, nprobe in (
        (16, 1), (16, 4), (32, 1), (32, 4), (32, 8), (64, 4), (64, 8)
    ):
        ivf_rows = ivf_topk(
            emb, queries, k=5, n_list=n_list, nprobe=nprobe
        ).collect()
        ivf = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in ivf_rows}
        wrong = [
            p
            for p, cos in ivf.items()
            if abs(cos - float(unit[p[0]] @ unit[p[1]])) > 1e-9
        ]
        assert not wrong, f"IVF mis-scored: {wrong[:5]}"
        dup_found = sum(1 for q in range(N_BASE) if (q, 1000 + q) in ivf)
        found = sum(1 for p in ivf if p in brute)
        results.append(
            {
                "n_list": n_list,
                "nprobe": nprobe,
                "dup_recall": round(dup_found / N_BASE, 4),
                "topk_recall": round(found / len(brute), 4) if brute else None,
            }
        )
    emb.unpersist()
    return {"planted_cos": 0.91, "k": 5, "grid": results}


def main() -> None:
    spark = get_spark(app_name="ann_recall")
    spark.sparkContext.setLogLevel("ERROR")

    # planted cosine sits just above each threshold — the hard regime
    # for LSH (collision probability is lowest at the threshold angle)
    regimes = [(0.96, 0.95), (0.91, 0.90), (0.86, 0.85)]
    grid_tables = (4, 8, 16, 32)
    grid_bits = (4, 8, 12)

    results = []
    for planted_cos, threshold in regimes:
        emb = spark.createDataFrame(planted_frame(planted_cos)).cache()
        brute = {
            (r["a_id"], r["b_id"]): r["cos_sim"]
            for r in cosine_near_dup(emb, threshold, method="brute").collect()
        }
        for n_tables in grid_tables:
            for n_bits in grid_bits:
                lsh = {
                    (r["a_id"], r["b_id"]): r["cos_sim"]
                    for r in cosine_near_dup(
                        emb,
                        threshold,
                        method="lsh",
                        n_tables=n_tables,
                        n_bits=n_bits,
                    ).collect()
                }
                # the two scorers (Catalyst fold vs numpy einsum) may
                # differ in the last ulp BEFORE rounding, so a value
                # straddling a .00005 boundary can legitimately round
                # one step apart — allow exactly that, nothing more
                extra = {
                    p
                    for p in lsh
                    if p not in brute and lsh[p] - threshold > 2e-4
                }
                assert not extra, f"LSH invented pairs: {sorted(extra)[:5]}"
                wrong = [
                    p
                    for p in lsh
                    if p in brute and abs(lsh[p] - brute[p]) > 2e-4
                ]
                assert not wrong, f"LSH mis-scored: {wrong[:5]}"
                # recall counts TRUE pairs found — lsh may legitimately
                # hold boundary pairs absent from brute (the tolerance
                # above), which must not inflate recall past 1.0
                found = sum(1 for p in lsh if p in brute)
                results.append(
                    {
                        "threshold": threshold,
                        "planted_cos": planted_cos,
                        "n_tables": n_tables,
                        "n_bits": n_bits,
                        "true_pairs": len(brute),
                        "found": found,
                        "recall": round(found / len(brute), 4)
                        if brute
                        else None,
                    }
                )
        emb.unpersist()

    out = {"dim": DIM, "n_vectors": 2 * N_BASE, "grid": results}
    out["ivf"] = ivf_section(spark)
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "ann_recall.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
