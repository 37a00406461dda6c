"""Physical-plan audit: capture .explain("formatted") for the headline
queries and grep the properties that matter at 100 TB — scan pushdown /
column pruning (ReadSchema), whole-stage codegen spans, broadcast vs
shuffle joins, AQE. Output -> PLANS.md so plan regressions are diffable.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Each check is a REGEX (re.search over the formatted plan); a "!"
# prefix means must-NOT-match. Column-specific patterns, because every
# FileScan prints a "PushedFilters: [...]" and a "ReadSchema:" line even
# with nothing pushed/pruned — a bare substring check can never fail.
# Unmet checks fail the run (exit 1), not just a markdown cell.
CHECKS = {
    # documents scans must prune the html payload column. (No "codegen
    # id" checks anywhere: per the Reading note below, AQE-wrapped plans
    # omit those annotations pre-execution, so the check is a coin flip
    # on whether AQE wraps the query this Spark version.)
    "exact_dedup": [r"!ReadSchema:[^\n]*html"],
    # gather_join must NOT force a broadcast (the canonical side ~= the
    # corpus at web scale); a stats/AQE-chosen broadcast at tiny sf is
    # fine — what we assert is that the plan still contains a join.
    "gather_join": ["Join"],
    "short_doc_routing": [r"!ReadSchema:[^\n]*html"],
    "lang_distribution": ["HashAggregate"],
    # Q1 reads its 7 columns, not the join keys
    "tpch_pricing_summary": [r"!ReadSchema:[^\n]*l_partkey", "HashAggregate"],
    "region_revenue": ["BroadcastHashJoin"],
    # Q14: the date window must reach the lineitem scan
    "tpch_promo_revenue": [r"PushedFilters: \[[^\]]*l_shipdate", "Join"],
    # Q9: the p_name filter must reach the part scan
    "tpch_product_profit": [r"PushedFilters: \[[^\]]*p_name", "Join"],
    "quality_filter": [r"!ReadSchema:[^\n]*html"],
    # Q10: the l_returnflag filter must reach the lineitem scan; nation
    # (tiny) broadcasts but customer must stay a plannable join (AQE)
    "tpch_returned_revenue": [r"PushedFilters: \[[^\]]*l_returnflag", "Join"],
    # Q18: aggregate-then-join — a HashAggregate must appear below the
    # order/customer joins
    "tpch_big_orders": ["HashAggregate", "Join"],
    "top_docs_per_lang": ["Window", r"!ReadSchema:[^\n]*html"],
    # scale path must candidate via the bucket equi-join, never a
    # cartesian product
    "embedding_near_dup_lsh": ["Join", "!Cartesian"],
    # IVF scale path: candidates via the list_id equi-join, never a
    # cartesian product; top-k via the rank window
    "embedding_ann_ivf_core": ["Join", "!Cartesian", "Window"],
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from deduplication_spark.session import get_spark

    spark = get_spark(app_name="explain_audit", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    sections = []
    summary = []
    unmet: list[str] = []
    for name in (
        "exact_dedup",
        "gather_join",
        "short_doc_routing",
        "ngram_jaccard_pairs",
        "embedding_topk",
        "lang_distribution",
        "tpch_pricing_summary",
        "tpch_shipping_priority",
        "region_revenue",
        "tpch_promo_revenue",
        "tpch_product_profit",
        "quality_filter",
        "events_sessionize",
        "tpch_returned_revenue",
        "tpch_big_orders",
        "top_docs_per_lang",
        "embedding_near_dup_lsh",
        "embedding_ann_ivf_core",
        "near_dup_assignments",
    ):
        if name == "embedding_near_dup_lsh":
            # the scale path (bucket equi-join) — the driver query uses
            # brute force because that is the exact-oracle baseline
            from deduplication_spark.operators.similarity import cosine_near_dup

            emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            df = cosine_near_dup(emb, 0.9, method="lsh", dim=64)
            label = "embedding_near_dup (lsh scale path)"
        elif name == "embedding_ann_ivf_core":
            # the raw IVF top-k plan (the driver query wraps it in the
            # shape-invariant projection; audit the core operator)
            from deduplication_spark.operators.similarity import ivf_topk
            from pyspark.sql import functions as F

            emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            df = ivf_topk(
                emb, emb.filter(F.col("vec_id") < 10), k=5, n_list=32, nprobe=4
            )
            label = "embedding_ann_ivf (ivf-flat scale path)"
        elif name == "near_dup_assignments":
            # plan of the edge union (pre-CC), not the materialized result
            from deduplication_spark.config import DedupConfig
            from deduplication_spark.operators.minhash_lsh import band_key_buckets
            from deduplication_spark.operators.candidates import bucket_pairs
            from deduplication_spark.functions.hashing import make_enrich_udf
            from pyspark.sql import functions as F

            cfg = DedupConfig()
            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            enr = make_enrich_udf(cfg.num_perm, cfg.hash_seed, cfg.shingle_k)
            e = docs.select("doc_id", "text").withColumn(
                "_e", enr(F.col("text"))
            ).select("doc_id", F.col("_e.minhash").alias("minhash"))
            df = bucket_pairs(
                band_key_buckets(e, cfg), ["band_key"], cap=cfg.bucket_pair_cap
            ).pairs
            label = "lsh_candidate_pairs (pipeline core)"
        else:
            df = qs[name](spark, sf_dir)
            label = name
        p = plan_of(df)
        sections.append(f"## {label}\n\n```\n{p}\n```\n")
        wanted = CHECKS.get(name, [])
        marks = {
            w: (
                not re.search(w[1:], p)
                if w.startswith("!")
                else bool(re.search(w, p))
            )
            for w in wanted
        }
        unmet.extend(f"{label}: {w}" for w, ok in marks.items() if not ok)
        pruned = "ReadSchema" in p
        summary.append(
            f"| {label} | {'yes' if ('WholeStageCodegen' in p or 'codegen id' in p) else 'no'} "
            f"| {'yes' if 'BroadcastHashJoin' in p else '-'} "
            f"| {'yes' if pruned else '-'} | {marks} |"
        )

    out = (
        "# PLANS — physical-plan audit (explain formatted)\n\n"
        "Generated by tools/explain_audit.py. Columns: whole-stage codegen\n"
        "present / broadcast join used / scan schema pruned.\n\n"
        "Reading note: `codegen: no` on AQE-wrapped plans is a display\n"
        "artifact, not a codegen miss — pre-execution `explain(formatted)`\n"
        "of an AdaptiveSparkPlan omits the `[codegen id : N]` annotations\n"
        "that appear once stages are finalized (compare short_doc_routing\n"
        "and quality_filter, whose non-AQE plans show them on the SAME\n"
        "scan/project operators the AQE queries use). WindowExec and\n"
        "python-UDF stages are genuinely non-codegen by Spark design.\n\n"
        "| query | codegen | broadcast | pruned | checks |\n|---|---|---|---|---|\n"
        + "\n".join(summary)
        + "\n\n"
        + "\n".join(sections)
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(out)
    print("wrote PLANS.md")
    for line in summary:
        print(line)
    if unmet:
        print("UNMET PLAN CHECKS:")
        for u in unmet:
            print(f"  {u}")
        sys.exit(1)


if __name__ == "__main__":
    main()
