"""Dump .explain("formatted") for the headline bench queries to
plans/r06/<query>_<tag>.txt (tag = before/after). Usage:

    python tools/dump_plans.py before [sf_dir]

Plans only — no actions are triggered, so this is cheap and safe to run
on any tree state.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from deduplication_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "text_features",
    "embedding_topk",
    "events_dedup",
    "minhash_signatures",
    "cdc_chunks",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="dump_plans", cores=cpus, shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r06",
    )
    os.makedirs(out_dir, exist_ok=True)
    qs = entry.queries()
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
