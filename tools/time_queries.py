"""Quick per-query timing harness for optimization iteration (guide
§1.4 noop-sink isolation). NOT the official bench — bench.py stays the
measurement of record. Usage:

    python tools/time_queries.py [sf_dir] [query ...]

Times each named headline query (default: all) best-of-3 with a noop
sink on the bench session config and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    names = sys.argv[2:] or HEADLINE
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    spark = get_spark(
        app_name="time_queries", cores=cpus, shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out: dict[str, dict] = {}
    for name in names:
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"time:{name}")
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"best": min(runs), "runs": runs}
    print(json.dumps({"sf_dir": sf_dir, "timings": out}))


if __name__ == "__main__":
    main()
