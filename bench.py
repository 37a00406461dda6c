"""Benchmark harness (BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the end-to-end tiered dedup pipeline wall time (read ->
cluster assignments materialized); `queries` carries per-query seconds;
`docs_per_sec` is the throughput number the scaling evidence
(tools/scaling_bench.py, BENCH/BASELINE.md) compares across parallelism
levels. Mirrors the reference's encode_bench protocol (elapsed seconds
per dataset/config grid, scripts/encode_bench.sh:67-83) with Spark-level
metrics instead of perf counters.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deduplication_spark.config import DedupConfig  # noqa: E402
from deduplication_spark.session import get_spark  # noqa: E402


def _max_rss_kb() -> dict[str, int]:
    """Peak memory, mirroring the reference's /usr/bin/time -v protocol
    (scripts/encode_bench.sh:67-80 records max_rss_kb per run): the
    driver Python's ru_maxrss plus the local-mode JVM's VmHWM (the JVM
    is a direct child of this process; in local mode it hosts driver
    AND executors, so its high-water mark is the number that matters)."""
    out = {"driver_python": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss}
    me = str(os.getpid())
    jvm = 0
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/status") as f:
                s = f.read()
            if f"\nPPid:\t{me}\n" not in s:
                continue
            with open(f"/proc/{d}/cmdline") as f:
                if "java" not in f.read():
                    continue
            for line in s.splitlines():
                if line.startswith("VmHWM:"):
                    jvm = max(jvm, int(line.split()[1]))
        except OSError:
            continue
    out["jvm"] = jvm
    return out


def run(sf_dir: str, cpus: int, quiet: bool = True) -> dict:
    import __spark_entry__ as entry

    spark = get_spark(
        app_name=f"bench_local{cpus}",
        cores=cpus,
        shuffle_partitions=2 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs_path = os.path.join(sf_dir, "documents.parquet")
    n_docs = spark.read.parquet(docs_path).count()

    qs = entry.queries()
    headline = [
        "exact_dedup",
        "ngram_jaccard_pairs",
        "text_features",
        "embedding_topk",
        "events_dedup",
        "minhash_signatures",
        "cdc_chunks",
    ]
    # Best-of-N per query: this host has co-tenants with a documented
    # ~2x wall-time spread (BENCH/BASELINE.md), so a single shot cannot
    # distinguish a regression from weather. Minimum over fresh actions
    # is the estimator tools/scaling_bench.py already uses; the spread
    # is reported alongside so the noise level is visible per round.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    timings: dict[str, float] = {}
    median: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in headline:
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        median[name] = round(_median(runs), 3)
        spread[name] = round(max(runs) - min(runs), 3)

    # flagship: full tiered dedup pipeline, end to end (same best-of-N)
    from deduplication_spark.pipeline import dedup

    pipe_runs = []
    for _ in range(repeats):
        t0 = time.time()
        res = dedup(
            spark, spark.read.parquet(docs_path), DedupConfig(), collect_stats=False
        )
        res.assignments.write.format("noop").mode("overwrite").save()
        pipe_runs.append(time.time() - t0)
    pipeline_sec = round(min(pipe_runs), 3)
    timings["dedup_pipeline"] = pipeline_sec
    median["dedup_pipeline"] = round(_median(pipe_runs), 3)
    spread["dedup_pipeline"] = round(max(pipe_runs) - min(pipe_runs), 3)
    n_clusters = res.clusters.count()

    out = {
        "metric": "dedup_pipeline_sec",
        "value": pipeline_sec,
        "unit": "sec",
        "queries": timings,
        # best-of-N is the headline (matches tools/scaling_bench.py's
        # estimator); the median makes round-over-round comparisons
        # sturdier under co-tenant tail noise (round-3 verdict item 6)
        "query_median_sec": median,
        "query_spread_sec": spread,
        "bench_repeats": repeats,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / pipeline_sec, 1),
        "cpus": cpus,
        "dup_ratio": round(1 - n_clusters / n_docs, 4),
        "max_rss_kb": _max_rss_kb(),
    }
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run(sf_dir, cpus)))


if __name__ == "__main__":
    main()
