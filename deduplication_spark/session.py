"""SparkSession factory.

Single place that pins the execution knobs that matter at 100 TB:
AQE (runtime re-plan + skew-join backstop), Arrow batching for pandas
UDFs, and shuffle partitioning scaled with parallelism. Tests and bench
both go through here so the two-parallelism scaling evidence
(local[8] vs local[32], BASELINE.md) uses identical configs.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deduplication_spark",
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 2048,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` is the local parallelism; shuffle partitions default to
    2x cores so every core has work even with one straggler, without
    drowning small inputs in task overhead. On a real cluster this
    would be executors*cores*2 (AQE coalesces the excess).
    """
    if master is None:
        master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = 2 * (cores or 16)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(arrow_max_records),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the pipeline submits tier jobs from concurrent driver threads
        # (guide §2.6); FAIR keeps one tier's long stage from starving
        # the other tiers' short stages behind it in the FIFO queue —
        # measured A/B at sf1.0 (5 runs each): FAIR best 7.46 s /
        # spread 0.9 s vs FIFO best 8.0 s / spread 3.0 s. Scale-neutral
        # (applies to scheduling order, not plan shape).
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # getOrCreate IGNORES builder configs when a session already exists
    # in this process — a second get_spark(cores=8) after a
    # get_spark(cores=32) silently returns the 32-core session, which
    # would make an in-process parallelism A/B measure the same session
    # twice. Warn loudly; the scaling protocol uses fresh subprocesses
    # per level (tools/scaling_bench.py) precisely because of this.
    live_master = spark.sparkContext.master
    if live_master != master:
        import warnings

        warnings.warn(
            f"get_spark(master={master!r}) returned an EXISTING session "
            f"with master={live_master!r} — builder configs were "
            "ignored (getOrCreate is first-call-wins per process); use "
            "a fresh process for a different parallelism level",
            stacklevel=2,
        )
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors — the programmatic equivalent of
    ``spark-submit --py-files deduplication_spark.zip`` (north_rule launch
    mode). Without it, pandas-UDF closures that reference this module
    fail to unpickle on workers that don't share the driver's sys.path.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"deduplication_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception as e:  # noqa: BLE001
        # the only EXPECTED failure is re-adding the same path to a
        # live context (idempotent no-op). Anything else (zip reaped
        # from tmp, partial write from a crashed earlier run) would
        # otherwise surface much later as an opaque unpickling error
        # inside a worker-side pandas UDF — make it visible now.
        if "same path" not in str(e) and "already" not in str(e).lower():
            import warnings

            warnings.warn(
                f"addPyFile({zpath}) failed: {e!r} — executors may not "
                "receive the package; pandas UDFs can fail to unpickle",
                stacklevel=2,
            )
