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
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
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
    except Exception:
        pass  # already added to this context
