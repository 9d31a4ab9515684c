"""SparkSession factory with the engine's standard configuration.

Designed for multi-executor clusters (``spark-submit --py-files``); in
this sandbox everything runs on ``local[N]``.  All knobs scale with
parallelism so the same code runs at ``local[8]`` and ``local[32]``
(the N / 4N scaling-efficiency protocol in BENCH/BASELINE.md).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip the lopez_spark package for executor shipping (the programmatic
    equivalent of ``spark-submit --py-files lopez_spark.zip``)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "lopez_spark_pyfiles.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    rel = os.path.join("lopez_spark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    return out


def get_spark(
    app_name: str = "lopez-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # one shuffle partition per core: waves are small-batch jobs, the
        # big shuffles (seen-set anti-join, pagerank) rely on AQE coalescing
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelism-first coalescing (the Spark default, restored and
        # env-overridable): the round-6 wave-bench A/B showed size-first
        # coalescing collapsing the crawl wave's ~45 MB dedup/groupBy
        # shuffles to one task and costing ~25% frontier throughput
        # (best-of-4: 96.8k vs 123.8k URLs/s, all runs cleanly
        # separated), while the tiny-query wins originally credited to
        # it are carried by the explicit size-derived partitioning of
        # cached iteration frames (graph/pagerank.py
        # plan_size_partitions) — measured, OPTIMIZATION_r06.md §13.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_COALESCE_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = builder.getOrCreate()
    # ship the package to executors so mapInPandas closures resolve
    # `lopez_spark` imports regardless of the driver's cwd
    spark.sparkContext.addPyFile(_package_zip())
    return spark
