"""SparkSession factory tuned for this engine.

local[N] here; the same settings are what we'd ship via spark-submit --conf
on a real cluster (AQE on for runtime re-planning + skew handling, Arrow on
for the vectorized kernels, shuffle partitions sized to cores locally —
on a 1000-executor cluster this would be ~2-3× total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "docling-rag-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # pin the session TZ: date_trunc/day-bucket semantics and DuckDB
        # oracle parity must not depend on the host timezone (DuckDB treats
        # parquet timestamps as naive UTC)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Arrow-UDF stages run a JVM task thread AND a Python worker per
        # slot: at task.cpus=1 that is 2× CPU oversubscription and the
        # Python-dominated extraction kernel thrashes (measured 24-77s vs
        # 12-15s at local[32] on the sf0.1×64 corpus). task.cpus=2 sizes
        # slots for the JVM+Python pair — the same setting a real cluster
        # would ship via spark-submit --conf for this workload.
        .config("spark.task.cpus", os.environ.get("SPARK_TASK_CPUS", "2"))
        # parquet scans: keep splits small enough that one giant doc row
        # cannot pin a whole multi-GB split to one task at 100 TB
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # local mode: the driver IS the executor — size it for all concurrent
        # tasks (32 tasks × shuffle+arrow buffers spill badly in 8g)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
