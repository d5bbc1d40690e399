"""SparkSession factory tuned for the engine.

Local defaults target the sandbox (local[32], 128 GiB); on a real cluster the
same settings ride on top of spark-submit conf. Every choice is
scale-motivated:

* AQE on + skew-join handling — runtime re-plan for the skewed ``codec`` key
  (north_rule requirement) without hand-tuned partition counts.
* Arrow enabled with a bounded records-per-batch — the decode→transform→
  encode UDF holds whole PCM buffers per batch; 256 rows × ~1 MB keeps the
  executor-side working set bounded at 100 TB scale.
* shuffle.partitions defaults to cores locally; on a cluster AQE coalesces
  from a higher initial number.
* UTC session timezone — required for DuckDB-oracle comparisons and for
  deterministic window boundaries.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "imagor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    sp = shuffle_partitions or cpus
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
