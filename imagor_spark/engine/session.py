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
        # ~1k rows × ~60-120 KB payload ≈ 64-128 MB Arrow batches: big enough
        # to amortize the Python-worker round trip, small enough to stay out
        # of GC trouble (measured: 256-row batches were 5-20× slower and
        # GC-thrashy with binary payload columns)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # parquet vectorized reader reserves batchSize × row-width PER TASK:
        # at the default 4096 rows × ~120 KB binary payload × 32 tasks that
        # is > 16 GB and OOMs — 512 rows keeps each task's column vector
        # ≈ 64 MB (measured failure at sf0.1; the same math governs
        # executor sizing on a real cluster)
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # binary payload columns churn the heap; 12g is ample for local
        # benches. NOTE (gVisor sandbox): first-touch page faults make the
        # first pass over fresh heap/direct-buffer pages 10-50× slower —
        # throughput measurements need a warmup pass (bench.py does one),
        # mirroring the reference's 10 s-warmup methodology
        # (docs/docs/benchmarks.mdx:191-200)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", f"{max(12, cpus + 16)}g"),
        )
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseG1GC -Dio.netty.tryReflectionSetAccessible=true",
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
