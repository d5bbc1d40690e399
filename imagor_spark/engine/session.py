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


class SessionFrameCache:
    """Registry of persisted DataFrames keyed ``(applicationId, tag)`` with
    stale-session eviction: any access first drops-and-unpersists entries
    whose applicationId is not the caller's, so a long-lived driver process
    that starts/stops sessions never accumulates dead persisted lineages
    (the r3 ``_AUDIO_CACHE``/``_SIG_CACHE`` leak). ``max_per_app`` bounds
    same-session entries FIFO — evicting only drops cached blocks; a lazy
    plan still held by a consumer recomputes correctly."""

    def __init__(self, max_per_app: int | None = None):
        self._frames: dict[tuple[str, str], object] = {}
        self.max_per_app = max_per_app
        self._seq = 0

    def _unpersist(self, df) -> None:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped: JVM-side blocks are gone anyway

    def evict_stale(self, current_app_id: str) -> int:
        n = 0
        for key in list(self._frames):
            if key[0] != current_app_id:
                self._unpersist(self._frames.pop(key))
                n += 1
        return n

    def _bound(self, app_id: str) -> None:
        if not self.max_per_app:
            return
        same = [k for k in self._frames if k[0] == app_id]
        while len(same) >= self.max_per_app:
            self._unpersist(self._frames.pop(same.pop(0)))

    def get_or_create(self, spark, tag: str, builder):
        """Return the persisted frame for ``tag``, building+persisting via
        ``builder()`` on miss."""
        app = spark.sparkContext.applicationId
        self.evict_stale(app)
        key = (app, tag)
        df = self._frames.get(key)
        if df is None:
            self._bound(app)
            df = builder().persist()
            self._frames[key] = df
        return df

    def register(self, spark, tag_prefix: str, df):
        """Track an already-persisted frame (unique key per call) so it is
        unpersisted when the session goes stale or the per-app bound hits."""
        app = spark.sparkContext.applicationId
        self.evict_stale(app)
        self._bound(app)
        self._seq += 1
        self._frames[(app, f"{tag_prefix}#{self._seq}")] = df
        return df

    def __contains__(self, key) -> bool:
        return key in self._frames

    def __len__(self) -> int:
        return len(self._frames)


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
