"""Exactly-once foreachBatch sink with per-partition lineage + metrics and
a rendered-keys side table (the result-cache index).

``foreachBatch`` alone is at-least-once (a batch may replay after failure,
SURVEY §7 hard-point c). We make the effect idempotent the standard way:

  1. data for batch N lands under ``data/batch_id=N/`` with
     ``mode=overwrite`` — a replay overwrites the same directory, never
     duplicates;
  2. a commit marker ``_commits/N`` is written (atomic rename) AFTER the
     data write; readers/consumers trust only committed batches;
  3. a replayed batch whose marker already exists is skipped entirely.

This mirrors the reference's result-storage save discipline: write result,
then make it visible; cleanup-on-error leaves no committed partial state
(≅ saveWithErrorHandling + delete-on-error, imagor.go:783-811,
storage/filestorage/filestorage.go:79-115).

Lineage + metrics (north_rule): every batch also appends rows to
``lineage/`` — one row per (batch, spark partition) with row counts and
event-time bounds — and ``metrics/`` — one row per (batch, status, codec)
mirroring imagor's Prometheus counters (metrics/prometheusmetrics).

Rendered keys (result-cache load, imagor.go:403-408 + loadResult
imagor.go:600-664): each batch appends the committed ``result_key``s of
successful renders to ``rendered_keys/`` — a compact index the pipeline
left-anti-joins incoming clips against, so re-runs/backfills skip work that
is already in result storage.

Single-pass design: the payload (binary) column is traversed exactly ONCE —
the partitioned data write. Lineage, metrics and rendered keys are then
aggregated from a column-pruned re-read of the just-written parquet
(out_len/part_id materialized at write time), so no multi-GB batch ever
needs to be persisted for two tiny aggregates (the round-1 sink cached the
full payload batch three jobs long).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F

# statuses whose results land in result storage (≅ successful render)
_RENDERED_STATUSES = ("ok", "meta")


class IdempotentSink:
    def __init__(
        self,
        out_dir: str,
        partition_by: str | None = "codec",
        rendered_compact_every: int = 32,
    ):
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.commits_dir = os.path.join(out_dir, "_commits")
        self.lineage_dir = os.path.join(out_dir, "lineage")
        self.metrics_dir = os.path.join(out_dir, "metrics")
        self.rendered_dir = os.path.join(out_dir, "rendered_keys")
        self.partition_by = partition_by
        # compact the rendered-keys index once this many per-batch dirs
        # accumulate (0 disables auto-compaction)
        self.rendered_compact_every = rendered_compact_every
        os.makedirs(self.commits_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.commits_dir, str(batch_id))

    @staticmethod
    def _has_parquet_files(path: str) -> bool:
        """True if any .parquet data file exists under ``path`` (one level of
        partition dirs deep — matching the sink's own layout)."""
        try:
            entries = os.listdir(path)
        except FileNotFoundError:
            return False
        for e in entries:
            full = os.path.join(path, e)
            if e.endswith(".parquet") and os.path.isfile(full):
                return True
            if os.path.isdir(full):
                try:
                    if any(x.endswith(".parquet") for x in os.listdir(full)):
                        return True
                except FileNotFoundError:
                    continue
        return False

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.is_committed(batch_id):
            return  # replayed batch: effect already visible → exactly-once
        self._commit(batch_df, batch_id)

    def _with_provenance(self, batch_df: DataFrame) -> DataFrame:
        """Provenance columns materialized in the SINGLE payload pass:
        part_id = producing partition, out_len = payload size."""
        return batch_df.withColumn("part_id", F.spark_partition_id()).withColumn(
            "out_len", F.length("bytes")
        )

    def _commit(self, batch_df: DataFrame, batch_id: int) -> None:
        """Write data + side tables, then the marker (caller has already
        checked ``is_committed``)."""
        t0 = time.time()
        spark = batch_df.sparkSession
        batch_df = self._with_provenance(batch_df)
        data_path = os.path.join(self.data_dir, f"batch_id={batch_id}")
        # snappy (r6 A/B, reversing the r3 zstd choice with measurement):
        # the payload column is ALREADY-ENCODED media — zstd recovers only
        # ~5% (2,711 MB written vs 2,853 MB raw at sf0.1) yet costs ~20 s
        # of a ~27 s pipeline run in compression CPU (measured same-host-
        # phase: zstd 47.4 s, snappy 27.3 s, uncompressed 30.3 s). Snappy
        # is near-free CPU and its 5% loss costs ~1.2 s even on the
        # 122 MB/s disk workdir — it wins on BOTH workdirs, and the same
        # holds at scale for any sink whose payloads are compressed codecs.
        # Env-overridable for A/B measurement (BENCH.md codec study).
        compression = os.environ.get("SPARK_GRAFT_SINK_COMPRESSION", "snappy")
        writer = batch_df.write.mode("overwrite").option("compression", compression)
        if self.partition_by:
            writer = writer.partitionBy(self.partition_by)
        writer.parquet(data_path)

        # derived side tables from a column-pruned re-read (never touches
        # the binary column again — parquet reads only the tiny columns).
        # An empty batch + dynamic partitionBy writes zero parquet files,
        # which would make the re-read fail schema inference — detect that
        # case explicitly (never via a broad except, which would mistake a
        # transient FS error for an empty batch and stamp a synthetic
        # partition into a non-empty batch's directory).
        if not self._has_parquet_files(data_path):
            # write a schema-bearing empty file inside a synthetic partition
            # dir so the directory layout stays consistent with non-empty
            # batches (readers of data/lineage/metrics see the batch as 0 rows)
            empty = batch_df.limit(0).coalesce(1)
            target = data_path
            if self.partition_by:
                empty = empty.drop(self.partition_by)
                target = os.path.join(data_path, f"{self.partition_by}=__empty__")
            empty.write.mode("overwrite").parquet(target)
        written = spark.read.parquet(data_path)
        self._write_side_tables(written, batch_id)
        # atomic commit marker LAST
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "batch_id": batch_id,
                    "wall_s": round(time.time() - t0, 3),
                    "committed_at_ms": int(time.time() * 1000),
                },
                f,
            )
        os.replace(tmp, self._marker(batch_id))
        # periodic index compaction: a long-running pipeline otherwise grows
        # one rendered_keys/batch-* parquet dir per batch forever, and the
        # anti-join's build side becomes thousands of small files. The batch
        # data is already committed (marker above), so a failure in this
        # non-essential index maintenance must not fail the streaming query —
        # the next commit retries it.
        if self.rendered_compact_every and self._n_rendered_batch_dirs() >= self.rendered_compact_every:
            try:
                self.compact_rendered_keys(spark)
            except Exception as exc:  # pragma: no cover - transient FS/Spark
                print(f"[sink] rendered-keys compaction deferred: {exc}")

    def _write_side_tables(self, written: DataFrame, batch_id: int) -> None:
        """Lineage / metrics / rendered-keys side tables from a
        column-pruned re-read of the just-written batch data."""
        lineage = (
            written.groupBy("part_id")
            .agg(
                F.count("*").alias("n_rows"),
                F.min("ingest_ts").alias("min_ingest_ts"),
                F.max("ingest_ts").alias("max_ingest_ts"),
                F.sum("out_len").alias("out_bytes"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        metrics = (
            written.groupBy("status", "codec")
            .agg(F.count("*").alias("n"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        rendered = (
            written.filter(F.col("status").isin(*_RENDERED_STATUSES))
            .select("result_key")
            .distinct()
        )
        # plain batch-N dir names (no '=') so partition inference does
        # not collide with the explicit batch_id column in the rows
        lineage.write.mode("overwrite").parquet(
            os.path.join(self.lineage_dir, f"batch-{batch_id}")
        )
        metrics.write.mode("overwrite").parquet(
            os.path.join(self.metrics_dir, f"batch-{batch_id}")
        )
        rendered.write.mode("overwrite").parquet(
            os.path.join(self.rendered_dir, f"batch-{batch_id}")
        )

    # ---- reader side: only committed batches are visible

    def committed_batches(
        self, max_age_ms: int | None = None, now_ms: int | None = None
    ) -> list[int]:
        """Committed batch ids; with ``max_age_ms``, expired batches are
        filtered out on READ (≅ the expiration check on Get,
        filestorage.go:64-76 + getTtl imagor.go:991-1003) — an expired
        result behaves like a cache miss, so the anti-join re-renders it."""
        try:
            ids = sorted(
                int(x) for x in os.listdir(self.commits_dir) if not x.endswith(".tmp")
            )
        except FileNotFoundError:
            return []
        if max_age_ms is None:
            return ids
        now = now_ms if now_ms is not None else int(time.time() * 1000)
        fresh = []
        for b in ids:
            try:
                with open(self._marker(b)) as f:
                    meta = json.load(f)
                committed_at = meta.get("committed_at_ms")
                if committed_at is None:
                    # legacy marker without a timestamp: age by the marker
                    # file's mtime instead of treating it as infinitely old
                    committed_at = int(os.path.getmtime(self._marker(b)) * 1000)
                if now - committed_at <= max_age_ms:
                    fresh.append(b)
            except (OSError, ValueError):
                continue
        return fresh

    def _committed_paths(
        self, base: str, prefix: str, max_age_ms: int | None = None,
        now_ms: int | None = None,
    ) -> list[str]:
        batches = self.committed_batches(max_age_ms=max_age_ms, now_ms=now_ms)
        paths = [os.path.join(base, f"{prefix}{b}") for b in batches]
        return [p for p in paths if os.path.exists(p)]

    def read_committed(
        self, spark, max_age_ms: int | None = None, now_ms: int | None = None
    ) -> DataFrame:
        paths = self._committed_paths(
            self.data_dir, "batch_id=", max_age_ms=max_age_ms, now_ms=now_ms
        )
        if not paths:
            raise FileNotFoundError("no committed batches")
        return spark.read.option("basePath", self.data_dir).parquet(*paths)

    def read_lineage(self, spark) -> DataFrame:
        return spark.read.parquet(os.path.join(self.lineage_dir, "batch-*"))

    def read_metrics(self, spark) -> DataFrame:
        return spark.read.parquet(os.path.join(self.metrics_dir, "batch-*"))

    # ---- rendered-keys index compaction (result-cache index maintenance):
    # the reference's result storage is ONE keyed store; per-batch dirs are
    # an append log that must fold into a compact index periodically

    def _compact_manifest_path(self) -> str:
        return os.path.join(self.rendered_dir, "_compacted.json")

    def _read_compact_manifest(self) -> dict | None:
        try:
            with open(self._compact_manifest_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _n_rendered_batch_dirs(self) -> int:
        try:
            return sum(
                1 for e in os.listdir(self.rendered_dir) if e.startswith("batch-")
            )
        except FileNotFoundError:
            return 0

    def _marker_committed_at(self, batch_id: int) -> int:
        try:
            with open(self._marker(batch_id)) as f:
                meta = json.load(f)
            at = meta.get("committed_at_ms")
            if at is not None:
                return int(at)
        except (OSError, ValueError):
            pass
        try:
            return int(os.path.getmtime(self._marker(batch_id)) * 1000)
        except OSError:
            return 0

    def compact_rendered_keys(self, spark) -> int:
        """Fold the per-batch rendered-keys dirs (plus any previous compact
        index) into ONE distinct parquet keyed (result_key, committed_at_ms)
        — a re-rendered key keeps its NEWEST commit time, so TTL expiration
        (applied per-row on read) matches the batch-level semantics. The
        manifest swap is atomic (os.replace); stale batch dirs are removed
        only after the new manifest is visible, and a crash in between is
        harmless (reads use manifest.upto to ignore folded batch dirs).
        Returns the new row count of the compact index."""
        import shutil

        manifest = self._read_compact_manifest()
        prev_upto = manifest["upto"] if manifest else -1
        batch_ids = [
            b
            for b in self.committed_batches()
            if b > prev_upto
            and os.path.exists(os.path.join(self.rendered_dir, f"batch-{b}"))
        ]
        if not batch_ids and manifest:
            return 0  # nothing new to fold
        frames = []
        if manifest:
            frames.append(
                spark.read.parquet(os.path.join(self.rendered_dir, manifest["name"]))
            )
        for b in batch_ids:
            frames.append(
                spark.read.parquet(os.path.join(self.rendered_dir, f"batch-{b}"))
                .select("result_key")
                .withColumn("committed_at_ms", F.lit(self._marker_committed_at(b)))
            )
        if not frames:
            return 0
        union = frames[0]
        for fr in frames[1:]:
            union = union.unionByName(fr)
        compacted = union.groupBy("result_key").agg(
            F.max("committed_at_ms").alias("committed_at_ms")
        ).persist()
        n = compacted.count()
        # file sizing: ~5M keys (~300 MB) per output file — ONE file for any
        # sandbox-scale index, but never a single-file bottleneck at 10^12
        # keys (the groupBy above already hash-partitioned by result_key;
        # persist so the count and the write share one aggregation pass)
        n_files = max(1, n // 5_000_000)
        new_upto = max(batch_ids) if batch_ids else prev_upto
        new_name = f"compact-{new_upto}"
        out_path = os.path.join(self.rendered_dir, new_name)
        compacted.coalesce(n_files).write.mode("overwrite").parquet(out_path)
        compacted.unpersist()
        tmp = self._compact_manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"upto": new_upto, "name": new_name, "n_keys": n}, f)
        os.replace(tmp, self._compact_manifest_path())
        # cleanup AFTER the manifest swap: folded batch dirs + old compact
        for b in batch_ids:
            shutil.rmtree(os.path.join(self.rendered_dir, f"batch-{b}"), ignore_errors=True)
        if manifest and manifest["name"] != new_name:
            shutil.rmtree(
                os.path.join(self.rendered_dir, manifest["name"]), ignore_errors=True
            )
        return n

    def read_rendered_keys(
        self, spark, max_age_ms: int | None = None, now_ms: int | None = None
    ) -> DataFrame:
        """Committed result-cache index: DataFrame[result_key] (distinct per
        batch; dedup across batches happens in the anti-join). Empty frame
        when nothing is committed yet. ``max_age_ms`` expires old entries —
        their keys drop out of the index and the anti-join re-renders them
        (result-cache TTL, getTtl imagor.go:991-1003). Reads the compact
        index (row-level TTL on its committed_at_ms column) plus any
        not-yet-folded per-batch dirs (batch-level TTL via the marker)."""
        manifest = self._read_compact_manifest()
        frames = []
        if manifest:
            cdf = spark.read.parquet(os.path.join(self.rendered_dir, manifest["name"]))
            if max_age_ms is not None:
                now = now_ms if now_ms is not None else int(time.time() * 1000)
                cdf = cdf.filter(F.col("committed_at_ms") >= F.lit(now - max_age_ms))
            frames.append(cdf.select("result_key"))
        upto = manifest["upto"] if manifest else -1
        batches = [
            b
            for b in self.committed_batches(max_age_ms=max_age_ms, now_ms=now_ms)
            if b > upto
        ]
        paths = [
            p
            for p in (os.path.join(self.rendered_dir, f"batch-{b}") for b in batches)
            if os.path.exists(p)
        ]
        if paths:
            frames.append(spark.read.parquet(*paths).select("result_key"))
        if not frames:
            return spark.createDataFrame([], "result_key string")
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        return out


class AggSink(IdempotentSink):
    """Exactly-once sink for AGGREGATED streaming output (windowed rollups)
    — the same commit-marker discipline as :class:`IdempotentSink`, minus
    the payload-specific side tables (agg rows carry no bytes/status/
    result_key). Used by the streaming parity queries so no catalog entry
    needs complete-mode + a memory sink (which cannot resume from a
    checkpoint and holds the whole result in executor memory).

    With ``outputMode("update")`` each micro-batch appends the CHANGED
    groups; :meth:`read_latest` folds the committed log back into current
    state by keeping each group's row from its highest committed batch —
    the streaming-upsert read side of an append-only exactly-once log (an
    Iceberg/Delta MERGE target would absorb this fold on a real cluster).
    """

    def __init__(self, out_dir: str):
        super().__init__(out_dir, partition_by=None, rendered_compact_every=0)

    def _with_provenance(self, batch_df: DataFrame) -> DataFrame:
        return batch_df

    def _write_side_tables(self, written: DataFrame, batch_id: int) -> None:
        pass

    def read_latest(self, spark, key_cols: list[str]) -> DataFrame:
        """Current state: one row per group key, from the highest committed
        batch that updated it (``batch_id`` is the partition column the
        per-batch dir layout provides for free)."""
        from pyspark.sql import Window

        df = self.read_committed(spark)
        w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
            F.col("batch_id").desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "batch_id")
        )
