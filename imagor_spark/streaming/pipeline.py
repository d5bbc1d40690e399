"""The continuous dataflow — micro-batch replaces HTTP request.

≅ the reference's request lifecycle (imagor.go:275-540) as Structured
Streaming (SURVEY §3.1 Spark mapping):

  readStream (file/Iceberg source)
    → watermark on ingest_ts                     (event-time plane)
    → salted repartition on the skewed codec key (scale plane)
    → dropDuplicatesWithinWatermark(clip_id)     (singleflight +
                                                  single-render-per-key,
                                                  imagor.go:842-884)
    → transform (vectorized decode→ops→encode)   (the processor)
    → foreachBatch IdempotentSink                (result storage save,
                                                  exactly-once)

State lives in RocksDB (spark.sql.streaming.stateStore.providerClass) so
dedup state at 10^12 keys spills off-heap; the within-watermark retention
bound keeps state finite (the reference's result cache has TTL semantics
too — getTtl, imagor.go:991-1003).

Skew: ``codec`` is 70 % 'wav' (FIXTURES §1). Stateful dedup shuffles by
clip_id (uniform), but the downstream windowed agg groups by codec — we
salt it: ``salt = pmod(hash(clip_id), N_SALTS)`` is added to the group key,
then a second tiny agg folds the salts. At 1000 executors this turns one
hot partition into N_SALTS even ones; AQE handles residual skew.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..engine.transform import make_transform_fn, OUTPUT_SCHEMA
from ..sources.clips import CLIPS_SCHEMA
from .sink import IdempotentSink

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def configure_streaming(spark, use_rocksdb: bool = True) -> None:
    if use_rocksdb:
        try:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
        except Exception:
            pass  # fall back to HDFSBackedStateStoreProvider


def build_stream(
    spark,
    input_dir: str,
    secret: str | None = None,
    watermark: str = "10 minutes",
    dedup: bool = True,
    salt_partitions: int | None = None,
    assets: dict | None = None,
    max_files_per_trigger: int | None = None,
    for_aggregation: bool = False,
    allow_unsafe: bool | None = None,
    rendered_keys: DataFrame | None = None,
) -> DataFrame:
    """Source → result-cache anti-join → watermark → dedup → transform.
    Returns the streaming result DataFrame (un-sunk), so windowed aggs can
    branch off it.

    ``rendered_keys``: static DataFrame[result_key] of already-committed
    renders (``IdempotentSink.read_rendered_keys``). Incoming clips whose
    ops resolve to a committed key are dropped BEFORE decode — the
    reference's cache-hit-before-render economy (imagor.go:403-408,
    loadResult :600-664)."""
    reader = spark.readStream.schema(CLIPS_SCHEMA)
    if max_files_per_trigger:
        # admission control ≅ ProcessConcurrency/ProcessQueueSize semaphores
        # (imagor.go:134-137,409-427): bound in-flight work per trigger
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    if rendered_keys is not None:
        from ..engine.transform import skip_rendered

        stream = skip_rendered(stream, rendered_keys)
    b_assets = spark.sparkContext.broadcast(assets) if assets else None
    fn = make_transform_fn(secret, b_assets, allow_unsafe=allow_unsafe)
    if not for_aggregation:
        # SINK layout: dedup BEFORE transform — the singleflight semantic
        # (imagor.go:842-884): a duplicate clip_id must never pay the render.
        # foreachBatch is not a stateful operator, so no watermark is needed
        # downstream of the transform (mapInPandas drops the watermark tag).
        stream = stream.withWatermark("ingest_ts", watermark)
        if dedup:
            stream = stream.dropDuplicatesWithinWatermark(["clip_id"])
        if salt_partitions:
            stream = stream.repartition(
                salt_partitions,
                F.col("codec"),
                F.pmod(F.hash("clip_id"), F.lit(salt_partitions)),
            )
        return stream.mapInPandas(fn, schema=OUTPUT_SCHEMA)
    # AGGREGATION layout: windowed aggs need an event-time watermark on the
    # *transformed* stream, and Spark allows only one watermark definition
    # per query — so here the watermark (and optional dedup) sit after the
    # transform. Duplicates may render twice in this layout; the agg itself
    # still sees each clip once when dedup=True (multiple stateful operators
    # chained, Spark 3.5+ allowMultiple).
    out = stream.mapInPandas(fn, schema=OUTPUT_SCHEMA)
    out = out.withWatermark("ingest_ts", watermark)
    if dedup:
        out = out.dropDuplicatesWithinWatermark(["clip_id"])
    return out


def run_to_sink(
    result_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    partition_by: str | None = "codec",
):
    """Attach the exactly-once sink and start the query."""
    sink = IdempotentSink(out_dir, partition_by=partition_by)
    writer = (
        result_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    return q, sink


def run_pipeline(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    secret: str | None = None,
    watermark: str = "10 minutes",
    dedup: bool = True,
    salt_partitions: int | None = None,
    assets: dict | None = None,
    use_rocksdb: bool = True,
    wait: bool = True,
    allow_unsafe: bool | None = None,
    result_cache_dir: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """End-to-end: build, sink, (optionally) wait for availableNow drain.

    ``result_cache_dir``: a prior run's sink directory; its committed
    rendered-keys index is anti-joined upstream of the transform, so a
    re-run / backfill / fresh-checkpoint restart over already-rendered
    clips renders nothing (pass ``out_dir`` itself to resume-with-cache)."""
    configure_streaming(spark, use_rocksdb)
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    rendered = None
    if result_cache_dir:
        rendered = IdempotentSink(result_cache_dir).read_rendered_keys(spark)
    result = build_stream(
        spark, input_dir, secret=secret, watermark=watermark,
        dedup=dedup, salt_partitions=salt_partitions, assets=assets,
        allow_unsafe=allow_unsafe, rendered_keys=rendered,
        max_files_per_trigger=max_files_per_trigger,
    )
    q, sink = run_to_sink(result, out_dir, checkpoint_dir)
    if wait:
        q.awaitTermination()
    return q, sink
