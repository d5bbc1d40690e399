"""Windowed aggregates over the clip stream — the result-cache-keying
mirror (north_star: "tumbling and session windows group clips by
codec+sr_hz bucket for a windowed hash-aggregate").

The reference keys its result cache by the canonical path and meters per-key
activity (result-cache keying, imagorpath/hasher.go; Prometheus histograms,
metrics/prometheusmetrics/prometheus.go:52-60). The streaming analogue:
per-(window, codec, sr_bucket) rollups with approx-distinct clip counts.

Skew handling: codec is 70 % 'wav', so a naive groupBy(codec) sends 70 % of
the stream through one reducer. ``salted=True`` two-phase aggregates:
phase 1 groups by (window, codec, sr_bucket, salt) — N_SALTS-way fan-out of
the hot key — phase 2 folds the salts. Counts/sums recombine exactly;
approx_count_distinct is re-aggregated from per-salt partials only in the
unsalted plan (HLL partials don't fold through a second groupBy in pure
DataFrame ops, so the salted variant reports sum-of-partials as
``n_distinct_upper`` — documented upper bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_SALTS = 16


def sr_bucket(col: str = "sr_hz"):
    """Bucket sample rates: 8k/16k/22k/44k/48k → the dimension the reference
    would call image-size class."""
    return (F.col(col) / 1000).cast("int").alias("sr_bucket")


def tumbling_agg(
    result_stream: DataFrame,
    window: str = "1 minute",
    salted: bool = False,
) -> DataFrame:
    """Tumbling windows over ingest_ts × (codec, sr_bucket)."""
    key = [F.window("ingest_ts", window).alias("win"), F.col("codec"), sr_bucket()]
    if not salted:
        return result_stream.groupBy(*key).agg(
            F.count("*").alias("n_clips"),
            F.sum(F.length("bytes")).alias("out_bytes"),
            F.approx_count_distinct("clip_id").alias("n_distinct_clips"),
        )
    salt = F.pmod(F.hash("clip_id"), F.lit(N_SALTS)).alias("salt")
    phase1 = result_stream.groupBy(*key, salt).agg(
        F.count("*").alias("n_clips"),
        F.sum(F.length("bytes")).alias("out_bytes"),
        F.approx_count_distinct("clip_id").alias("nd_partial"),
    )
    return phase1.groupBy("win", "codec", "sr_bucket").agg(
        F.sum("n_clips").alias("n_clips"),
        F.sum("out_bytes").alias("out_bytes"),
        F.sum("nd_partial").alias("n_distinct_upper"),
    )


def sliding_agg(
    result_stream: DataFrame, window: str = "2 minutes", slide: str = "1 minute"
) -> DataFrame:
    """Sliding windows (north_rule names tumbling/sliding/session)."""
    return result_stream.groupBy(
        F.window("ingest_ts", window, slide).alias("win"), "codec"
    ).agg(F.count("*").alias("n_clips"))


def session_agg(result_stream: DataFrame, gap: str = "30 seconds") -> DataFrame:
    """Session windows per codec: bursts of clip activity separated by > gap
    (≅ request-burst coalescing the singleflight layer sees)."""
    return result_stream.groupBy(
        F.session_window("ingest_ts", gap).alias("session"), "codec"
    ).agg(
        F.count("*").alias("n_clips"),
        F.approx_count_distinct("clip_id").alias("n_distinct_clips"),
    )


def batch_sessionize(df: DataFrame, gap_seconds: int = 30, key: str = "codec") -> DataFrame:
    """Batch-mode sessionization via lag+cumsum (oracle-comparable twin of
    ``session_agg`` — same session boundaries, computable in ANSI SQL)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy("ingest_ts")
    gap = (
        F.when(
            F.col("ingest_ts").cast("long")
            - F.lag(F.col("ingest_ts").cast("long")).over(w)
            > gap_seconds,
            1,
        )
        .otherwise(0)
        .alias("new_session")
    )
    sess = df.select(key, "ingest_ts", gap).withColumn(
        "session_id", F.sum("new_session").over(w)
    )
    return sess.groupBy(key, "session_id").agg(
        F.count("*").alias("n_rows"),
        F.min("ingest_ts").alias("session_start"),
        F.max("ingest_ts").alias("session_end"),
    )
