"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference keeps per-key server state (result-cache hit counters,
singleflight groups, Prometheus counters keyed by status/format —
metrics/prometheusmetrics, imagor.go:842-884). The Spark-native analogue of
"arbitrary per-key state the built-in windows can't express" is
``applyInPandasWithState`` (north_star requirement): here, RUNNING per-codec
totals (clips, output bytes, last event time) that survive micro-batches
AND checkpoint restarts — state lives in the state store (RocksDB when
configured), partitioned by the grouping key, no driver accumulation.

Scale notes: state is keyed by ``codec`` (small cardinality but skewed);
for a 10^12-row stream the state per key is three scalars — the shuffle to
co-locate keys is the same exchange the windowed agg already pays, and the
Arrow transfer carries only the projected columns (codec, out_len,
ingest_ts), never payloads.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "codec string, n_clips long, out_bytes long, last_ingest_ts timestamp"
STATE_SCHEMA = "n long, b long, last_ts long"


def _update(key, pdfs, state: GroupState):
    n, b, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        b += int(pdf["out_len"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ingest_ts"].astype("int64").max() // 1000))
    state.update((int(n), int(b), int(last_us)))
    yield pd.DataFrame(
        [
            {
                "codec": key[0],
                "n_clips": int(n),
                "out_bytes": int(b),
                "last_ingest_ts": pd.Timestamp(last_us, unit="us"),
            }
        ]
    )


def running_codec_totals(result_stream: DataFrame) -> DataFrame:
    """Per-codec running totals over the TRANSFORMED stream: a stateful
    operator the built-in tumbling/session windows cannot express (totals
    never close — they accumulate for the stream's lifetime and resume from
    checkpoint). Project the tiny columns BEFORE the stateful exchange so
    payload bytes never enter the state plane."""
    slim = result_stream.select(
        "codec", F.length("bytes").alias("out_len"), "ingest_ts"
    )
    return slim.groupBy("codec").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
