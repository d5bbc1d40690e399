"""As-of (point-in-time) join — an operator Spark lacks natively.

Two implementations per the build guidance (compose built-ins first):

* :func:`asof_join` — the SCALE path: union both sides tagged, one shuffle
  on the key, then ``last(..., ignorenulls)`` over a window ordered by
  (ts, side) picks, for every left row, the most recent right row with
  ``right.ts <= left.ts`` (or strictly ``<``). No range explosion, no
  cross join; cost = one shuffle + one sort — the same asymptotics at
  100 TB.
* :func:`asof_join_pandas` — cogroup + ``pandas.merge_asof`` per key
  (readable reference implementation; same one-shuffle cost but leaves
  whole-stage codegen).

DuckDB's native ``ASOF JOIN`` serves as the correctness oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    strict: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row at-or-before (or,
    with ``strict``, strictly-before) its timestamp, per key. Left columns
    are preserved; right columns arrive suffixed, plus ``<ts><suffix>``."""
    extras = [c for c in left.columns if c not in (key, ts)]

    l_u = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in extras]).alias("__payload"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c + "__rv")
            for c in right_cols
        ],
    )
    r_u = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_u.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(c + "__rv") for c in right_cols],
    )
    unioned = l_u.unionByName(r_u)
    # tie handling at equal ts: '<=' ⇒ right rows sort before left rows
    # (visible to them); strict '<' ⇒ right rows sort after (invisible)
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # one struct per right row filled atomically: if the matched (most
    # recent) right row has NULL in some column, it must stay NULL — not be
    # backfilled from an older right row (merge_asof / DuckDB ASOF parity)
    rmatch = F.struct(
        *[F.col(c + "__rv").alias(c) for c in right_cols], F.col(ts).alias("__rts")
    )
    filled = unioned.select(
        "*",
        F.last(F.when(F.col("__side") == 0, rmatch), ignorenulls=True)
        .over(w)
        .alias("__rmatch"),
    )
    return filled.filter(F.col("__side") == 1).select(
        F.col(key),
        F.col(ts),
        *[F.col(f"__payload.{c}").alias(c) for c in extras],
        *[F.col(f"__rmatch.{c}").alias(c + suffix) for c in right_cols],
        F.col("__rmatch.__rts").alias(ts + suffix),
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    strict: bool = False,
    suffix: str = "_right",
    n_buckets: int | None = None,
) -> DataFrame:
    """cogroup + merge_asof (reference implementation of :func:`asof_join`).

    Cogrouped on a HASH BUCKET of the key, not the key itself: a per-key
    cogroup invokes one pandas merge per key — thousands of sub-millisecond
    ``merge_asof`` calls whose per-group Arrow/Python overhead dominated the
    r5 bench 22× over the union+window sibling. Bucketing keeps the same
    one-shuffle cost but amortizes the Python boundary over ~|keys|/buckets
    keys per call, with ``merge_asof(by=key)`` doing the per-key as-of
    matching inside the bucket — identical semantics, identical output.
    ``n_buckets`` defaults to the session's default parallelism (at scale:
    enough buckets that one bucket ≪ executor memory; any value returns the
    same rows)."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"{c}{suffix} {right.schema[c].dataType.simpleString()}" for c in right_cols]
        + [f"{ts}{suffix} timestamp"]
    )
    allow_exact = not strict
    left_cols = list(left.columns)
    # pre-rename the right side so the two cogroup sides share no column
    # names except the key (observed: same-named non-key columns can be
    # dropped from the right pdf in Spark 4.1's cogroup Arrow transfer)
    rts = ts + suffix
    if n_buckets is None:
        n_buckets = left.sparkSession.sparkContext.defaultParallelism
    bucket = F.pmod(F.hash(F.col(key)), F.lit(n_buckets)).alias("__bucket")
    left_b = left.select(bucket, *[F.col(c) for c in left_cols])
    # the right-side key is renamed too (__rkey): with the bucket as the
    # cogroup key, `key` is an ordinary column on both sides, and Spark
    # 4.1's cogroup Arrow transfer drops same-named right-side columns
    right_b = right.select(
        bucket,
        F.col(key).alias("__rkey"),
        F.col(ts).alias(rts),
        *[F.col(c).alias(c + suffix) for c in right_cols],
    )

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if l_pdf.empty:
            # right-only bucket: cogroup still calls us; nothing to emit
            # (and the empty frame may arrive without column labels)
            return pd.DataFrame(
                columns=left_cols + [c + suffix for c in right_cols] + [rts]
            )
        l_pdf = l_pdf.drop(columns="__bucket").sort_values(ts, kind="stable")
        if r_pdf.empty:
            for c in right_cols:
                l_pdf[c + suffix] = None
            l_pdf[rts] = pd.NaT
            return l_pdf
        r_pdf = r_pdf.sort_values(rts, kind="stable")[
            ["__rkey", rts] + [c + suffix for c in right_cols]
        ]
        return pd.merge_asof(
            l_pdf,
            r_pdf,
            left_on=ts,
            right_on=rts,
            left_by=key,
            right_by="__rkey",
            allow_exact_matches=allow_exact,
            direction="backward",
        ).drop(columns="__rkey")

    return (
        left_b.groupBy("__bucket")
        .cogroup(right_b.groupBy("__bucket"))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )
