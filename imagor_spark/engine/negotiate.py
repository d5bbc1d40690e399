"""Content negotiation + fallback-format rewrite — pure column logic.

≅ imagor's auto WebP/AVIF/JPEG negotiation (imagor.go:340-376): when the
request's Accept header allows a better codec, a ``format()`` filter is
appended to the ops path (and the canonical path regenerated); plus
``applyAutoFormatFallback`` (process.go:260-271): if the payload needs a
capability the negotiated codec lacks, fall back.

Audio mapping: an ``accept`` column (e.g. "audio/flac,audio/*") negotiates
{flac > ogg > wav}; multichannel clips negotiated into a mono-only codec
fall back to wav. Implemented entirely with when/otherwise — stays in
whole-stage codegen, a trivial rewrite at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# codecs the negotiator may choose, best-first (≅ WebP > AVIF > JPEG order)
NEGOTIABLE = ["flac", "ogg", "wav"]
# stand-in capability table: ogg stand-in is declared mono-only so the
# fallback path is exercised (≅ animation-support fallback)
MONO_ONLY = ["ogg"]


def negotiated_codec(accept: Column) -> Column:
    """Accept-header → target codec. Priority: explicit best-first match,
    then ``audio/*`` → best, else wav."""
    chain = F.lit("wav")
    for codec in reversed(NEGOTIABLE):
        chain = F.when(accept.contains(f"audio/{codec}"), codec).otherwise(chain)
    return F.when(accept.contains("audio/*"), NEGOTIABLE[0]).otherwise(chain)


def apply_auto_format(
    df: DataFrame,
    accept_col: str = "accept",
    channels_col: str | None = None,
) -> DataFrame:
    """Append ``filters:format(<negotiated>)`` to the ops path when the
    consumer accepts a better codec; multichannel + mono-only codec →
    fallback to wav (process.go:260-271). Adds ``negotiated`` and rewrites
    ``ops`` (a Vary:Accept analogue — the result key changes with accept)."""
    target = negotiated_codec(F.col(accept_col))
    if channels_col is not None:
        target = F.when(
            (F.col(channels_col) > 1) & target.isin(MONO_ONLY), F.lit("wav")
        ).otherwise(target)
    has_format = F.col("ops").rlike(":format\\(|filters:format\\(")
    new_ops = F.when(
        has_format | (target == "wav"), F.col("ops")
    ).otherwise(
        # insert before the trailing /<clip_id> segment: ops paths here end
        # with /<image>; append a filters block right before it
        F.concat(
            F.regexp_replace(F.col("ops"), "/([^/]+)$", ""),
            F.lit("/filters:format("),
            target,
            F.lit(")/"),
            F.regexp_extract(F.col("ops"), "/([^/]+)$", 1),
        )
    )
    return df.withColumn("negotiated", target).withColumn("ops", new_ops)
