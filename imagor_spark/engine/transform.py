"""The batch transform engine — decode → transform → encode as ONE
Arrow-vectorized ``mapInPandas`` stage.

≅ the reference's request lifecycle ``Do`` → ``vipsprocessor.Process``
(/root/reference/imagor.go:275-540, processor/vipsprocessor/process.go:52-184)
collapsed into a per-micro-batch dataflow: signature verify → expire check →
parse → kernel chain → encode, with rejected rows flowing to a quarantine
side-output instead of HTTP 4xx.

Scale design:
* one Python worker pass per Arrow batch; all signal math is numpy inside
  the batch (zero per-sample Python);
* ops parsing is memoized per distinct ops string within a batch (templates
  repeat heavily — ≅ singleflight's common-subexpression win);
* rejected rows never decode (signature checked before touching payload);
* no shuffle introduced: the stage is a narrow map, so upstream partitioning
  (e.g. the salted-codec repartition) is preserved;
* watermark/overlay assets ship once per executor via Spark broadcast
  (≅ the loader callback, imagor.go:399-402).
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..audio import apply as audio_apply
from ..audio import codecs
from ..imagorpath import Params, hex_digest_path, parse, result_path
from ..imagorpath.signer import HMACSigner

# status values (≅ errors.go: ErrSignatureMismatch/ErrExpired/ErrUnsupported…)
STATUS_OK = "ok"
STATUS_META = "meta"
STATUS_SIG_MISMATCH = "sig_mismatch"
STATUS_EXPIRED = "expired"
STATUS_DECODE_ERROR = "decode_error"
STATUS_BOMB = "resolution_bomb"

OUTPUT_SCHEMA = (
    "clip_id string, result_key string, bytes binary, sr_hz int, dur_ms int, "
    "n_samples int, codec string, transcript string, ingest_ts timestamp, "
    "status string, meta string, ops string"
)


def _canonicalize(p: Params) -> str:
    """Regenerate the canonical path after parse (imagor.go:377-379) — the
    result-cache key basis. Utility filters (expire/attachment) are
    STRIPPED first (imagor.go:331-338): they shape the response envelope,
    not the rendered bytes, so ``attachment(a.wav)`` and a bare render of
    the same ops must share one cache entry — the full Params (attachment
    included) still flows to the processor for the disposition meta."""
    return result_path(p)


class _OpsCache:
    """Per-batch memo of parsed+verified ops strings."""

    def __init__(self, signer: HMACSigner | None, now_ms: int, allow_unsafe: bool):
        self.signer = signer
        self.now_ms = now_ms
        self.allow_unsafe = allow_unsafe
        self.cache: dict[str, tuple[Params, str, str, str]] = {}

    def get(self, ops: str) -> tuple[Params, str, str, str]:
        """→ (params, canonical, result_key, reject_status)."""
        hit = self.cache.get(ops)
        if hit is not None:
            return hit
        p = parse(ops)
        reject = ""
        # signature verify (imagor.go:290-302): when a signer is configured,
        # unsafe/ paths pass ONLY if unsafe mode is explicitly enabled
        # (the reference's default posture rejects them); signed paths must
        # hash-match
        if p.unsafe:
            if not self.allow_unsafe:
                reject = STATUS_SIG_MISMATCH
        else:
            if self.signer is None or self.signer.sign(p.path) != p.hash:
                reject = STATUS_SIG_MISMATCH
        # expire(ts) utility filter (imagor.go:314-322)
        if not reject:
            for f in p.filters:
                if f.name == "expire":
                    try:
                        if self.now_ms > int(f.args):
                            reject = STATUS_EXPIRED
                    except ValueError:
                        pass
        canonical = _canonicalize(p)
        key = hex_digest_path(canonical)
        out = (p, canonical, key, reject)
        self.cache[ops] = out
        return out


# executor-local decoded-source cache (≅ cache.go:37-163): one per Python
# worker process, shared across batches; BYTE-budgeted (ristretto-style),
# bypass-rule aware
_DECODE_CACHE = audio_apply.DecodeCache()


def make_transform_fn(
    secret: str | None,
    assets: dict[str, tuple[np.ndarray, int]] | None = None,
    alg: str = "sha1",
    truncate: int = 0,
    now_ms: int | None = None,
    allow_unsafe: bool | None = None,
    use_decode_cache: bool = True,
):
    """Build the mapInPandas function. ``assets`` may be a plain dict or a
    Spark Broadcast (unwrapped lazily on the executor).

    ``allow_unsafe`` mirrors the reference's ``-imagor-unsafe`` flag
    (imagor.go:290-302): default None resolves to True only when NO secret
    is configured — with a signer present, ``unsafe/`` paths are rejected
    (STATUS_SIG_MISMATCH) unless explicitly enabled."""
    signer = HMACSigner(alg, truncate, secret) if secret is not None else None
    if allow_unsafe is None:
        allow_unsafe = signer is None
    if os.environ.get("SPARK_GRAFT_DECODE_CACHE") == "0":  # A/B kill switch
        use_decode_cache = False
    fixed_now = now_ms

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        asset_map = assets.value if hasattr(assets, "value") else (assets or {})
        now = fixed_now if fixed_now is not None else int(time.time() * 1000)
        for pdf in batches:
            if not len(pdf):
                continue
            cache = _OpsCache(signer, now, allow_unsafe)
            n = len(pdf)
            out = {
                "clip_id": pdf["clip_id"].to_numpy(),
                "result_key": np.empty(n, dtype=object),
                "bytes": np.empty(n, dtype=object),
                "sr_hz": np.zeros(n, dtype=np.int32),
                "dur_ms": np.zeros(n, dtype=np.int32),
                "n_samples": np.zeros(n, dtype=np.int32),
                "codec": np.empty(n, dtype=object),
                "transcript": pdf["transcript"].to_numpy().copy(),
                "ingest_ts": pdf["ingest_ts"].to_numpy()
                if "ingest_ts" in pdf
                else np.full(n, np.datetime64("2026-01-01")),
                "status": np.empty(n, dtype=object),
                "meta": np.empty(n, dtype=object),
                "ops": pdf["ops"].to_numpy(),
            }
            blobs = pdf["bytes"].to_numpy()
            transcripts = pdf["transcript"].to_numpy()
            # admission plane (optional column attached by the broadcast
            # config join upstream, TransformingSink): rows whose codec had
            # no config entry or exceeded per-codec limits are quarantined
            # HERE, before any payload byte is touched — folding admission
            # into the one narrow map keeps the micro-batch single-scan
            # (a split+union layout would scan the batch twice and re-run
            # its dedup subtree per branch)
            admit = (
                pdf["admit_status"].to_numpy() if "admit_status" in pdf else None
            )
            for i in range(n):
                p, canonical, rkey, reject = cache.get(out["ops"][i])
                out["result_key"][i] = rkey
                out["meta"][i] = ""
                out["bytes"][i] = b""
                out["codec"][i] = ""
                if reject:
                    # signature/expiry rejection wins (the reference checks
                    # the signature before resolving any loader,
                    # imagor.go:290-302 vs :699-760)
                    out["status"][i] = reject
                    continue
                if admit is not None and admit[i] != "ok":
                    out["status"][i] = admit[i]
                    continue
                try:
                    payload, meta = audio_apply.process(
                        blobs[i], p, asset_map,
                        decode_cache=_DECODE_CACHE if use_decode_cache else None,
                    )
                except NotImplementedError:
                    out["status"][i] = STATUS_DECODE_ERROR
                    continue
                except ValueError as exc:
                    out["status"][i] = (
                        STATUS_BOMB if "resolution bomb" in str(exc) else STATUS_DECODE_ERROR
                    )
                    continue
                suffix = meta.pop("transcript_suffix", "")
                if suffix:
                    out["transcript"][i] = transcripts[i] + suffix
                if meta.pop("_strip_transcript", False):
                    # strip_metadata: null the transcript carry-through
                    out["transcript"][i] = ""
                out["bytes"][i] = payload
                out["sr_hz"][i] = meta["sr_hz"]
                out["dur_ms"][i] = meta["dur_ms"]
                out["n_samples"][i] = meta["n_samples"]
                out["codec"][i] = meta["codec"]
                out["status"][i] = STATUS_META if p.meta else STATUS_OK
                if p.meta:
                    out["meta"][i] = audio_apply.meta_json(meta)
                elif "disposition" in meta:
                    # attachment(): the Content-Disposition analogue rides
                    # the meta column even for payload renders (the
                    # reference sets the header on every response,
                    # imagor.go:312-338,927-946)
                    out["meta"][i] = audio_apply.meta_json(
                        {"disposition": meta["disposition"]}
                    )
            yield pd.DataFrame(out)

    return fn


def transform(
    df,
    secret: str | None = None,
    assets: dict[str, tuple[np.ndarray, int]] | None = None,
    broadcast_assets: bool = True,
    now_ms: int | None = None,
    allow_unsafe: bool | None = None,
):
    """Apply the full ops pipeline to a clips DataFrame → result DataFrame.

    ≅ ``ServeBlob`` (imagor.go:252-272): the library-embed entry point; the
    streaming pipeline reuses exactly this stage per micro-batch.

    ``secret=None`` runs unsafe-only mode (signed rows are quarantined);
    pass the signing secret to accept signed ops paths. With a secret
    configured, ``unsafe/`` paths are quarantined unless
    ``allow_unsafe=True`` (reference default posture, imagor.go:290-302).
    """
    spark = df.sparkSession
    b_assets = None
    if assets:
        b_assets = spark.sparkContext.broadcast(assets) if broadcast_assets else assets
    fn = make_transform_fn(secret, b_assets, now_ms=now_ms, allow_unsafe=allow_unsafe)
    return df.mapInPandas(fn, schema=OUTPUT_SCHEMA)


def with_result_key(df, ops_col: str = "ops", out_col: str = "result_key"):
    """Attach the result-cache key (parse → canonical → hex digest) WITHOUT
    decoding payloads — the cheap projection that makes cache-hit-before-
    render possible (≅ the key the reference derives before ``loadResult``,
    imagor.go:403-408). Memoized per distinct ops string within a batch."""

    @F.pandas_udf("string")
    def rk(ops: pd.Series) -> pd.Series:
        memo: dict[str, str] = {}

        def one(o: str) -> str:
            hit = memo.get(o)
            if hit is None:
                # result_path (not generate_path): utility filters are
                # excluded from the key, matching _OpsCache/_canonicalize
                hit = memo[o] = hex_digest_path(result_path(parse(o)))
            return hit

        return ops.map(one)

    return df.withColumn(out_col, rk(F.col(ops_col)))


def make_key_validity_udf(
    secret: str | None,
    alg: str = "sha1",
    truncate: int = 0,
    allow_unsafe: bool | None = None,
    now_ms: int | None = None,
):
    """pandas UDF ``ops → struct<rk, ok>``: the result-cache key PLUS the
    cheap signature/expiry verdict (the same ``_OpsCache`` logic the
    transform applies), computed WITHOUT touching payloads. Lets the
    within-batch singleflight prefer a row that will actually render as
    its winner — the reference validates (ErrExpired/signature,
    imagor.go:290-338) BEFORE the suppress/singleflight at imagor.go:842,
    so a rejected request can never suppress a valid one; keying on the
    utility-stripped path alone allowed exactly that (r5 ADVICE #1)."""
    signer = HMACSigner(alg, truncate, secret) if secret is not None else None
    if allow_unsafe is None:
        allow_unsafe = signer is None
    fixed_now = now_ms

    @F.pandas_udf("rk string, ok boolean")
    def kv(ops: pd.Series) -> pd.DataFrame:
        now = fixed_now if fixed_now is not None else int(time.time() * 1000)
        cache = _OpsCache(signer, now, allow_unsafe)
        rks, oks = [], []
        for o in ops:
            _p, _canonical, rk, reject = cache.get(o)
            rks.append(rk)
            oks.append(not reject)
        return pd.DataFrame({"rk": rks, "ok": oks})

    return kv


def _anti_join_rendered(keyed, rendered_keys_df, broadcast_index: bool = True,
                        key_col: str = "__rk"):
    """Anti-join a pre-keyed frame against the committed index (shared by
    :func:`skip_rendered` and the per-batch sink, which computes the key
    projection ONCE for both the anti-join and within-batch singleflight)."""
    rendered = rendered_keys_df.select(F.col("result_key").alias(key_col))
    if broadcast_index:
        rendered = F.broadcast(rendered)
    return keyed.join(rendered, key_col, "left_anti")


def skip_rendered(df, rendered_keys_df, ops_col: str = "ops",
                  broadcast_index: bool = True):
    """Result-cache load (imagor.go:403-408, loadResult imagor.go:600-664):
    left-anti join incoming clips against the committed rendered-keys index,
    so already-rendered work is skipped BEFORE the transform ever decodes a
    payload. Works on batch and streaming DataFrames (stream-static left
    anti is supported).

    ``broadcast_index`` (default): the index is the TTL-bounded compacted
    rendered-keys table — small relative to the stream — so it ships as a
    broadcast build side and the anti-join is a map-side probe: the payload
    column NEVER crosses an exchange (without the hint, Spark may plan a
    sort-merge anti that hash-shuffles the full payload rows by key —
    plan-asserted in tests). Set False only for an index too large to
    broadcast; then both sides shuffle by key and payloads ride the
    exchange — at that point shard the index by TTL first."""
    keyed = with_result_key(df, ops_col=ops_col, out_col="__rk")
    return _anti_join_rendered(keyed, rendered_keys_df, broadcast_index).drop("__rk")


def singleflight_within(df, key_col: str = "__rk", id_col: str = "clip_id",
                        ok_col: str | None = None):
    """WITHIN-batch singleflight (imagor.go:842-884): concurrent identical
    requests — rows in the SAME micro-batch whose ops+image resolve to one
    result_key — coalesce to a single render. The min-``id_col`` row wins;
    a dropped row's result IS the winner's committed row (identical bytes
    under the same key), exactly as if it had arrived one batch later and
    hit the rendered-keys anti-join.

    Scale shape — the payload never shuffles: the duplicate-winner
    dimension is aggregated over a 2-column (key, id) projection (only
    those pairs cross the exchange; column pruning keeps payload bytes out
    of that subtree's scan) and contains ONLY keys that actually repeat
    within the batch — tiny under any realistic duplicate rate — so it
    broadcasts, and the wide side is filtered in place by a
    BroadcastHashJoin. A plain ``dropDuplicates([key])`` would instead
    hash-shuffle every payload row per batch.

    ``ok_col``: optional boolean column marking rows that pass the cheap
    pre-render validation (signature/expiry — ``make_key_validity_udf``).
    When given, the winner is the min-``id_col`` row AMONG VALID rows,
    falling back to the overall min only when the whole group is invalid
    (everything quarantines anyway) — so a tampered/expired duplicate can
    never suppress a valid same-key request (r5 ADVICE #1; reference
    validates before singleflight, imagor.go:290-338 vs :842)."""
    agg = [F.count("*").alias("__n"), F.min(id_col).alias("__w_any")]
    if ok_col is not None:
        agg.append(
            F.min(F.when(F.col(ok_col), F.col(id_col))).alias("__w_ok")
        )
        winner = F.coalesce(F.col("__w_ok"), F.col("__w_any"))
    else:
        winner = F.col("__w_any")
    dups = (
        df.select(key_col, id_col, *([ok_col] if ok_col is not None else []))
        .groupBy(key_col)
        .agg(*agg)
        .filter(F.col("__n") > 1)
        .select(key_col, winner.alias("__winner"))
    )
    return (
        df.join(F.broadcast(dups), key_col, "left_outer")
        .filter(F.col("__winner").isNull() | (F.col(id_col) == F.col("__winner")))
        .drop("__winner")
    )


def split_quarantine(result_df):
    """Side-output split (≅ 4xx error paths → quarantine storage)."""
    ok = result_df.filter(result_df.status.isin(STATUS_OK, STATUS_META))
    rejected = result_df.filter(~result_df.status.isin(STATUS_OK, STATUS_META))
    return ok, rejected
