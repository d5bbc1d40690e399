"""Streaming e2e tests (SURVEY §5 adaptation item c/d): same input stream +
watermark ⇒ identical committed output under exactly-once, including
kill-and-resume from checkpoint and duplicate-clip suppression."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from imagor_spark.sources.clips import (
    CLIPS_SCHEMA,
    SECRET,
    generate_clips_df,
    make_pdf,
    make_row,
)
from imagor_spark.streaming.pipeline import build_stream, configure_streaming, run_pipeline
from imagor_spark.streaming.sink import IdempotentSink
from imagor_spark.streaming.windows import batch_sessionize, session_agg, tumbling_agg


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["in"])
    return d


def write_batch(spark, path, start, count, seed=42):
    pdf = make_pdf(seed, range(start, start + count), signed_mix=False)
    spark.createDataFrame(pdf, schema=CLIPS_SCHEMA).write.mode("append").parquet(path)


def write_pdf(spark, path, pdf):
    spark.createDataFrame(pdf, schema=CLIPS_SCHEMA).write.mode("append").parquet(path)


def test_streaming_end_to_end(spark, dirs):
    write_batch(spark, dirs["in"], 0, 60)
    q, sink = run_pipeline(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], secret=SECRET, allow_unsafe=True, wait=True
    )
    out = sink.read_committed(spark)
    assert out.filter(out.status == "ok").count() > 0
    # committed rows match a batch-mode run of the same input (same semantics)
    n_stream = out.count()
    from imagor_spark.engine.transform import transform

    batch_out = transform(spark.read.parquet(dirs["in"]).dropDuplicates(["clip_id"]),
                          secret=SECRET, allow_unsafe=True)
    assert n_stream == batch_out.count()
    # lineage + metrics written per batch
    lineage = sink.read_lineage(spark)
    assert lineage.filter(lineage.n_rows > 0).count() > 0
    metrics = sink.read_metrics(spark)
    assert metrics.agg(F.sum("n")).first()[0] == n_stream


def test_duplicate_clip_renders_once(spark, dirs):
    """Single-render-per-key (≅ singleflight imagor.go:842-884): duplicate
    clip_ids within the watermark render exactly once."""
    pdf = make_pdf(42, range(0, 30), signed_mix=False)
    dup = pdf.iloc[:10].copy()  # exact duplicates of first 10
    write_pdf(spark, dirs["in"], pdf)
    write_pdf(spark, dirs["in"], dup)
    q, sink = run_pipeline(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], secret=SECRET, allow_unsafe=True, wait=True
    )
    out = sink.read_committed(spark)
    counts = out.groupBy("clip_id").count().filter("count > 1").count()
    assert counts == 0
    assert out.count() == pdf["clip_id"].nunique()


def test_checkpoint_resume_exactly_once(spark, dirs):
    """Kill → append more input (incl. re-sends of old clips) → restart from
    checkpoint: committed output still has one row per clip_id."""
    write_batch(spark, dirs["in"], 0, 40)
    q, sink = run_pipeline(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], secret=SECRET, allow_unsafe=True, wait=True
    )
    n1 = sink.read_committed(spark).count()
    # second wave: 20 new clips + re-send of 10 old ones
    write_batch(spark, dirs["in"], 40, 20)
    pdf_old = make_pdf(42, range(0, 10), signed_mix=False)
    write_pdf(spark, dirs["in"], pdf_old)
    q2, sink2 = run_pipeline(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], secret=SECRET, allow_unsafe=True, wait=True
    )
    out = sink2.read_committed(spark)
    dupes = out.groupBy("clip_id").count().filter("count > 1").count()
    assert dupes == 0
    assert out.count() >= n1 + 15  # new clips landed (some ids may collide by design)


def test_sink_replay_is_idempotent(spark, dirs):
    """Re-invoking the sink with the same batch_id must not duplicate."""
    df = generate_clips_df(spark, 20, signed_mix=False)
    from imagor_spark.engine.transform import transform

    res = transform(df, secret=SECRET, allow_unsafe=True).cache()
    sink = IdempotentSink(dirs["out"])
    sink(res, 7)
    first = sink.read_committed(spark).count()
    sink(res, 7)  # replay
    assert sink.read_committed(spark).count() == first
    assert sink.committed_batches() == [7]


def test_late_data_dropped_beyond_watermark(spark, dirs):
    """Rows older than the watermark at dedup time are dropped from the
    dedup buffer; with a tight watermark, very-late re-sends of an already
    rendered clip are not re-emitted in the same run."""
    import pandas as pd

    pdf = make_pdf(42, range(0, 20), signed_mix=False)
    late = pdf.iloc[:5].copy()
    late["ingest_ts"] = late["ingest_ts"] - pd.Timedelta(hours=2)
    write_pdf(spark, dirs["in"], pdf)
    write_pdf(spark, dirs["in"], late)
    q, sink = run_pipeline(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], secret=SECRET,
        allow_unsafe=True, watermark="1 minute", wait=True,
    )
    out = sink.read_committed(spark)
    assert out.groupBy("clip_id").count().filter("count > 1").count() == 0


def test_tumbling_and_session_windows_streaming(spark, dirs):
    """Windowed aggregates run as a streaming query and produce finite
    per-(window, codec, sr_bucket) rollups."""
    write_batch(spark, dirs["in"], 0, 80)
    configure_streaming(spark)
    result = build_stream(spark, dirs["in"], secret=SECRET, allow_unsafe=True, watermark="5 minutes", for_aggregation=True)
    agg = tumbling_agg(result, window="1 minute")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("tumble_out")
        .option("checkpointLocation", dirs["ckpt"] + "-w")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM tumble_out").collect()
    # append mode only emits closed windows; late tail may hold some open —
    # presence + shape is the assertion
    assert all(r["n_clips"] >= 1 for r in rows)

    # sliding windows: 2-min windows sliding 1 min — every clip must land
    # in exactly two windows, so total n_clips across windows = 2× rows seen
    from imagor_spark.streaming.windows import sliding_agg

    slid = sliding_agg(
        build_stream(spark, dirs["in"], secret=SECRET, allow_unsafe=True,
                     watermark="5 minutes", for_aggregation=True)
    )
    q_s = (
        slid.writeStream.outputMode("complete")
        .format("memory")
        .queryName("slide_out")
        .option("checkpointLocation", dirs["ckpt"] + "-sl")
        .trigger(availableNow=True)
        .start()
    )
    q_s.awaitTermination()
    total = spark.sql("SELECT SUM(n_clips) s FROM slide_out").first()["s"]
    n_in = spark.read.parquet(dirs["in"]).dropDuplicates(["clip_id"]).count()
    assert total == 2 * n_in

    sess = session_agg(build_stream(spark, dirs["in"], secret=SECRET, allow_unsafe=True, watermark="5 minutes", for_aggregation=True))
    q2 = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", dirs["ckpt"] + "-s")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    srows = spark.sql("SELECT * FROM sess_out").collect()
    assert all(r["n_clips"] >= 1 for r in srows)


def test_salted_agg_matches_unsalted(spark):
    """Salted two-phase agg folds to identical counts/sums."""
    df = generate_clips_df(spark, 200, signed_mix=False)
    from imagor_spark.engine.transform import transform

    res = transform(df, secret=SECRET, allow_unsafe=True).cache()
    plain = tumbling_agg(res, salted=False).select(
        "win", "codec", "sr_bucket", "n_clips", "out_bytes"
    )
    salted = tumbling_agg(res, salted=True).select(
        "win", "codec", "sr_bucket", "n_clips", "out_bytes"
    )
    a = {tuple(map(str, r[:3])): (r[3], r[4]) for r in plain.collect()}
    b = {tuple(map(str, r[:3])): (r[3], r[4]) for r in salted.collect()}
    assert a == b


def test_batch_sessionize(spark):
    df = generate_clips_df(spark, 100, signed_mix=False)
    sess = batch_sessionize(df, gap_seconds=30)
    total = sess.agg(F.sum("n_rows")).first()[0]
    assert total == 100


def test_result_cache_skips_already_rendered(spark, dirs):
    """Result-cache load (imagor.go:403-408/600-664): a second run with a
    FRESH checkpoint and a fresh sink, anti-joined against the first run's
    committed rendered-keys index, must render 0 rows; newly-appended clips
    must still render."""
    write_batch(spark, dirs["in"], 0, 30)
    q, sink = run_pipeline(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], secret=SECRET,
        allow_unsafe=True, wait=True,
    )
    n1 = sink.read_committed(spark).count()
    assert n1 > 0
    assert sink.read_rendered_keys(spark).count() > 0
    # second run: fresh checkpoint + fresh out dir, cache from run 1
    out2, ck2 = dirs["out"] + "_2", dirs["ckpt"] + "_2"
    q2, sink2 = run_pipeline(
        spark, dirs["in"], out2, ck2, secret=SECRET, allow_unsafe=True,
        wait=True, result_cache_dir=dirs["out"],
    )
    try:
        n2 = sink2.read_committed(spark).count()
    except FileNotFoundError:
        n2 = 0
    assert n2 == 0, f"cache miss: re-rendered {n2} rows"
    # backfill: 10 new clips appended → only those render
    write_batch(spark, dirs["in"], 1000, 10)
    out3, ck3 = dirs["out"] + "_3", dirs["ckpt"] + "_3"
    q3, sink3 = run_pipeline(
        spark, dirs["in"], out3, ck3, secret=SECRET, allow_unsafe=True,
        wait=True, result_cache_dir=dirs["out"],
    )
    out3_rows = sink3.read_committed(spark)
    assert out3_rows.count() == 10
    assert out3_rows.filter(~out3_rows.clip_id.rlike("^clip0000(10[0-9])")).count() == 0


def test_live_stream_sees_midstream_commits(spark, dirs):
    """ONE continuous stream, two triggers (maxFilesPerTrigger=1): clips in
    trigger 2 that duplicate trigger 1's result keys (different clip_ids,
    same ops → same canonical path → same key) must render 0 times WITHOUT
    a restart — the rendered-keys index is re-read per micro-batch
    (imagor.go:403-408 probes result storage per request)."""
    import pandas as pd

    def ops_clips(prefix, n):
        rows = []
        for i in range(n):
            base = make_row(42, i, "unsafe")
            base["clip_id"] = f"{prefix}{i:04d}"
            base["ops"] = f"unsafe/fit-in/{8000 + i}x0/shared{i}"
            rows.append(base)
        return pd.DataFrame(rows)

    # two single-file parquet waves → two micro-batches; wave B duplicates
    # wave A's result keys
    for wave in (ops_clips("orig", 10), ops_clips("dupe", 10)):
        spark.createDataFrame(wave, schema=CLIPS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["in"])
    q, sink = run_pipeline(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], secret=SECRET,
        allow_unsafe=True, wait=True, result_cache_dir=dirs["out"],
        max_files_per_trigger=1,
    )
    assert len(sink.committed_batches()) == 2  # genuinely two triggers
    out = sink.read_committed(spark)
    # 20 distinct clip_ids in, but only the 10 distinct result keys render:
    # the second trigger's duplicates were anti-joined out mid-stream
    assert out.count() == 10
    assert out.select("result_key").distinct().count() == 10


def test_within_batch_singleflight(spark, dirs):
    """Singleflight INSIDE one micro-batch (imagor.go:842-884): rows in the
    SAME trigger with distinct clip_ids but identical ops+image (⇒ identical
    result_key) must render ONCE — the r4 anti-join only saw keys committed
    by PRIOR batches. The min clip_id wins deterministically; distinct-key
    rows pass through untouched."""
    import pandas as pd

    rows = []
    for i in range(6):
        base = make_row(42, i, "unsafe")
        base["clip_id"] = f"uniq{i:04d}"
        base["ops"] = f"unsafe/fit-in/{8000 + i}x0/solo{i}"
        rows.append(base)
    for j, cid in enumerate(["zebra001", "alpha001", "mid00001"]):
        dup = make_row(42, 10 + j, "unsafe")
        dup["clip_id"] = cid
        dup["ops"] = "unsafe/fit-in/16000x0/sharedclip"  # one shared key
        rows.append(dup)
    spark.createDataFrame(pd.DataFrame(rows), schema=CLIPS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(dirs["in"])
    # NO result_cache_dir: the cross-batch anti-join is OFF, so a dedup here
    # can only come from the within-batch singleflight (the single input
    # file keeps all nine rows in one trigger)
    q, sink = run_pipeline(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], secret=SECRET,
        allow_unsafe=True, wait=True,
    )
    out = sink.read_committed(spark)
    assert out.count() == 7  # 6 solo + 1 winner for the shared key
    shared = out.filter(out.ops.contains("sharedclip")).collect()
    assert len(shared) == 1
    assert shared[0]["clip_id"] == "alpha001"  # min clip_id wins
    assert out.select("result_key").distinct().count() == 7


def test_singleflight_rejected_row_cannot_suppress_valid_row(spark, dirs):
    """r5 ADVICE #1: winner selection runs the cheap signature/expiry check
    first — a tampered-signature duplicate with the lowest clip_id must NOT
    win the within-batch singleflight and quarantine away a valid signed
    request for the same result_key (the reference validates before the
    suppress, imagor.go:290-338 vs :842). The result_key strips/ignores
    the signature, so both rows share one key."""
    import pandas as pd

    from imagor_spark.imagorpath.signer import HMACSigner

    signer = HMACSigner("sha1", 0, SECRET)
    path = "fit-in/16000x0/sharedsig"
    good_sig = signer.sign(path)
    bad_sig = ("X" if good_sig[0] != "X" else "Y") + good_sig[1:]
    rows = []
    for cid, sig in (("aaaa0001", bad_sig), ("zzzz0001", good_sig)):
        r = make_row(42, 3, "unsafe")
        r["clip_id"] = cid
        r["ops"] = f"{sig}/{path}"
        rows.append(r)
    spark.createDataFrame(pd.DataFrame(rows), schema=CLIPS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(dirs["in"])
    q, sink = run_pipeline(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], secret=SECRET,
        allow_unsafe=False, wait=True,
    )
    out = sink.read_committed(spark).collect()
    # the VALID row must be the surviving render; the tampered duplicate is
    # suppressed (its result is the winner's committed row, not a 4xx)
    assert len(out) == 1
    assert out[0]["clip_id"] == "zzzz0001"
    assert out[0]["status"] == "ok"


def test_admission_quarantines_before_decode(spark, dirs):
    """Admission plane wired into run_pipeline (≅ CheckResolution
    processor.go:506-516 + resolution chain imagor.go:699-760): an
    over-limit clip and an unknown-codec clip are quarantined BEFORE decode
    — the bomb row carries a garbage payload that would raise decode_error
    if the decoder ever touched it."""
    import pandas as pd

    pdf = make_pdf(42, range(0, 10), signed_mix=False)
    bomb = pdf.iloc[[0]].copy()
    bomb["clip_id"] = "bomb0001"
    bomb["ops"] = "unsafe/fit-in/12345x0/bomb0001"
    bomb["dur_ms"] = 7_200_000  # > every configured max_dur_ms
    bomb["bytes"] = [b"RIFFgarbage-not-decodable" * 3]
    unknown = pdf.iloc[[1]].copy()
    unknown["clip_id"] = "noloader1"
    unknown["codec"] = "opus"  # no config row → not_found
    # distinct ops path: an identical path would (correctly) coalesce with
    # row 1 under the within-batch singleflight before admission ran
    unknown["ops"] = "unsafe/fit-in/9000x0/noloader1"
    write_pdf(spark, dirs["in"], pd.concat([pdf, bomb, unknown]))
    q, sink = run_pipeline(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], secret=SECRET,
        allow_unsafe=True, wait=True,
    )
    out = sink.read_committed(spark)
    by_id = {r["clip_id"]: r for r in out.collect()}
    assert by_id["bomb0001"]["status"] == "resolution_bomb"  # NOT decode_error
    assert by_id["bomb0001"]["bytes"] in (None, b"")
    assert by_id["noloader1"]["status"] == "not_found"
    assert out.filter(out.status == "ok").count() == 10
    # quarantined rows are NOT in the rendered-keys index (re-submission
    # after a config fix must render, not cache-hit)
    keys = {r["result_key"] for r in sink.read_rendered_keys(spark).collect()}
    assert by_id["bomb0001"]["result_key"] not in keys


def test_stateful_running_totals_resume(spark, dirs):
    """applyInPandasWithState custom stateful operator: per-codec running
    totals accumulate across micro-batches AND across a checkpoint restart
    (state store persistence) — semantics no built-in window expresses."""
    from imagor_spark.engine.transform import make_transform_fn, OUTPUT_SCHEMA
    from imagor_spark.sources.clips import CLIPS_SCHEMA as _CS
    from imagor_spark.streaming.stateful import running_codec_totals

    configure_streaming(spark)
    write_batch(spark, dirs["in"], 0, 30)
    fn = make_transform_fn(SECRET, allow_unsafe=True)

    def run_wave(qname):
        stream = spark.readStream.schema(_CS).parquet(dirs["in"])
        res = stream.mapInPandas(fn, schema=OUTPUT_SCHEMA)
        tot = running_codec_totals(res)
        latest = {}

        def collect(batch_df, _bid):
            for r in batch_df.collect():
                latest[r["codec"]] = (r["n_clips"], r["out_bytes"])

        # foreachBatch (not memory sink): memory sinks cannot recover from
        # an existing checkpoint, and restart-from-checkpoint is the point
        q = (
            tot.writeStream.outputMode("update").foreachBatch(collect)
            .option("checkpointLocation", dirs["ckpt"] + "_state")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return latest

    first = run_wave("totals_w1")
    assert sum(n for n, _ in first.values()) == 30
    # second wave: 20 more clips; restart from the same checkpoint →
    # totals must include wave 1 (state restored), not restart from zero.
    # update mode re-emits only codecs touched by wave 2; untouched codecs
    # keep their wave-1 totals.
    write_batch(spark, dirs["in"], 100, 20)
    second = run_wave("totals_w2")
    merged = dict(first)
    merged.update(second)
    assert sum(n for n, _ in merged.values()) == 50
    for codec, (n2, b2) in second.items():
        n1, b1 = first.get(codec, (0, 0))
        assert n2 > n1 and b2 > b1  # accumulated, not restarted


def test_result_cache_ttl_expiry(spark, dirs):
    """Result-cache TTL (getTtl imagor.go:991-1003 + expiration-on-Get
    filestorage.go:64-76): expired batches drop out of the rendered-keys
    index (→ re-render) and out of committed reads."""
    import json as _json
    import os as _os

    write_batch(spark, dirs["in"], 0, 15)
    q, sink = run_pipeline(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], secret=SECRET,
        allow_unsafe=True, wait=True,
    )
    n_keys = sink.read_rendered_keys(spark).count()
    assert n_keys > 0
    # fresh: everything visible under a generous TTL
    assert sink.read_rendered_keys(spark, max_age_ms=10**9).count() == n_keys
    assert sink.read_committed(spark, max_age_ms=10**9).count() > 0
    # pretend time passed: a tiny TTL expires every batch
    committed_at = _json.load(open(_os.path.join(dirs["out"], "_commits", "0")))["committed_at_ms"]
    later = committed_at + 60_000
    assert sink.read_rendered_keys(spark, max_age_ms=1000, now_ms=later).count() == 0
    try:
        n_exp = sink.read_committed(spark, max_age_ms=1000, now_ms=later).count()
    except FileNotFoundError:
        n_exp = 0
    assert n_exp == 0


def test_rendered_keys_compaction(spark, dirs):
    """Index compaction (result-cache index maintenance): folding the
    per-batch rendered_keys dirs into one distinct parquet must preserve
    the key set (identical anti-join skip behavior), shrink the dir count,
    keep row-level TTL semantics, and keep folding post-compaction batches."""
    from imagor_spark.engine.transform import transform

    sink = IdempotentSink(dirs["out"], rendered_compact_every=0)  # manual
    # 4 index-disjoint mini-batches through the real sink path
    for i in range(4):
        pdf = make_pdf(42, range(i * 8, i * 8 + 8), False)
        clips = spark.createDataFrame(pdf, schema=CLIPS_SCHEMA)
        batch = transform(clips, secret=SECRET, allow_unsafe=True)
        sink(batch, i)
    keys_before = sorted(
        r["result_key"] for r in sink.read_rendered_keys(spark).collect()
    )
    assert len(keys_before) > 0
    assert sink._n_rendered_batch_dirs() == 4
    n = sink.compact_rendered_keys(spark)
    assert n == len(set(keys_before))
    # fewer input dirs: batch dirs folded away, one compact dir + manifest
    assert sink._n_rendered_batch_dirs() == 0
    assert sink._read_compact_manifest() is not None
    keys_after = sorted(
        r["result_key"] for r in sink.read_rendered_keys(spark).collect()
    )
    assert keys_after == sorted(set(keys_before))
    # row-level TTL survives compaction: everything fresh now, nothing later
    assert sink.read_rendered_keys(spark, max_age_ms=10**9).count() == n
    import time as _time

    later = int(_time.time() * 1000) + 60_000
    assert sink.read_rendered_keys(spark, max_age_ms=1000, now_ms=later).count() == 0
    # a post-compaction batch unions in via the batch-dir path...
    pdf = make_pdf(42, range(500, 505), False)
    clips = spark.createDataFrame(pdf, schema=CLIPS_SCHEMA)
    sink(transform(clips, secret=SECRET, allow_unsafe=True), 4)
    n_with_new = sink.read_rendered_keys(spark).count()
    assert n_with_new > n
    # ...and a second compaction folds it too (idempotent on re-run)
    assert sink.compact_rendered_keys(spark) == n_with_new
    assert sink.compact_rendered_keys(spark) == 0  # nothing new
    assert sink.read_rendered_keys(spark).count() == n_with_new


def test_rendered_keys_auto_compaction(spark, dirs):
    """The sink auto-compacts once rendered_compact_every batch dirs
    accumulate, and the anti-join skip behavior is unchanged afterwards."""
    from imagor_spark.engine.transform import skip_rendered, transform

    sink = IdempotentSink(dirs["out"], rendered_compact_every=2)
    all_clips = []
    for i in range(3):
        pdf = make_pdf(42, range(i * 6, i * 6 + 6), False)
        clips = spark.createDataFrame(pdf, schema=CLIPS_SCHEMA)
        all_clips.append(clips)
        sink(transform(clips, secret=SECRET, allow_unsafe=True), i)
    # 3 batches with every=2 → at least one auto-compaction fired
    assert sink._read_compact_manifest() is not None
    assert sink._n_rendered_batch_dirs() < 3
    # identical skip behavior: every already-rendered clip is anti-joined out
    union = all_clips[0]
    for c in all_clips[1:]:
        union = union.unionByName(c)
    left = skip_rendered(union, sink.read_rendered_keys(spark))
    assert left.count() == 0


def test_streaming_session_window_matches_batch_twin(spark):
    """The streaming session_window parity query agrees with a batch
    lag/cumsum sessionization of the same derived clip stream (same gap
    semantics: new session when diff >= gap)."""
    from pyspark.sql import Window

    from imagor_spark.plans.catalog import q_streaming_session_window
    from imagor_spark.sources.docs_clips import cached_clips

    sf = "/root/testdata/sf0.001"
    stream_out = q_streaming_session_window(spark, sf).collect()
    clips = cached_clips(spark, sf)
    w = Window.partitionBy("codec").orderBy("ingest_ts")
    ep = F.col("ingest_ts").cast("double")
    gap = F.when(ep - F.lag(ep).over(w) >= 10, 1).otherwise(0)
    twin = (
        clips.select("codec", "ingest_ts")
        .withColumn("sid", F.sum(gap).over(w))
        .groupBy("codec", "sid")
        .agg(F.min("ingest_ts").alias("session_start"), F.count("*").alias("n_clips"))
        .select("codec", "session_start", "n_clips")
        .collect()
    )
    assert sorted(map(tuple, stream_out)) == sorted(map(tuple, twin))
    assert len(stream_out) > 1  # non-degenerate: multiple sessions exist


def test_compaction_during_live_stream_with_same_dir_cache(spark, dirs):
    """The r3 ADVICE hazard: with result_cache_dir == out_dir (resume-with-
    cache) and aggressive auto-compaction, compaction rmtree's rendered-keys
    dirs WHILE the stream is running. The per-batch index re-read means
    every batch plans against the current manifest, so the stream must
    survive multiple mid-stream compactions and still skip all duplicates."""
    import pandas as pd

    def wave(prefix, lo, hi, shared_ops=True):
        rows = []
        for i in range(lo, hi):
            base = make_row(42, i, "unsafe")
            base["clip_id"] = f"{prefix}{i:04d}"
            if shared_ops:
                base["ops"] = f"unsafe/fit-in/{8000 + i}x0/shared{i}"
            rows.append(base)
        return pd.DataFrame(rows)

    # 6 single-file waves: 3 originals + 3 key-duplicates → 6 micro-batches
    for w in [wave("a", 0, 5), wave("b", 5, 10), wave("c", 10, 15),
              wave("da", 0, 5), wave("db", 5, 10), wave("dc", 10, 15)]:
        spark.createDataFrame(w, schema=CLIPS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(dirs["in"])
    from imagor_spark.streaming.pipeline import TransformingSink, build_raw_stream
    from imagor_spark.engine.transform import make_transform_fn
    from imagor_spark.engine.config import DEFAULT_CONFIG_ROWS

    sink = TransformingSink(
        dirs["out"],
        transform_fn=make_transform_fn(SECRET, allow_unsafe=True),
        result_cache=IdempotentSink(dirs["out"]),  # SAME dir, live
        admission_rows=DEFAULT_CONFIG_ROWS,
        rendered_compact_every=2,  # compact aggressively mid-stream
    )
    stream = build_raw_stream(spark, dirs["in"], max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", dirs["ckpt"])
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # raises if any batch died on FileNotFoundException
    assert len(sink.committed_batches()) == 6
    assert sink._read_compact_manifest() is not None  # compaction DID fire
    out = sink.read_committed(spark)
    assert out.count() == 15  # every duplicate wave rendered 0 rows
    assert out.select("result_key").distinct().count() == 15


def test_aggsink_exactly_once_fold_and_checkpoint_resume(spark, dirs):
    """AggSink (the parity queries' sink): (a) a replayed batch_id is a
    no-op (exactly-once), (b) read_latest folds the committed update log
    latest-batch-wins per group, (c) a second availableNow pass over the
    SAME checkpoint processes only new files and updates only changed
    groups — the resume shape complete-mode memory sinks cannot do."""
    import pandas as pd

    from imagor_spark.streaming.sink import AggSink

    sink = AggSink(dirs["out"])
    b0 = spark.createDataFrame(pd.DataFrame(
        {"k": ["a", "b"], "n_clips": [1, 2]}))
    sink(b0, 0)
    # replay of batch 0 with DIFFERENT data must be ignored
    sink(spark.createDataFrame(pd.DataFrame({"k": ["a"], "n_clips": [99]})), 0)
    got = {r["k"]: r["n_clips"] for r in sink.read_latest(spark, ["k"]).collect()}
    assert got == {"a": 1, "b": 2}
    # batch 1 updates 'b' and adds 'c' → latest-batch-wins fold
    sink(spark.createDataFrame(pd.DataFrame(
        {"k": ["b", "c"], "n_clips": [5, 7]})), 1)
    got = {r["k"]: r["n_clips"] for r in sink.read_latest(spark, ["k"]).collect()}
    assert got == {"a": 1, "b": 5, "c": 7}

    # real checkpointed stream: two availableNow passes, one checkpoint
    src = os.path.join(dirs["in"], "agg_src")
    ck = dirs["ckpt"]
    out2 = os.path.join(dirs["out"], "stream")
    spark.createDataFrame(pd.DataFrame(
        {"k": ["x", "x", "y"], "v": [1, 1, 1]})).write.mode("append").parquet(src)
    sink2 = AggSink(out2)

    def run_pass():
        agg = (spark.readStream.schema("k string, v long").parquet(src)
               .groupBy("k").agg(F.count("*").alias("n_clips")))
        q = (agg.writeStream.foreachBatch(sink2).outputMode("update")
             .option("checkpointLocation", ck).trigger(availableNow=True).start())
        q.awaitTermination()

    run_pass()
    got = {r["k"]: r["n_clips"] for r in sink2.read_latest(spark, ["k"]).collect()}
    assert got == {"x": 2, "y": 1}
    # append new rows; resume from the SAME checkpoint → only the delta is
    # processed, updated groups win the fold
    spark.createDataFrame(pd.DataFrame(
        {"k": ["x", "z"], "v": [1, 1]})).write.mode("append").parquet(src)
    run_pass()
    got = {r["k"]: r["n_clips"] for r in sink2.read_latest(spark, ["k"]).collect()}
    assert got == {"x": 3, "y": 1, "z": 1}
