"""Deduplication operators — exact, MinHash-LSH, SimHash, n-gram Jaccard.

The reference's dedup plane is key-level (result-cache + singleflight); a
training-data pipeline also needs CONTENT-level near-dup detection. All
Spark-first:

* exact     — hash-groupBy on a normalized fingerprint (one shuffle).
* minhash   — per-doc signatures from shingle minima (explode → groupBy),
              banded LSH: docs sharing a band bucket are candidates; a
              self-join on (band, bucket) finds pairs WITHOUT the O(n²)
              cross join. Hashes are md5-based so DuckDB oracles can
              reproduce them bit-for-bit.
* simhash   — 64-bit hyperplane-free simhash from token md5s (bit-vote),
              via explode + bit arithmetic in columns.
* jaccard   — exact n-gram Jaccard for candidate pairs (verification stage
              after LSH bucketing).

Scale notes: signatures (minhash AND simhash) are computed PER ROW with
higher-order array functions (``transform``/``aggregate``/``array_min``) —
zero row amplification, zero shuffle before the LSH band join. The exploded
shingle path (:func:`shingles`) is kept for the exact-Jaccard verification
join and as the cross-checked twin of the fused signatures. The LSH join is
an equi-join on (band, bucket) which AQE can handle skew on. No cross joins
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..engine.session import SessionFrameCache
from .text import doc_fingerprint

# bounded registry for per-call shingle persists (see jaccard_pairs_pruned)
_PRUNED_SHINGLE_REGISTRY = SessionFrameCache(max_per_app=4)


def exact_dups(df: DataFrame, col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) docs: fingerprint → ids."""
    return (
        df.select("doc_id", doc_fingerprint(col, n_chars=1_000_000))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def shingles(df: DataFrame, col: str = "text", k: int = 3) -> DataFrame:
    """k-word shingles via slide over the token array (no self-join).

    Uses a single split + transform(sequence) so the whole thing is one
    narrow projection; distinct() is the only shuffle."""
    toks = F.split(F.lower(F.regexp_replace(F.trim(F.col(col)), "\\s+", " ")), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)])
    )
    return (
        df.select("doc_id", F.explode(sh).alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )


def _norm_tokens(col: str):
    return F.split(F.lower(F.regexp_replace(F.trim(F.col(col)), "\\s+", " ")), " ")


def shingle_array(col: str = "text", k: int = 3):
    """Column expression: distinct k-word shingles of a doc as ONE array —
    no explode, no shuffle. Identical shingle set to :func:`shingles`
    (element_at past the end returns NULL; concat_ws skips NULLs, matching
    the short-doc behaviour)."""
    toks = _norm_tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)])
    )
    return F.array_distinct(F.filter(sh, lambda s: F.length(s) > 0))


def minhash_signatures_fused(
    df: DataFrame, col: str = "text", k: int = 3, n_hashes: int = 16
) -> DataFrame:
    """doc_id → [min(md5(shingle||'#i'))] computed PER ROW with higher-order
    array functions — zero explode, zero shuffle before the LSH band join.

    This is the 100 TB scale path: the explode+distinct+groupBy variant
    (:func:`shingles` → :func:`minhash_signatures`) shuffles ~|tokens| rows
    per doc before aggregating; here the signature is one narrow projection
    and values are bit-identical (min over the same distinct-shingle set).
    The exploded variant is kept as the cross-checked oracle twin."""
    # cheap equivalent of size(shingles) > 0: a doc yields ≥1 shingle iff it
    # has any non-whitespace. Filtering on the array itself would be pushed
    # below any upstream exchange by predicate pushdown and recompute the
    # whole shingle expression on the (possibly single-task) scan stage.
    base = df.filter(F.length(F.trim(F.col(col))) > 0).select(
        "doc_id", shingle_array(col, k).alias("__shingles")
    )
    mins = [
        F.array_min(
            F.transform(
                F.col("__shingles"),
                (lambda i: lambda s: F.md5(F.concat(s, F.lit(f"#{i}"))))(i),
            )
        ).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return base.select("doc_id", *mins)


def minhash_signatures(
    sh: DataFrame, n_hashes: int = 16
) -> DataFrame:
    """doc_id → [min(md5(shingle||seed)) for seed in 0..n) ] — md5-based so
    any SQL engine reproduces it exactly. One groupBy (map-side partials)."""
    mins = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def lsh_candidate_pairs(
    sig: DataFrame, n_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signature, bucket-join: pairs sharing ≥1 band bucket.
    rows_per_band = n_hashes // bands. Equi-join on (band, bucket) — the
    scale path (no cross join)."""
    rpb = n_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"h{b * rpb + j}") for j in range(rpb)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat(*cols)).alias("bucket"))
        )
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    # merge hint: a broadcast self-join would compute the signature lineage
    # twice (broadcast build + streamed probe); sort-merge shuffles BOTH
    # sides on (band, bucket) with identical child plans, so Spark plans one
    # ReusedExchange and the signatures are computed exactly once — also the
    # only viable plan at 100 TB, where neither side is broadcastable
    a = banded.hint("merge").alias("a")
    b = banded.hint("merge").alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs_pruned(
    docs: DataFrame, pairs: DataFrame, col: str = "text", k: int = 3
) -> DataFrame:
    """Candidate-pruned exact-Jaccard verification — the 100 TB shape:
    shingles are EXPLODED ONLY for docs that appear in a candidate pair
    (left-semi prune BEFORE the explode; LSH keeps candidates ≪ corpus),
    instead of materializing the full corpus shingle table the verification
    join will mostly discard. Values identical to the unpruned path."""
    cand = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    pruned = docs.join(cand, "doc_id", "left_semi")
    # persist the PRUNED shingle table: the verification consumes it three
    # times (A side, B side, sizes) and would otherwise re-pay the
    # semi-join + explode per branch. Safe at 100 TB because candidates
    # ≪ corpus by LSH construction — this is never the full shingle table.
    # Tracked in a bounded session registry so repeated calls in a
    # long-lived driver unpersist older shingle tables instead of
    # accumulating cache blocks forever (evicted plans recompute lazily).
    sh = shingles(pruned, col, k).persist()
    _PRUNED_SHINGLE_REGISTRY.register(docs.sparkSession, "pruned_shingles", sh)
    return jaccard_pairs(sh, pairs)


def jaccard_pairs_arrays(
    docs: DataFrame, pairs: DataFrame, col: str = "text", k: int = 3
) -> DataFrame:
    """Exact Jaccard for candidate pairs WITHOUT exploding shingles — the
    r6 verification shape: per candidate doc, the distinct-shingle set is
    ONE array column (:func:`shingle_array`, narrow); each pair joins its
    two arrays and computes |A∩B| / sizes with ``array_intersect`` —
    replacing the explode → 3-way shingle equi-join → 3 joins-on-sizes
    pipeline (12 jobs / 30 stages / a persisted shingle table at sf0.1)
    with 2 broadcast joins and zero explode. Values are identical:
    ``shingle_array`` yields exactly the distinct shingle set the exploded
    path grouped on, ``array_intersect`` counts the same intersection, and
    pairs with an empty intersection are dropped as the inner inter-join
    dropped them. Scale shape: candidates ≪ corpus by LSH construction, so
    the (tiny) pair list broadcasts; the semi-pruned array table streams
    once per side — same bytes the exploded path shuffled, far fewer rows
    and stages."""
    spark = docs.sparkSession
    # the candidate-pair lineage (banded LSH self-join + distinct) feeds
    # this function through FIVE references (cand union ×2, the broadcast,
    # and once per arr side) — persist the tiny pair list so the band join
    # runs once, and likewise the candidate-pruned array table which both
    # join sides stream (bounded session registry, same discipline as the
    # r5 pruned-shingle persist this replaces)
    pairs = pairs.persist()
    _PRUNED_SHINGLE_REGISTRY.register(spark, "jaccard_pairs", pairs)
    cand = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    arr = docs.join(cand, "doc_id", "left_semi").select(
        "doc_id", shingle_array(col, k).alias("__sh")
    ).persist()
    _PRUNED_SHINGLE_REGISTRY.register(spark, "jaccard_arrays", arr)
    a = arr.select(F.col("doc_id").alias("doc_a"), F.col("__sh").alias("__sa"))
    b = arr.select(F.col("doc_id").alias("doc_b"), F.col("__sh").alias("__sb"))
    # stream the array table through two broadcast joins: pairs is tiny by
    # LSH construction, and j1 (one row per pair + the a-side array) stays
    # candidate-sized, so the pair plane never hash-shuffles
    j1 = a.join(F.broadcast(pairs), "doc_a")
    j = b.join(F.broadcast(j1), "doc_b")
    n_inter = F.size(F.array_intersect("__sa", "__sb"))
    out = j.select(
        "doc_a",
        "doc_b",
        n_inter.alias("n_inter"),
        F.size("__sa").alias("size_a"),
        F.size("__sb").alias("size_b"),
    ).filter(F.col("n_inter") > 0)
    return out.withColumn(
        "jaccard",
        F.round(
            F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
            6,
        ),
    ).select("doc_a", "doc_b", "n_inter", "size_a", "size_b", "jaccard")


def jaccard_pairs(
    sh: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B| via a
    shingle equi-join (verification stage after LSH)."""
    sa = sh.withColumnRenamed("doc_id", "doc_a")
    sb = sh.withColumnRenamed("doc_id", "doc_b")
    sizes = sh.groupBy("doc_id").count()
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("count", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("count", "size_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ),
        )
    )
    return out.select("doc_a", "doc_b", "n_inter", "size_a", "size_b", "jaccard")


def simhash(df: DataFrame, col: str = "text", bits: int = 32) -> DataFrame:
    """Per-doc SimHash: each distinct token votes its md5 bits; the sign of
    the vote sum per bit position forms the hash.

    Computed PER ROW with higher-order array functions (the round-1 variant
    exploded ``bits`` rows per token — |tokens|×32 rows shuffled through two
    groupBys; this is one narrow projection, zero shuffle). Bit extraction
    avoids column-valued shift counts via ``floor(h / 2^b) % 2`` — exact in
    doubles for h < 2^32 and b ≤ 31. bits ≤ 32 keeps conv() exact."""
    toks = F.array_distinct(F.filter(_norm_tokens(col), lambda t: F.length(t) > 0))
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    # cheap pushdown-safe emptiness predicate (see minhash_signatures_fused)
    base = df.filter(F.length(F.trim(F.col(col))) > 0).select(
        "doc_id", hashes.alias("__hs")
    )
    bit_seq = F.sequence(F.lit(0), F.lit(bits - 1))
    votes = F.transform(
        bit_seq,
        lambda b: F.aggregate(
            F.col("__hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                F.pmod(
                    F.floor(h / F.pow(F.lit(2.0), b.cast("double"))).cast("long"),
                    F.lit(2),
                )
                == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        ),
    )
    sim = F.aggregate(
        F.zip_with(
            votes,
            bit_seq,
            lambda v, b: F.when(
                v > 0, F.pow(F.lit(2.0), b.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return base.select("doc_id", sim.alias("simhash"))
