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

Scale notes: shingling explodes ~|tokens| rows per doc — at 100 TB this is
the dominant shuffle, so signatures aggregate map-side (groupBy(doc) min()
is partial-aggregated by Catalyst), and the LSH join is an equi-join on
(band, bucket) which AQE can handle skew on. No cross joins anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import doc_fingerprint


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
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


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
    the vote sum per bit position forms the hash. Pure column/array ops.

    Uses conv(substr(md5,...)) to get a bits-wide integer per token, then
    explodes bit positions. bits ≤ 32 keeps conv() exact (< 2^63)."""
    toks = F.split(F.lower(F.regexp_replace(F.trim(F.col(col)), "\\s+", " ")), " ")
    t = df.select("doc_id", F.explode(F.array_distinct(toks)).alias("tok"))
    t = t.filter(F.length("tok") > 0).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    )
    pos = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "h",
    ).withColumn(
        # column-valued shift counts need the SQL form (the Python
        # F.shiftright wrapper only takes a literal numBits)
        "vote",
        F.when(F.expr("(shiftright(h, bit) & 1)") == 1, 1).otherwise(-1),
    )
    votes = pos.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0)
        ).alias("simhash")
    )
