"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the 100 TB story):

* exact / fingerprint dedup — one hash groupBy, map-side combinable.
* n-gram Jaccard — candidate pairs are generated ONLY for documents
  sharing a shingle (inverted-index self-join), never all-pairs.
  Frequent shingles are capped (``max_shingle_freq``) to bound the
  quadratic blowup on boilerplate — the standard suffix-array/LSH
  trick expressed relationally.
* MinHash+LSH — signatures via K independent permutation hashes
  (xxhash64 with seed lits, codegen'd), banded into buckets; candidate
  pairs only within a bucket. Shuffle volume is O(docs × bands).
* SimHash — 64-bit weighted-bit signature via bitwise aggregates;
  near-dups = identical signature (or banded Hamming prefilter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: one row per duplicate-set with the
    keeper (min id), the set size, and the hash."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).
    Built-ins only: split -> transform over sliding offsets -> explode.
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), k), lambda i: F.array_join(F.slice(words, i, n), " ")
    )
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = 100,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard >= threshold.

    inverted index self-join: |common shingles| per pair, then
    |A ∪ B| = |A| + |B| - common. ``max_shingle_freq`` drops shingles
    shared by more than N docs (stopword-grams) — they add candidates
    without discriminating, and they're the skew bombs at scale.
    """
    sh = word_shingles(df, id_col, text_col, n).persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    if max_shingle_freq:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_shingle_freq)
            .select("shingle")
        )
        sh_j = sh.join(rare, "shingle")
    else:
        sh_j = sh
    a, b = sh_j.alias("a"), sh_j.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """MinHash signature per doc: sig[k] = min over shingles of
    xxhash64(shingle, seed=k). All codegen'd; one groupBy."""
    sh = word_shingles(df, id_col, text_col, n)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(k))).alias(f"h{k}") for k in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*mins).select(
        id_col, F.array(*[f"h{k}" for k in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH banding: docs agreeing on any full band of the signature are
    candidate near-dups. Returns distinct (id_a < id_b) pairs.
    Shuffle key = (band_idx, band_hash): co-locates only colliders."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.col("signature")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)],
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash over word features: bit j of the signature is the
    sign of sum over words of (+1 if xxhash64(word) bit j else -1).

    Relational formulation: explode words -> per (doc, bit) weighted
    sum -> assemble. Two hash aggregates, no UDF.
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    per_bit = words.select(
        F.col(id_col),
        *[
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{j}")
            for j in range(bits)
        ],
    ).groupBy(id_col).agg(*[F.sum(f"b{j}").alias(f"b{j}") for j in range(bits)])
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig + F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long") * (2**j if j < 63 else -(2**63))).otherwise(0)
    return per_bit.select(F.col(id_col), sig.alias("simhash"))


def simhash_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Groups of documents sharing an identical SimHash signature."""
    s = simhash(df, id_col, text_col)
    return (
        s.groupBy("simhash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
