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
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    portable: bool = False,
) -> DataFrame:
    """MinHash signature per doc: sig[k] = min over shingles of
    hash(shingle, seed=k). All codegen'd; one groupBy.

    ``portable=False`` (default, fast path): xxhash64 with integer seeds,
    signature is ``array<long>``.
    ``portable=True``: hash = first 16 hex chars of md5(shingle || '|k')
    — lexicographic min of fixed-length hex strings equals numeric min,
    and md5 has an exact twin in every SQL engine (used for DuckDB
    oracle parity); signature is ``array<string>``.
    """
    sh = word_shingles(df, id_col, text_col, n)
    if portable:
        mins = [
            F.min(
                F.substring(F.md5(F.concat_ws("|", F.col("shingle"), F.lit(str(k)))), 1, 16)
            ).alias(f"h{k}")
            for k in range(num_hashes)
        ]
    else:
        mins = [
            F.min(F.xxhash64(F.col("shingle"), F.lit(k))).alias(f"h{k}")
            for k in range(num_hashes)
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
    portable: bool = False,
) -> DataFrame:
    """LSH banding: docs agreeing on any full band of the signature are
    candidate near-dups. Returns distinct (id_a < id_b) pairs.
    Shuffle key = (band_idx, band_hash): co-locates only colliders."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, portable=portable)

    def band_hash(b: int):
        elems = [F.col("signature")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        if portable:
            return F.md5(F.concat_ws("|", *elems, F.lit(str(b))))
        return F.xxhash64(*elems, F.lit(b))

    banded = sig.select(
        F.col(id_col),
        F.posexplode(F.array(*[band_hash(b) for b in range(bands)])).alias(
            "band_idx", "band_hash"
        ),
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


def simhash(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 64, portable: bool = False
) -> DataFrame:
    """64-bit SimHash over word features: bit j of the signature is the
    sign of sum over words of (+1 if hash(word) bit j else -1).

    Relational formulation: explode words -> per (doc, bit) weighted
    sum -> assemble. Two hash aggregates, no UDF.

    ``portable=False`` (default, fast path): xxhash64 word hashes,
    signature is a ``long``. ``portable=True``: word bits come from the
    first 16 hex chars of md5(word) (nibble i, LSB-first within the
    nibble), signature rendered as a 16-char lowercase hex string —
    bit-for-bit reproducible in any SQL engine (DuckDB oracle parity).
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
    )
    if portable:
        h = F.substring(F.md5(F.col("w")), 1, 16)
        nibs = words.select(
            F.col(id_col),
            *[
                F.conv(F.substring(h, i + 1, 1), 16, 10).cast("int").alias(f"n{i}")
                for i in range(16)
            ],
        )
        per_bit = nibs.select(
            F.col(id_col),
            *[
                (F.shiftright(F.col(f"n{j // 4}"), j % 4).bitwiseAND(F.lit(1)) * 2 - 1).alias(
                    f"b{j}"
                )
                for j in range(64)
            ],
        ).groupBy(id_col).agg(*[F.sum(f"b{j}").alias(f"b{j}") for j in range(64)])
        lo = F.lit(0).cast("long")
        for j in range(32):
            lo = lo + F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0))
        hi = F.lit(0).cast("long")
        for j in range(32, 64):
            hi = hi + F.when(F.col(f"b{j}") > 0, F.lit(2 ** (j - 32)).cast("long")).otherwise(
                F.lit(0)
            )
        sig = F.concat(
            F.lpad(F.lower(F.conv(hi.cast("string"), 10, 16)), 8, "0"),
            F.lpad(F.lower(F.conv(lo.cast("string"), 10, 16)), 8, "0"),
        )
        return per_bit.select(F.col(id_col), sig.alias("simhash"))
    words = words.withColumn("h", F.xxhash64("w"))
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


def simhash_duplicates(
    df: DataFrame, id_col: str, text_col: str = "text", portable: bool = False
) -> DataFrame:
    """Groups of documents sharing an identical SimHash signature."""
    s = simhash(df, id_col, text_col, portable=portable)
    return (
        s.groupBy("simhash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
