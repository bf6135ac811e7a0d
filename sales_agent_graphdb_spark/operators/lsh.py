"""Near-duplicate detection operators: MinHash+LSH, SimHash, n-gram
Jaccard — the training-data dedup family, built for the 100 TB shape:
signatures are computed map-side with built-in higher-order functions
(no Python), candidate generation is a band-bucket equi-join (shuffle
on short keys only), and exact verification runs only on candidates.

Public-knowledge algorithms: Broder's MinHash (shingle → k hash mins),
banding LSH from Mining of Massive Datasets ch.3, Charikar's SimHash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized(c: Column) -> Column:
    return F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", "")


def char_shingles(c: Column, k: int = 4) -> Column:
    """Distinct k-char shingles of a normalized text column
    (array<string>), built with sequence→transform — no explode yet, so
    the set stays row-local until the join needs it."""
    norm = normalized(c)
    n_pos = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n_pos), lambda p: norm.substr(p, F.lit(k)))
    )


def word_tokens(c: Column) -> Column:
    return F.split(F.trim(normalized(c)), r"\s+")


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two array columns (JVM set ops)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / union


def minhash_signature(shingles: Column, n_hashes: int = 32) -> Column:
    """array<bigint> of length n_hashes: min over shingles of
    xxhash64(shingle, seed_i). Empty shingle sets get sentinel mins."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda g: F.xxhash64(g, i))),
    )


def minhash_bands(sig: Column, n_bands: int, rows_per_band: int) -> Column:
    """array<struct<band:int, bucket:bigint>> — one bucket key per band
    (hash of the band's signature slice)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.xxhash64(F.slice(sig, b * rows_per_band + 1, rows_per_band)).alias("bucket"),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_k: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle → signature → band buckets →
    bucket equi-join (candidates) → exact-Jaccard verify. Returns
    (id_a, id_b, jaccard_sim) with id_a < id_b.

    Scale notes: the only shuffle is the candidate equi-join on
    (band, bucket) — short keys, heavily combinable; the shingle sets
    ride along only for verification. At 100 TB you'd hash-partition by
    bucket and salt hot buckets (boilerplate text); AQE skew-join
    covers moderate skew here."""
    rows_per_band = n_hashes // n_bands
    base = df.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), shingle_k).alias("shingles"),
    ).withColumn("sig", minhash_signature(F.col("shingles"), n_hashes))
    banded = base.select(
        "id",
        "shingles",
        F.explode(minhash_bands(F.col("sig"), n_bands, rows_per_band)).alias("bb"),
    ).select("id", "shingles", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_sim") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def simhash(c: Column, n_bits: int = 64) -> Column:
    """Charikar SimHash over word tokens, represented as an n_bits-char
    '0'/'1' string: per bit j, sign of Σ_tokens (bit_j(xxhash64(token))
    ? +1 : -1). The string form keeps everything inside built-in
    higher-order functions (bit shifts by a *column* amount don't
    exist as JVM expressions) and banding/hamming work on substrings."""
    toks = word_tokens(c)
    # each token hash as a 64-char two's-complement bit string
    tok_bits = F.transform(
        toks, lambda t: F.lpad(F.bin(F.xxhash64(t)), 64, "0")
    )

    def bit(j: Column) -> Column:
        # +1 if bit j of the token hash is 1 else -1, summed over tokens
        total = F.aggregate(
            tok_bits,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.substr(j + 1, F.lit(1)) == "1", 1).otherwise(-1),
        )
        return F.when(total > 0, "1").otherwise("0")

    return F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(n_bits - 1)), lambda j: bit(j.cast("int"))),
        "",
    )


def hamming_bits(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length bit strings."""
    return F.size(
        F.filter(
            F.zip_with(F.split(a, ""), F.split(b, ""), lambda x, y: x != y),
            lambda d: d,
        )
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with hamming ≤ max_hamming, candidates
    via 4×16-bit chunk banding (pigeonhole: ≤3 differing bits leave ≥1
    of 4 chunks identical)."""
    base = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh"))
    banded = base.select(
        "id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda i: F.struct(
                    i.cast("int").alias("chunk"),
                    F.col("sh").substr(i * 16 + 1, F.lit(16)).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.chunk").alias("chunk"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming_bits(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
