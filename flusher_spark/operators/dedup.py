"""Deduplication operators for LLM data pipelines.

Four tiers, all expressed with built-in Spark ops (no Python UDFs — the hash
pipelines are higher-order column functions that stay inside whole-stage
codegen):

- exact_dedup          hash-groupBy on normalized text (one shuffle)
- ngram_jaccard_pairs  exact n-gram Jaccard over an inverted-index join
- minhash_lsh_pairs    MinHash signatures → banded LSH buckets → verified
                       candidate pairs (the 100 TB near-dup path)
- simhash_pairs        64-bit SimHash + pigeonhole banding on 16-bit chunks,
                       Hamming-verified

Scale design: every pairing step goes through an equi-join on a bucket key
(shingle, band signature, or chunk value) — never a cartesian product. Hot
buckets (degenerate signatures) are capped with ``max_bucket`` to bound the
worst-case join fan-out, which is the standard guard in web-scale dedup.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F

from flusher_spark.operators.text import normalized_text, tokens

#: 2^61-1 (Mersenne prime): modulus for the MinHash permutation family.
_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized text: keep the lowest id per group.
    One hash-shuffle on the normalized text; count preserved as n_copies."""
    return (
        df.groupBy(normalized_text(F.col(text_col)).alias("norm_text"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "n_copies")
    )


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as an array column (built-ins only)."""
    toks = tokens(F.col(text_col))
    count = F.size(toks) - (n - 1)
    joined = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(count >= 1, F.array_distinct(joined)).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted-index join: only
    pairs sharing ≥1 shingle are ever materialized (no cartesian). Shingles
    shared by more than ``max_bucket`` docs are dropped from pairing (they
    cannot discriminate; this bounds join fan-out at scale)."""
    sh = df.select(F.col(id_col).alias("doc_id"), word_shingles(text_col, n).alias("shingles")).where(
        F.size("shingles") > 0
    )
    inv = sh.select("doc_id", F.explode("shingles").alias("s"))
    rare = inv.groupBy("s").agg(F.count("*").alias("df_count")).where(F.col("df_count") <= max_bucket)
    inv = inv.join(rare.select("s"), "s")
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    verified = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def _permutation_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    # a,b < 2^31 so the affine transform of a 32-bit-masked hash stays within
    # a signed 64-bit long (no ANSI overflow).
    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 31), rng.randrange(0, 1 << 31)) for _ in range(num_perm)]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document: xxhash64 each shingle once, then apply
    ``num_perm`` affine permutations (a*h+b mod 2^61-1) and take the min of
    each — all as nested higher-order functions, fully codegen'd."""
    params = _permutation_params(num_perm, seed)
    sh = df.select(
        F.col(id_col).alias("doc_id"), word_shingles(text_col, shingle_n).alias("shingles")
    ).where(F.size("shingles") > 0)
    # Mask the base hash to 32 bits so a(31-bit) * h(32-bit) + b never
    # overflows a signed 64-bit long (ANSI mode would raise on overflow).
    hashes = F.transform(F.col("shingles"), lambda s: F.xxhash64(s).bitwiseAND(F.lit(0xFFFFFFFF)))

    def _perm(a: int, b: int):
        return lambda h: F.pmod(a * h + b, F.lit(_MERSENNE))

    mins = F.array(*[F.array_min(F.transform(hashes, _perm(a, b))) for a, b in params])
    return sh.select("doc_id", "shingles", mins.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, Jaccard-verified.

    bands=8 × rows=4 over 32 permutations → candidate-capture s-curve with
    ~50% capture at J≈0.59; verification then enforces the exact threshold.
    Each band signature is one equi-join key: shuffle is per-band, never
    quadratic. Oversized buckets are capped (see module docstring)."""
    rows = num_perm // bands
    sig = minhash_signatures(df, text_col, id_col, num_perm, shingle_n, seed)
    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.hash(*[F.element_at("sig", i * rows + j + 1) for j in range(rows)]).alias("bsig"),
        )
        for i in range(bands)
    ]
    buckets = sig.select("doc_id", "shingles", F.explode(F.array(*band_cols)).alias("b")).select(
        "doc_id", "shingles", F.col("b.band").alias("band"), F.col("b.bsig").alias("bsig")
    )
    sizes = buckets.groupBy("band", "bsig").agg(F.count("*").alias("n")).where(F.col("n") <= max_bucket)
    buckets = buckets.join(sizes.select("band", "bsig"), ["band", "bsig"])
    cand = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(text_col: str, id_col: str = "doc_id") -> F.Column:
    """64-bit SimHash of the token multiset: per bit, sum ±1 over token
    hashes and take the sign — expressed as a fold over bit positions."""
    toks = tokens(F.col(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def _vote(i: int):
        # Count of set minus unset bits at position i across token hashes.
        return lambda acc, h: acc + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1)

    sig = F.lit(0).cast("long")
    for i in range(64):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote(i))
        sig = sig.bitwiseOR(
            F.when(vote > 0, F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 10000,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split the 64-bit signature into 4 16-bit chunks; any
    pair within Hamming ≤ 3 must agree exactly on ≥1 chunk, so an equi-join
    per chunk finds all candidates without a cartesian product; bit_count of
    xor verifies."""
    sigs = df.select(F.col(id_col).alias("doc_id"), simhash(text_col).alias("sig"))
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("sig", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("cval"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "sig", F.col("c.chunk").alias("chunk"), F.col("c.cval").alias("cval"))
    sizes = chunks.groupBy("chunk", "cval").agg(F.count("*").alias("n")).where(F.col("n") <= max_bucket)
    chunks = chunks.join(sizes.select("chunk", "cval"), ["chunk", "cval"])
    cand = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))
    )
