"""Deduplication operators for LLM data pipelines.

Four tiers, all expressed with built-in Spark ops (no Python UDFs):

- exact_dedup          hash-groupBy on normalized text (one shuffle)
- ngram_jaccard_pairs  exact n-gram Jaccard over an inverted-index join
- minhash_lsh_pairs    MinHash signatures → banded LSH buckets → verified
                       candidate pairs (the 100 TB near-dup path)
- simhash_pairs        64-bit SimHash + pigeonhole banding on 16-bit chunks,
                       Hamming-verified

Formulation note: the HOT paths (signatures, votes, pair arithmetic) are
posexplode/window/aggregate — not higher-order array functions, which are
CodegenFallback in Spark: one in a stage drops the whole stage to
interpreted evaluation (measured ~10× on these pipelines; see
shingle_rows). The exceptions are deliberate and ROW-LOCAL: shingle_rows'
transform() builds each doc's shingle array without the full-corpus
shuffle the posexplode+window formulation needed (its docstring carries
the measurement), and remove_dup_spans' filter()/exists() rebuild
per-document token lists. Jaccard is computed from set-size arithmetic
over the inverted index, never per-pair array intersection.

Scale design: every pairing step goes through an equi-join on a bucket key
(shingle, band signature, or chunk value) — never a cartesian product. Hot
buckets (degenerate signatures) are capped with ``max_bucket`` to bound the
worst-case join fan-out, which is the standard guard in web-scale dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flusher_spark.operators.text import WS_CLASS, normalized_text, tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized text: keep the lowest id per group.
    One hash-shuffle on the normalized text; count preserved as n_copies.

    NULL text is MISSING, not equal: each NULL-text document is its own
    group (n_copies=1) via an id-valued disambiguator in the group key —
    without it groupBy unifies NULL keys and silently drops all
    contentless docs but one. (Empty strings still normalize equal to each
    other: two empty texts ARE identical content.)"""
    norm = normalized_text(F.col(text_col))
    return (
        df.groupBy(
            norm.alias("norm_text"),
            F.when(norm.isNull(), F.col(id_col)).alias("__null_key"),
        )
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "n_copies")
    )


def shingle_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    positions: bool = False,
) -> DataFrame:
    """One row per word-n-gram occurrence: (doc_id, s) — or
    (doc_id, pos, s) with the 0-based start-token index when ``positions``
    (the substring-span dedup path needs anchors, not just grams).

    Formulation is load-bearing at scale: shingling is ROW-LOCAL, so it must
    be a narrow projection — one ``transform(sequence, i -> concat_ws(slice))``
    over the token array, then explode. The previous formulation (posexplode
    + lead window) SHUFFLED the entire tokenized corpus by doc_id just to
    see neighboring tokens; at 100 TB that is a full-corpus exchange for an
    embarrassingly parallel operation, and it bought nothing downstream
    (the dedup/index steps re-shuffle on (doc_id, s) regardless). The single
    interpreted HOF costs one lambda per shingle — measured 2× FASTER than
    the window formulation wall-clock at sf0.1, before counting the saved
    shuffle; the earlier '10× slower HOF' finding was num_perm nested
    lambdas per row in the MinHash aggregate (see minhash_signatures), not
    one transform per row."""
    toks = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t")).where(
        F.size("__t") >= n
    )
    gram_array = F.expr(
        f"transform(sequence(0, size(__t) - {n}), i -> concat_ws(' ', slice(__t, i + 1, {n})))"
    )
    if positions:
        return toks.select("doc_id", F.posexplode(gram_array).alias("pos", "s"))
    return toks.select("doc_id", F.explode(gram_array).alias("s"))


def shingles_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc_id, shingles): the distinct shingle SET per document (for Jaccard
    verification), via shingle_rows + collect_set — same set semantics as
    array_distinct of the inline version, minus the interpreted stage."""
    return (
        shingle_rows(df, text_col, id_col, n)
        .groupBy("doc_id")
        .agg(F.collect_set("s").alias("shingles"))
    )


#: Spark byte-string suffixes (JavaUtils.byteStringAsBytes): a bare number
#: means BYTES for this conf; "k/m/g/t/p" (optionally with a trailing "b",
#: e.g. "128m" == "128mb") are binary multiples.
_BYTE_SUFFIXES = {
    "": 1,
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
    "p": 1 << 50,
    "pb": 1 << 50,
}


def _parse_byte_string(raw: str, default: int = 128 << 20) -> int:
    """Parse a Spark byte-size conf value ("134217728", "128m", "1g") the way
    JavaUtils.byteStringAsBytes does. Stripping non-digits is NOT a parse:
    "128m" would become 128 BYTES, exploding the split estimate below and
    silently skipping the repartition this helper exists to apply. Unknown
    shapes fall back to Spark's 128m default rather than guessing."""
    s = raw.strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, suffix = s[:i], s[i:].strip()
    # isdigit, not int(): '1.5g' strips to num='1.5' and '0x800...' to a
    # hex-ish remnant — int() would raise past _ensure_parallelism's
    # OSError-only catch and crash the operator; the contract is fall back,
    # never raise (r13 review).
    if not num.isdigit() or suffix not in _BYTE_SUFFIXES:
        return default
    return max(1, int(num) * _BYTE_SUFFIXES[suffix])


def _ensure_parallelism(df: DataFrame, bytes_per_task: int | None = None) -> DataFrame:
    """Repartition CPU-bound inputs that arrive under-split (e.g. a single
    row group): the shuffle of a document table is trivia next to running
    the shingle/hash pipeline on one core. No-op when the source already has
    enough partitions — i.e. always, at real scale.

    ``bytes_per_task`` (optional) caps the fan-out for LIGHT per-row work:
    the repartition width becomes ceil(total input bytes / bytes_per_task),
    clamped to [1, defaultParallelism], instead of jumping straight to the
    core count. The constant encodes per-byte downstream cost (a property
    of the operator, not of the deployment): a heavyweight codec wants a
    small bytes_per_task (full fan-out at any realistic size), a
    magic-byte router wants a large one — r14 measured the full 32-way
    fan-out on such entries costing 1.07–1.37× at fixture in task/Arrow
    overhead alone (guide §2.6: 2-3 jobs in flight is plenty; more fight
    for executors). Still scale-adaptive in both directions: width grows
    linearly with input size up to the cluster budget, and the helper
    remains a no-op whenever the scan already arrives in ≥ cores splits.
    When file sizes cannot be statted the cap is skipped (full fan-out —
    can only over-shuffle, never under-parallelize)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    # Cheap metadata probe: inputFiles() only analyzes the plan, while any
    # RDD conversion (Python or JVM) compiles a full physical plan (~1 s of
    # bench time per query) just to ask a partition count. A scan with >= p
    # files always yields >= p partitions, so the file count is a sufficient
    # under-split signal for file-backed inputs. Non-file inputs (in-memory
    # test frames) pass through untouched: their partitioning is whatever
    # the caller built, and probing it isn't worth a plan compile.
    files = df.inputFiles()
    if not files or len(files) >= p:
        return df
    # Few files is NOT few partitions when the files are LARGE and
    # splittable (r12 review: 8×10 GB parquet scans into ~640
    # maxPartitionBytes splits — a forced repartition(p) would pay a
    # full-corpus shuffle to REDUCE parallelism). Estimate the scan's
    # split count from file sizes; any stat failure (object-store URI)
    # falls back to the file-count signal, which can only over-shuffle,
    # never under-parallelize.
    try:
        import os
        from urllib.parse import unquote

        raw = str(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
        max_bytes = _parse_byte_string(raw)
        splits = 0
        total_bytes = 0
        for f in files:
            local = unquote(f.removeprefix("file://").removeprefix("file:"))
            size = os.stat(local).st_size
            total_bytes += size
            splits += max(1, -(-size // max_bytes))
        if splits >= p:
            return df
        if bytes_per_task:
            target = min(p, max(1, -(-total_bytes // bytes_per_task)))
            # Repartitioning DOWN to the cap would reduce parallelism the
            # scan already has — the cap only ever widens an under-split.
            if target <= splits:
                return df
            return df.repartition(target)
    except OSError:
        pass
    return df.repartition(p)


def _jaccard_filtered(sized: DataFrame, threshold: float) -> DataFrame:
    """(doc_a, doc_b, jaccard) from (__inter, __sz_a, __sz_b) columns — the
    ONE copy of the oracle-sensitive |A∩B| / (|A|+|B|−|A∩B|) arithmetic
    shared by the exact n-gram path and MinHash verification (r12 review:
    two hand-synced copies of an expression two DuckDB oracles must match
    bit-for-bit)."""
    return (
        sized.withColumn(
            "jaccard",
            F.col("__inter").cast("double")
            / (F.col("__sz_a") + F.col("__sz_b") - F.col("__inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted-index join: only
    pairs sharing ≥1 rare shingle are ever materialized (no cartesian).
    Shingles shared by more than ``max_bucket`` docs don't GENERATE
    candidates (bounding join fan-out — the standard web-dedup guard) but
    still COUNT toward the Jaccard of pairs found via rare shingles, so the
    similarity value is exact.

    Jaccard comes from set-size arithmetic, not array materialization:
    |A∩B| = number of co-occurring shingles (a count over the index join),
    |A∪B| = |A| + |B| − |A∩B|. No collect_set / array_intersect — those are
    interpreted per-pair array scans; this is three codegen'd aggregates."""
    sized = _ngram_pair_intersections(df, text_col, id_col, n, max_bucket)
    return _jaccard_filtered(sized, threshold)


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    max_bucket: int = 1000,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs: C(A,B) = |A∩B| / min(|A|, |B|).

    Containment is the inclusion detector Jaccard structurally cannot be: a
    short document fully quoted inside a long one has tiny Jaccard (the union
    is dominated by the long side) but containment 1.0. Corpus curation needs
    both — Jaccard for near-identical page pairs, containment for
    quote/boilerplate/subset relations (the Broder resemblance-vs-containment
    distinction). Shares the inverted-index core with ngram_jaccard_pairs:
    candidate pairs come only from rare-shingle co-occurrence (no cartesian),
    hot shingles still count toward |A∩B| of found pairs, and the score is
    pure set-size arithmetic — one IEEE division per pair, so the DuckDB
    oracle reproduces it bit-for-bit."""
    sized = _ngram_pair_intersections(df, text_col, id_col, n, max_bucket)
    return (
        sized.withColumn(
            "containment",
            F.col("__inter").cast("double") / F.least("__sz_a", "__sz_b").cast("double"),
        )
        .where(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def _ngram_pair_intersections(
    df: DataFrame, text_col: str, id_col: str, n: int, max_bucket: int
) -> DataFrame:
    """Shared inverted-index core: (doc_a, doc_b, __inter, __sz_a, __sz_b)
    for every pair sharing ≥1 rare shingle. See ngram_jaccard_pairs for the
    scale rationale (hot-shingle candidate cap + exact correction term).

    The distinct shingle index feeds FIVE consumers (rare/hot splits, both
    sides of the candidate self-join, and the doc sizes); without
    materialization each consumer replans the tokenize+explode+distinct
    subtree — the audit showed 38 static shuffles for what is logically 5.
    ``localCheckpoint(eager=False)`` computes the index once at first use
    and lets every consumer read the materialized partitions (same
    discipline, same executor-loss caveat as the MinHash signature reuse
    below)."""
    df = _ensure_parallelism(df)
    inv = (
        shingle_rows(df, text_col, id_col, n)
        .dropDuplicates(["doc_id", "s"])
        .localCheckpoint(eager=False)
    )
    freq = inv.groupBy("s").agg(F.count("*").alias("df_count"))
    inv_rare = inv.join(freq.where(F.col("df_count") <= max_bucket).select("s"), "s")
    inv_hot = inv.join(freq.where(F.col("df_count") > max_bucket).select("s"), "s")
    sizes = inv.groupBy("doc_id").agg(F.count("*").alias("sz"))

    inter_rare = (
        inv_rare.alias("a")
        .join(
            inv_rare.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("__i_rare"))
    )
    # Correction term: capped shingles shared by an already-found pair. The
    # join is per-candidate (bounded), never per-hot-shingle-pair (quadratic).
    inter_hot = (
        inter_rare.select("doc_a", "doc_b")
        .join(inv_hot.select(F.col("doc_id").alias("doc_a"), "s"), "doc_a")
        .join(inv_hot.select(F.col("doc_id").alias("doc_b"), "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("__i_hot"))
    )
    inter = inter_rare.join(inter_hot, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        (F.col("__i_rare") + F.coalesce("__i_hot", F.lit(0))).alias("__inter"),
    )
    return inter.join(
        sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("__sz_a")), "doc_a"
    ).join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("__sz_b")), "doc_b")


def minhash_min_aggs(num_perm: int, seed: int = 42, shingle_col: str = "s") -> list:
    """One codegen'd min-aggregate per MinHash permutation, each over an
    INDEPENDENTLY SEEDED xxhash64 of the shingle — the textbook k-hash
    MinHash construction.

    Why not the classic affine family min(pmod(a*h+b, p)) over ONE base
    hash: the base hash had to be masked to 32 bits (a 31-bit a times a
    64-bit h overflows a signed long under ANSI), and then a*h+b < p for
    every h < p/a ≈ 2^30 — the "permutation" is ORDER-PRESERVING on a
    quarter of the hash space, so whenever a document's smallest base hash
    is small, ALL permutations pick the same argmin shingle. One shared
    low-hash shingle dragged a fixture pair with true Jaccard 0.008 to
    29/32 signature agreement (round 11 find, tests/test_dedup_index.py
    guards the estimator). Distinct-salt xxhash64 calls are genuinely
    independent permutations, stay whole-stage-codegen'd, and cost one
    vectorized hash per (permutation, shingle occurrence) — the shuffle
    still carries only num_perm longs per doc."""
    return [
        F.min(F.xxhash64(F.lit(seed * 1_000_003 + i), shingle_col)).alias(f"__m{i}")
        for i in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document, as explode + hash-aggregate.

    Formulation matters at scale: higher-order functions (transform /
    array_min) are evaluated INTERPRETED in Spark — num_perm nested lambdas
    per row fall off the codegen path (measured ~20 s for 5000 docs). Instead
    we explode shingles and compute each permutation as a plain seeded-hash
    min aggregate (minhash_min_aggs): whole-stage-codegen'd, map-side partial
    mins, and the shuffle carries only num_perm longs per doc."""
    exploded = shingle_rows(_ensure_parallelism(df), text_col, id_col, shingle_n)
    # min() is duplicate-insensitive: no distinct pass over occurrences.
    aggs = minhash_min_aggs(num_perm, seed)
    return (
        exploded.groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.array(*[f"__m{i}" for i in range(num_perm)]).alias("sig"))
    )


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
    ~50% capture at J≈0.54 (1−(1−s⁴)⁸ = 0.5 at s≈0.537; the often-quoted
    (1/b)^(1/r) ≈ 0.59 is the curve's steepness threshold, where capture is
    already ~65%); verification then enforces the exact threshold.
    Each band signature is one equi-join key: shuffle is per-band, never
    quadratic. Oversized buckets are capped (see module docstring)."""
    if bands <= 0 or num_perm <= 0 or num_perm % bands != 0:
        # A remainder would silently compute-and-shuffle permutations that
        # never feed a band key, quietly shifting the s-curve the caller
        # parameterized; bands > num_perm would build zero-row bands.
        raise ValueError(
            f"num_perm ({num_perm}) must be a positive multiple of bands ({bands})"
        )
    rows = num_perm // bands
    df = _ensure_parallelism(df)
    # ONE shingle pass serves both signatures and verification: signatures
    # aggregate over the deduplicated index (min is duplicate-insensitive,
    # so distinct vs raw occurrences give identical MinHash values).
    # The shingle index feeds three downstream consumers (signature agg +
    # both sides of the verification join); without materialization Spark
    # recomputes the explode+window+dedup pipeline once per branch (6 file
    # scans in the executed plan). localCheckpoint(eager=False) keeps this
    # function a lazy plan builder (materialization happens on the FIRST
    # action, once, not at construction time) while still truncating the
    # lineage so downstream branches share one materialized index.
    # localCheckpoint data is executor-local and unrecoverable on executor
    # loss — fine for a single-JVM bench; a 1000-executor production run
    # would persist(DISK_ONLY) or write the index to a scratch table and
    # accept the re-run-from-source cost on loss instead.
    inv = (
        shingle_rows(df, text_col, id_col, shingle_n)
        .dropDuplicates(["doc_id", "s"])
        .localCheckpoint(eager=False)
    )
    # The distinct-shingle count rides the SAME aggregate as the minima
    # (count over the dedup'd index == |shingle set|): the union-size branch
    # costs zero extra passes over the shingles. sig_sz is one compact row
    # per doc — (id, num_perm longs, sz) — checkpointed too, so the band
    # explode, the bucket self-join, and the two size joins all read the
    # tiny materialized table instead of re-running the signature aggregate.
    sig_sz = (
        inv.groupBy("doc_id")
        .agg(*minhash_min_aggs(num_perm, seed), F.count("*").alias("sz"))
        .localCheckpoint(eager=False)
    )
    sig = sig_sz.select("doc_id", F.array(*[f"__m{i}" for i in range(num_perm)]).alias("sig"))
    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.hash(*[F.element_at("sig", i * rows + j + 1) for j in range(rows)]).alias("bsig"),
        )
        for i in range(bands)
    ]
    # Buckets carry ONLY (doc_id, band, bsig): the heavy shingle arrays never
    # ride through the bands-fold explode or the candidate self-join shuffle —
    # they re-attach once per surviving candidate for verification.
    buckets = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bsig").alias("bsig")
    )
    # Bucket-size cap as a window count, not groupBy+join-back: one shuffle
    # on (band, bsig) instead of two, and it leaves the data partitioned by
    # exactly the key the candidate self-join needs next.
    wcap = Window.partitionBy("band", "bsig")
    buckets = (
        buckets.withColumn("__n", F.count("*").over(wcap))
        .where(F.col("__n") <= max_bucket)
        .drop("__n")
    )
    cand = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Verification by set-size arithmetic (same trick as ngram_jaccard_pairs):
    # |A∩B| = co-occurring distinct shingles counted per candidate pair,
    # |A∪B| = |A| + |B| − |A∩B|. No collect_set arrays, no interpreted
    # array_intersect; the per-candidate join is bounded by |cand| × shingles.
    # Set sizes come from sig_sz (computed inside the signature aggregate —
    # no second pass over the shingle index).
    sizes_inv = sig_sz.select("doc_id", "sz")
    inter = (
        cand.join(inv.select(F.col("doc_id").alias("doc_a"), "s"), "doc_a")
        .join(inv.select(F.col("doc_id").alias("doc_b"), "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("__inter"))
    )
    return _jaccard_filtered(
        inter.join(
            sizes_inv.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("__sz_a")),
            "doc_a",
        ).join(
            sizes_inv.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("__sz_b")),
            "doc_b",
        ),
        threshold,
    )


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document, as explode + hash-aggregate.

    Per bit i, the vote is sum(±1) over token hashes; sign(vote) sets the
    bit. Like minhash_signatures, the folds are expressed as plain SUM
    aggregates over exploded tokens (whole-stage codegen, map-side partials)
    instead of interpreted higher-order lambdas."""
    # Contentless docs are EXCLUDED up front: tokens('') is [''] (size 1),
    # so the old size guard let every blank/whitespace-only doc hash the
    # phantom empty token into one shared signature — N such docs meant
    # ~N²/2 hamming-0 "near-dup" pairs of nothing (r12 review). NULL text
    # drops too (the predicate is NULL). exact_dedup owns identical-empty
    # grouping.
    toks = (
        _ensure_parallelism(df)
        .where(normalized_text(F.col(text_col)) != "")
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t"))
    )
    h = F.xxhash64("s")
    exploded = toks.select("doc_id", F.explode("t").alias("s"))
    votes = [
        F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"__v{i}")
        for i in range(64)
    ]
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig.bitwiseOR(
            F.when(F.col(f"__v{i}") > 0, F.lit(1 << i if i < 63 else -(1 << 63)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return exploded.groupBy("doc_id").agg(*votes).select("doc_id", sig.alias("sig"))


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
    xor verifies.

    The signature table (one long per doc) is localCheckpoint'ed: it feeds
    the bucket-size filter and both sides of the candidate self-join, and
    without materialization each branch replays the full-corpus explode +
    64-vote aggregate (same reasoning as minhash_lsh_pairs)."""
    if not 0 <= max_hamming <= 3:
        # The 4-chunk pigeonhole only GUARANTEES a shared chunk for pairs
        # within Hamming 3 (4 differing bits can hit all 4 chunks); a
        # larger bound would silently return an arbitrary subset of the
        # promised pair set (r12 review — the minhash guard's discipline).
        raise ValueError(
            f"max_hamming ({max_hamming}) must be 0..3: the fixed 4-chunk"
            " banding cannot guarantee recall beyond Hamming 3"
        )
    sigs = simhash_signatures(df, text_col, id_col).localCheckpoint(eager=False)
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
    # One-shuffle bucket cap (the minhash_lsh_pairs window formulation —
    # the old groupBy + join-back paid a second full exchange of the chunk
    # table, r12 review); the window also leaves the data partitioned by
    # exactly the key the candidate self-join needs next.
    wc = Window.partitionBy("chunk", "cval")
    chunks = (
        chunks.withColumn("__n", F.count("*").over(wc))
        .where(F.col("__n") <= max_bucket)
        .drop("__n")
    )
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


def dedup_clusters(
    pairs: DataFrame, max_iter: int = 20, strict: bool = True, stats: dict | None = None
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id).

    The end of the dedup pipeline: pair lists (from minhash_lsh_pairs /
    ngram_jaccard_pairs / simhash_pairs) become duplicate CLUSTERS, each
    labeled by its minimum member id — the canonical representative to keep.

    Round count is O(component diameter): right for near-dup cliques
    (2-3 rounds), wrong for chain-shaped graphs — those belong to
    operators/graph.py::connected_components (star contraction, O(log n)
    rounds). Exhausting ``max_iter`` before the labels stabilize RAISES
    when ``strict`` (the default): a split component silently keeps extra
    duplicate copies downstream. ``stats`` (optional dict) is purely
    observational — it receives {"rounds": n, "converged": bool}.

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; converges in O(diameter)
    rounds (near-dup clusters are tiny cliques, so 2-3 rounds in practice;
    ``max_iter`` bounds pathological chains). Each round is one equi-join +
    one aggregate — fully distributed; ``localCheckpoint`` truncates the
    growing lineage so round N's plan doesn't replay rounds 1..N-1. The
    convergence probe is a driver-side count of changed labels (a scalar per
    round, not a collect of the data).
    """
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # Materialize the edge list once: every propagation round joins against
    # it, and without a checkpoint each round replays the entire upstream
    # pair pipeline (LSH bucketing + verification) — O(rounds) corpus passes.
    edges = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
                (F.col("nlabel") < F.col("label")).alias("__changed"),
            )
        ).localCheckpoint(eager=True)
        changed = updated.where(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if strict and not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge in max_iter={max_iter} rounds: a "
            "component's diameter exceeds the round budget, so its labels are "
            "still split. Raise max_iter, or use "
            "operators.graph.connected_components (O(log n) star contraction) "
            "for chain-shaped graphs; pass strict=False to accept a partial "
            "labeling (inspect stats['converged'])."
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def substring_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """Substring-level duplicate SPANS — the corpus-dedup mode that catches
    repeated passages exact/MinHash doc-level dedup both miss (boilerplate
    paragraphs, licence blocks, syndicated intros shared across otherwise
    distinct pages). Public reference point: suffix-array substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"); this is the shuffle-bounded Spark formulation of the same
    contract — a token position is duplicated iff the k-token gram starting
    there also occurs in >= ``min_docs`` distinct documents, and anchors
    whose k-token windows overlap (successive positions <= k-1 apart)
    merge into one span. A shared passage of L tokens is the island of
    its L-k+1 consecutive anchors; overlap-merging additionally folds two
    distinct shared passages whose anchor runs interleave within k-1
    positions into one contiguous region, so the returned spans NEVER
    overlap in token space and their ``n_tok`` values sum to the exact
    number of duplicated tokens per document (the invariant
    :func:`remove_dup_spans` and the mask entry's oracle arithmetic rely
    on; a consecutive-only merge emits token-overlapping spans whenever
    two duplicated passages start 2..k-1 positions apart and over-counts
    the removal).

    Plan shape (never all-pairs, never a suffix array's global sort):
    row-local gram explode (narrow, same transform/slice projection as
    shingle_rows) -> one groupBy on the gram string (the inverted index;
    map-side partial counts) -> semi-join positions against the duplicated
    grams -> one doc_id window for gaps-and-islands. Cost is O(corpus
    tokens) shuffle bytes, the same order as the MinHash pipeline. The
    gram pipeline feeds BOTH the inverted-index groupBy and the semi-join
    probe, so it is localCheckpoint'ed (lazily) to compute the explode
    once instead of twice — the same multi-consumer trade as
    minhash_lsh_pairs' shingle index.

    ``hash_grams=True`` is the 100 TB path: the k-token gram string is
    xxhash64-compressed row-locally BEFORE the exchange, so the inverted
    index shuffles 8-byte keys instead of ~8k-char strings (an order of
    magnitude less shuffle volume at k=8). The trade is a 2^-64 per-pair
    collision probability — a colliding pair would mark one extra gram
    position as duplicated, never lose a true span. Default False keeps
    the raw string key so the result is collision-free exact.

    Returns (doc_id, start_tok, end_tok, n_tok): 0-based inclusive token
    indexes of each maximal duplicated span, n_tok = end - start + 1 >= k.
    """
    grams = shingle_rows(
        _ensure_parallelism(df), text_col, id_col, n=k, positions=True
    ).withColumnRenamed("s", "g")
    if hash_grams:
        grams = grams.withColumn("g", F.xxhash64("g"))
    grams = grams.localCheckpoint(eager=False)
    dup = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("g")
    )
    hits = grams.join(dup, "g", "left_semi").select("doc_id", F.col("pos").cast("long"))
    # Gaps-and-islands with an OVERLAP threshold, not consecutive-only:
    # successive anchors <= k-1 apart cover overlapping token windows, so
    # they must land in one island or the emitted spans double-count tokens.
    w = Window.partitionBy("doc_id").orderBy("pos")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        hits.withColumn(
            "__new",
            F.when(F.col("pos") - F.lag("pos").over(w) <= k - 1, F.lit(0)).otherwise(F.lit(1)),
        )
        .withColumn("grp", F.sum("__new").over(wrun))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("start_tok"), F.max("pos").alias("__maxpos"))
        .select(
            "doc_id",
            "start_tok",
            (F.col("__maxpos") + k - 1).cast("long").alias("end_tok"),
            (F.col("__maxpos") + k - F.col("start_tok")).cast("long").alias("n_tok"),
        )
    )


def remove_dup_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Trim the spans found by :func:`substring_dup_spans` out of each
    document (Lee et al.'s 'remove the duplicated substring' step). Every
    flagged occurrence is removed in every document that carries one; a
    single canonical copy survives only if some corpus document contains
    the passage OUTSIDE a flagged span (callers wanting keep-one semantics
    filter ``spans`` first, e.g. by dropping each anchor gram's minimum
    doc_id — policy, not mechanism, so it stays out of this operator).

    Surviving tokens keep their ORIGINAL text (casing, punctuation): the
    rebuild applies the same collapse-then-trim shape as ``tokens`` to the
    UN-lowercased text — lowercasing never moves a whitespace boundary, so
    positions align 1:1 with the span indexes (an old trim-then-split here
    kept a phantom '' token on edge-whitespace docs, shifting every span
    index by one relative to tokens(); r11 review) — and only inter-token
    whitespace is normalized to single spaces (inherent to token-level
    masking; runs of whitespace collapse). Documents with no spans pass
    through byte-verbatim via the left join.

    One doc_id-keyed aggregate of spans (collect_list of bounded per-doc
    span structs — span counts per doc are small by construction) + a
    row-local filter-by-position rebuild.
    """
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("__spans")
    )
    out_text = F.when(
        F.col("__spans").isNull(), F.col(text_col)
    ).otherwise(
        F.expr(
            "concat_ws(' ', filter(__t, (tok, i) -> "
            "NOT exists(__spans, s -> i >= s.start_tok AND i <= s.end_tok)))"
        )
    )
    keep = [c for c in df.columns if c != text_col]
    canon = F.trim(F.regexp_replace(F.col(text_col), WS_CLASS + "+", " "))
    return (
        df.withColumn("__t", F.split(canon, " "))
        .join(per_doc, df[id_col] == per_doc["doc_id"], "left")
        .drop(per_doc["doc_id"])
        .select(*keep, out_text.alias(text_col))
    )
