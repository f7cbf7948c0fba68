"""Text-analysis operators for LLM data pipelines: tokenization stats,
quality scoring, language-ID heuristic, document fingerprinting.

All pure built-in column expressions (JVM-side, whole-stage codegen except
where a docstring says otherwise — the BPE fold is an interpreted
higher-order function by deliberate trade, see bpe_merge_pair) — no Python
UDFs anywhere, so these run at fact-table scale. Each returns columns
designed to be reproducible bit-for-bit in ANSI SQL for the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Stopword profiles for the language-ID heuristic (word-boundary regexes —
#: the same pattern text works in Java regex and RE2).
LANG_PROFILES = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\b",
    "fr": r"\b(le|la|les|et|est|une|des|dans|pour|que)\b",
    "es": r"\b(el|los|las|es|una|con|para|por|del|como)\b",
}
CJK_PATTERN = "[一-鿿]"


# Java's default \s, spelled out. Written explicitly (here AND in every
# DuckDB oracle) because the shorthand is engine-specific: Java \s includes
# \x0B, RE2/DuckDB \s does not — an implicit class silently diverges the
# token counts the first time a fixture contains a vertical tab.
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of the canonical form: split the collapsed,
    WS-trimmed lowercase text on single spaces. Defined VIA normalized_text
    so the two can never drift — and because F.trim strips only ASCII space
    (0x20): the old lower(trim(text)) + split formulation left a trailing
    '\\n' in place, growing a phantom '' token on every document bounded by
    non-space whitespace (r11 review; the DuckDB twins mirrored the
    artifact, so the hash gate never saw it)."""
    return F.split(normalized_text(text), " ")


def n_tokens(text: Column) -> Column:
    """Token count. NOTE: empty or whitespace-only text counts as 1, not 0 —
    splitting '' yields [''] in Spark AND in the DuckDB oracle twin
    (_TOKENS_SQL), and the hash gate depends on the two engines agreeing on
    this artifact. Callers that need blank docs to count 0 guard
    ``trim(text) == ''`` explicitly (see dedup_substring_mask)."""
    return F.size(tokens(text)).cast("long")


def n_unique_tokens(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: alpha runs, digit runs, and single
    non-alphanumeric marks — a deterministic BPE stand-in."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]"), 0)
    ).cast("long")


def stopword_count(text: Column, profile: str = "en") -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(LANG_PROFILES[profile]), 0)).cast("long")


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[.,!?;:]"), 0)).cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]-ish: rewards stopword density and
    moderate token length, penalizes punctuation soup. Deterministic IEEE
    arithmetic (identical in the SQL oracle)."""
    nt = n_tokens(text).cast("double")
    stop_ratio = stopword_count(text).cast("double") / nt
    punct_ratio = punct_count(text).cast("double") / nt
    uniq_ratio = n_unique_tokens(text).cast("double") / nt
    return F.lit(0.5) * stop_ratio + F.lit(0.3) * uniq_ratio - F.lit(0.2) * punct_ratio


def lang_scores(text: Column) -> dict[str, Column]:
    scores = {k: F.size(F.regexp_extract_all(F.lower(text), F.lit(p), 0)) for k, p in LANG_PROFILES.items()}
    scores["zh"] = F.size(F.regexp_extract_all(text, F.lit(CJK_PATTERN), 0))
    return scores


def lang_id(text: Column) -> Column:
    """Stopword-profile argmax with a fixed tie-break chain (en>de>fr>es);
    CJK characters trump everything. NULL text is NULL, not a language:
    without the leading guard every score comparison is NULL, the whole
    chain falls through, and otherwise('es') silently labeled contentless
    documents Spanish (r11 review). Mirrors the SQL oracle's CASE chain."""
    s = lang_scores(text)
    return (
        F.when(text.isNull(), F.lit(None).cast("string"))
        .when(s["zh"] > 0, "zh")
        .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed lowercase with the FULL whitespace class trimmed
    from both ends — the dedup canonical form. Collapse-then-trim, in that
    order: after every WS run becomes one space, plain F.trim (space-only)
    correctly strips the edges. The old trim-then-collapse left a trailing
    space on text bounded by '\\n'/'\\t', so 'good doc\\n' and 'good doc'
    fingerprinted as DIFFERENT documents — the exact miss the canonical
    form exists to prevent (r11 review)."""
    return F.trim(F.regexp_replace(F.lower(text), WS_CLASS + "+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(F.encode(normalized_text(text), "UTF-8"))


def winnow_fingerprints(df, k: int = 7, w: int = 4, text_col: str = "text", id_col: str = "doc_id"):
    """Winnowing document fingerprints (the MOSS rolling-hash scheme): hash
    every character k-gram, slide a window of w consecutive hashes, keep each
    window's minimum, dedupe. Guarantees: any shared substring of length
    ≥ k+w-1 between two documents yields at least one shared fingerprint —
    the local, position-robust fingerprint set that md5-of-whole-doc
    (fingerprint_md5) cannot give.

    All codegen'd built-ins: posexplode over positions, SQL substring with a
    column offset, md5 (lexicographic min over hex = deterministic and
    engine-portable, unlike numeric hash functions), one ROWS window. One
    shuffle on doc_id; output (doc_id, fp) rows.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    lowered = F.lower(F.col(text_col))
    n_grams = F.length(lowered) - (k - 1)  # k-gram count
    pos = df.select(
        F.col(id_col).alias("doc_id"),
        lowered.alias("__t"),
        F.posexplode(F.sequence(F.lit(1), F.greatest(n_grams, F.lit(0)))).alias("__i", "pos"),
    ).where(F.col("pos") >= 1)
    grams = pos.select(
        "doc_id", "pos", F.md5(F.expr(f"substring(__t, pos, {k})")).alias("__h"),
        (F.length("__t") - (k - 1)).alias("__n")
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("fp", F.min("__h").over(win))
        # Only full windows — EXCEPT for documents shorter than one full
        # window (fewer than k+w-1 chars), which keep the min over all their
        # grams (the pos==1 truncated window): the full-window-only rule
        # emitted ZERO fingerprints for them, so even byte-identical short
        # documents could never match each other (r11 review). The
        # shared-substring guarantee is unaffected; short docs simply get
        # their whole-doc minimum, standard winnowing practice. The
        # ``__n >= 1`` guard matters (r12 review): a document with NO
        # k-gram at all (text shorter than k chars, or NULL) must emit
        # ZERO fingerprints — sequence(1, greatest(n, 0)) DESCENDS to
        # [1, 0] when n <= 0, so a phantom pos=1 row reaches this filter
        # carrying the md5 of the truncated sub-k text (NULL for NULL
        # text), which no other engine's winnowing would produce.
        .where(
            (F.col("pos") <= F.col("__n") - (w - 1))
            | ((F.col("__n") < w) & (F.col("__n") >= 1) & (F.col("pos") == 1))
        )
        .select("doc_id", "fp")
        .distinct()
    )


# -- fuzzy (typo-tolerant) joining -------------------------------------------


def deletion_variants(
    df,
    col: str,
    keep_pos: bool = False,
    d_col: str = "__d",
    variant_col: str = "__variant",
):
    """One row per (input row, variant): the string itself (``d_col`` = 0)
    plus every single-character deletion (``d_col`` = position). All
    codegen'd concat/substr — fan-out is len+1, bounded by the string
    length. ``d_col``/``variant_col`` let a caller whose frame already
    uses the default working names pick non-colliding ones (a duplicate
    name would make every later reference AMBIGUOUS_REFERENCE —
    fuzzy_join_ed1 uniquifies them automatically, r14 review); colliding
    defaults raise rather than silently duplicate."""
    for working in (d_col, variant_col):
        if working in df.columns:
            raise ValueError(
                f"deletion_variants working column {working!r} already exists"
                " in the input — pass d_col=/variant_col= names that don't"
            )
    s = F.col(col)
    # Backtick-quote the identifiers inside the SQL fragment: a column named
    # with spaces/dashes/reserved words is a valid DataFrame column but an
    # invalid bare SQL identifier.
    q = f"`{col.replace('`', '``')}`"
    qd = f"`{d_col.replace('`', '``')}`"
    out = df.select(
        "*", F.explode(F.sequence(F.lit(0), F.length(s))).alias(d_col)
    ).select(
        "*",
        F.when(F.col(d_col) == 0, s)
        .otherwise(
            F.expr(f"concat(substr({q}, 1, {qd} - 1), substr({q}, {qd} + 1))")
        )
        .alias(variant_col),
    )
    return out if keep_pos else out.drop(d_col)


def fuzzy_join_ed1(left, right, left_col: str, right_col: str, suffix: str = "_right"):
    """Edit-distance-≤-1 join via SymSpell-style deletion neighborhoods.

    Two strings within one edit (insert/delete/substitute/equal) always
    share at least one member of each other's deletion neighborhood, so the
    candidate set is an EQUI-join on the variant key — never an all-pairs
    Levenshtein scan. Candidates verify with the exact JVM ``levenshtein``
    FIRST (per candidate pair, bounded by the len+1 neighborhood fan-out,
    not |L|·|R|) and the surviving pairs then dedup — a pair can share
    several variants. The standard scale path for typo-tolerant entity
    matching; distance > 1 generalizes by deleting up to d characters.

    Right-side columns colliding with left names (including
    ``right_col == left_col`` — the natural self-match call) are renamed
    with ``suffix``. Output is the DISTINCT set of matched row pairs:
    byte-identical duplicate input rows collapse (the theta join would
    multiply them) — give each side a unique id column when multiplicity
    matters."""
    rc = right_col
    taken = set(left.columns) | set(right.columns)
    for c in list(right.columns):
        if c in left.columns:
            # Pick a rename target not already taken on EITHER side (a right
            # frame holding both 'name' and 'name_right' would otherwise end
            # up with two 'name_right' columns → AMBIGUOUS_REFERENCE).
            new = f"{c}{suffix}"
            while new in taken:
                new += suffix
            taken.add(new)
            right = right.withColumnRenamed(c, new)
            if c == right_col:
                rc = new
    # Working-column names uniquified against BOTH frames (the same
    # discipline as the data-column rename loop above): a caller frame
    # already carrying __variant/__d would otherwise duplicate the name
    # and break the join/filter with AMBIGUOUS_REFERENCE (r14 review).
    vcol, dcol = "__variant", "__d"
    while vcol in taken:
        vcol += "_"
    while dcol in taken:
        dcol += "_"
    lv = deletion_variants(left, left_col, d_col=dcol, variant_col=vcol)
    rv = deletion_variants(right, rc, d_col=dcol, variant_col=vcol)
    return (
        lv.join(rv, vcol)
        .where(F.levenshtein(F.col(left_col), F.col(rc)) <= 1)
        .drop(vcol)
        .distinct()
    )


def bpe_merge_pair(toks: Column, left: str, right: str, merged: str) -> Column:
    """Apply ONE BPE merge rule to a token array: replace every greedy,
    left-to-right, non-overlapping adjacent (left, right) pair with
    ``merged``, as an ``F.aggregate`` left fold with a one-token pending
    buffer — the pending slot holds the previous unconsumed token, so an
    element can either complete a merge with it, flush it, or become the
    new pending token. Greedy non-overlap falls out of the fold order
    (after a merge the buffer is empty, so 'x x x' under ('x','x') yields
    ['xx', 'x'], matching reference BPE).

    Cost note: higher-order array functions are CodegenFallback in Spark
    (interpreted, not whole-stage codegen — the module-header promise does
    NOT hold here), but the fold is ROW-LOCAL: no shuffle, and a sequential
    left-to-right dependency that the posexplode/window alternative could
    only recover by shuffling the whole corpus by doc_id per merge rule.
    One interpreted projection per rule is the cheaper end of that trade;
    same reasoning as shingle_rows' measured note."""
    l, r, m = (F.lit(v) for v in (left, right, merged))
    empty = F.array().cast("array<string>")
    init = F.struct(empty.alias("out"), F.lit(None).cast("string").alias("pend"))

    def step(acc, x):
        flush_merge = acc["pend"].isNotNull() & (acc["pend"] == l) & (x == r)
        return (
            F.when(acc["pend"].isNull(), F.struct(acc["out"].alias("out"), x.alias("pend")))
            .when(
                flush_merge,
                F.struct(
                    F.concat(acc["out"], F.array(m)).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(F.concat(acc["out"], F.array(acc["pend"])).alias("out"), x.alias("pend"))
            )
        )

    def finish(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(toks, init, step, finish)


def bpe_learn_merges(df, n_merges: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    """Learn ``n_merges`` BPE merge rules over the corpus — the iterative
    heart of tokenizer training (vocab_bigram_counts is one iteration's
    counting step; this runs the full count→argmax→merge→recount loop).

    Each iteration: adjacent-pair counts over the CURRENT token arrays
    (posexplode + lead, one partial-aggregated shuffle), global top pair as
    a 2-row-bounded TakeOrdered (ties broken lexicographically — fully
    deterministic), then the merge applied corpus-wide with bpe_merge_pair
    (row-local fold, no shuffle). The evolving corpus is
    ``localCheckpoint(eager=False)``-ed per iteration so plan lineage stays
    constant across iterations instead of nesting n_merges folds deep —
    the same iterative-algorithm discipline as dedup_clusters. Driver
    state: one (pair, count) row per iteration. Merged tokens join with a
    space, matching the classic BPE convention of merging the SPELLINGS.

    Returns (rules_df, final_corpus_df): rules as (step, left, right,
    merged, pair_count), corpus as (doc_id, toks) after all merges."""
    spark = df.sparkSession
    cur = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
    rules = []
    # Adjacent pairs are formed ROW-LOCALLY from the token array (each of
    # the first size-1 tokens struct'd with its successor — the
    # shingle_rows shape), so the only shuffle per merge iteration is the
    # partial-aggregated pair count. The old posexplode + lead-window
    # formulation paid a full corpus exchange on doc_id per iteration just
    # to see neighbors — the exact antipattern shingle_rows documents, and
    # it contradicted this docstring's own one-shuffle claim (r14 review).
    # greatest(size-1, 0) keeps slice lengths legal for empty/1-token/NULL
    # docs (they contribute no pairs; explode drops them).
    adjacent = F.expr(
        """
        transform(
          slice(toks, 1, greatest(size(toks) - 1, 0)),
          (t, i) -> struct(t AS tok, toks[i + 1] AS nxt)
        )
        """
    )
    for step_no in range(1, n_merges + 1):
        pairs = (
            cur.select(F.explode(adjacent).alias("__p"))
            .select("__p.tok", "__p.nxt")
            .groupBy("tok", "nxt")
            .agg(F.count("*").alias("c"))
        )
        top = pairs.orderBy(F.col("c").desc(), "tok", "nxt").limit(1).collect()
        if not top:
            break
        a, b, c = top[0]["tok"], top[0]["nxt"], int(top[0]["c"])
        merged = f"{a} {b}"
        rules.append((step_no, a, b, merged, c))
        cur = cur.select(
            "doc_id", bpe_merge_pair(F.col("toks"), a, b, merged).alias("toks")
        ).localCheckpoint(eager=False)
    rules_df = spark.createDataFrame(
        rules, "step int, left string, right string, merged string, pair_count long"
    )
    return rules_df, cur
