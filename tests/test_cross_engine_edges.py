"""Cross-engine boundary tests for the razor-edge classes the round-3 driver
hit: whitespace-class tokenizer divergence (Java \\s includes \\x0B, RE2's
does not), double->long cast semantics (Spark truncates, DuckDB rounds), and
the exact-integer z-score threshold. Each test runs BOTH engines on the same
adversarial micro-fixture — not the clean driver fixtures — so the edge is
actually exercised.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from flusher_spark.operators.text import bpe_ish_token_count, n_tokens, normalized_text

# Texts chosen so every whitespace character Java's \s covers appears, plus
# unicode spaces NEITHER engine's class covers (must count as token chars).
EDGE_TEXTS = [
    "plain text here",
    "tab\tsep",
    "newline\nsep",
    "vertical\x0btab",  # THE divergent char between Java \s and RE2 \s
    "formfeed\x0csep",
    "carriage\rreturn",
    "nbsp joined",  # NBSP: not whitespace in either engine's class
    "thin space",
    " \x0b \t mixed \r\n edges \x0c ",
    "",
    "   ",
    "\x0b",
]

# The r11 canonical forms (collapse-then-trim; see operators/text.py
# normalized_text) — must stay byte-identical to plans/llm.py _TOKENS_SQL /
# _NORM_SQL modulo the column name.
_TOKENS_SQL = r"string_split(trim(regexp_replace(lower(t), '[ \t\n\x0b\f\r]+', ' ', 'g')), ' ')"
_NORM_SQL = r"trim(regexp_replace(lower(t), '[ \t\n\x0b\f\r]+', ' ', 'g'))"


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(EDGE_TEXTS)], "i long, t string")


def _duck(sql: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", list(enumerate(EDGE_TEXTS)))
    return con.sql(sql).fetchall()


def test_token_count_matches_duckdb_on_exotic_whitespace(edge_df):
    got = {
        r["i"]: r["n"]
        for r in edge_df.select("i", n_tokens(F.col("t")).alias("n")).collect()
    }
    want = dict(_duck(f"SELECT i, CAST(len({_TOKENS_SQL}) AS BIGINT) FROM docs ORDER BY i"))
    assert got == want


def test_normalized_text_matches_duckdb_on_exotic_whitespace(edge_df):
    got = {
        r["i"]: r["nt"]
        for r in edge_df.select("i", normalized_text(F.col("t")).alias("nt")).collect()
    }
    want = dict(_duck(f"SELECT i, {_NORM_SQL} FROM docs ORDER BY i"))
    assert got == want


def test_bpe_ish_count_matches_duckdb_on_exotic_whitespace(edge_df):
    got = {
        r["i"]: r["n"]
        for r in edge_df.select("i", bpe_ish_token_count(F.col("t")).alias("n")).collect()
    }
    want = dict(
        _duck(
            "SELECT i, CAST(len(regexp_extract_all(lower(t),"
            " '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]')) AS BIGINT) FROM docs ORDER BY i"
        )
    )
    assert got == want


def test_floor_cast_boundary_matches_duckdb():
    """Spark's double->long cast truncates; DuckDB's CAST rounds to nearest.
    Every keep_below-style boundary MUST therefore go through floor() on both
    sides (plans/llm.py corpus_mix_apply). Prove the raw divergence exists
    AND that the floor()ed form agrees, so a future edit that drops the
    floor() re-breaks this test, not the driver."""
    fracs = [0.1234565, 0.9999995, 0.5, 1.0, 0.3333335, 0.0000005]
    con = duckdb.connect()
    # CAST the literal to DOUBLE first: a bare literal types as DECIMAL in
    # DuckDB, which would exercise decimal-exact rounding instead of the
    # DOUBLE→BIGINT divergence the production path (double columns) hits.
    raw = [
        con.sql(f"SELECT CAST(CAST({f} AS DOUBLE) * 1000000 AS BIGINT)").fetchone()[0]
        for f in fracs
    ]
    floored = [
        con.sql(
            f"SELECT CAST(FLOOR(CAST({f} AS DOUBLE) * 1000000) AS BIGINT)"
        ).fetchone()[0]
        for f in fracs
    ]
    spark_trunc = [int(f * 1_000_000) for f in fracs]  # Spark cast('long') semantics
    assert raw != spark_trunc, "DuckDB no longer rounds — revisit the floor() rationale"
    assert floored == spark_trunc


def test_zscore_exact_inequality_matches_double_formulation(spark):
    """The exact-integer threshold test 4*(n*cv-s1)^2*(n-1) > 25*n*(n*s2-s1^2)
    must agree with the double |z|>2.5 formulation away from the boundary,
    and be total (no NaN/inf surprises) on degenerate groups."""
    rows = [
        ("a", 1.00), ("a", 1.00), ("a", 1.00), ("a", 100.00),  # clear outlier
        ("b", 5.00), ("b", 5.00), ("b", 5.00),                  # zero variance
        ("c", 7.25),                                            # n == 1
        ("d", 1.00), ("d", 2.00), ("d", 3.00), ("d", 4.00),     # no outliers
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    d38 = "decimal(38,0)"
    cv = (F.col("value").cast("decimal(8,2)") * 100).cast("long")
    ev = df.select("event_type", cv.alias("cv"), "value")
    n = F.count("*").over(w)
    s1 = F.sum("cv").over(w).cast(d38)
    s2 = F.sum(F.col("cv") * F.col("cv")).over(w).cast(d38)
    dev = n.cast(d38) * F.col("cv").cast(d38) - s1
    lhs = F.lit(4).cast(d38) * dev * dev * (n - F.lit(1)).cast(d38)
    rhs = F.lit(25).cast(d38) * n.cast(d38) * (n.cast(d38) * s2 - s1 * s1)
    got = {
        (r["event_type"], r["value"]): r["flag"]
        for r in ev.select(
            "event_type", "value", F.when(lhs > rhs, 1).otherwise(0).alias("flag")
        ).collect()
    }
    import statistics

    by_group: dict[str, list[float]] = {}
    for t, v in rows:
        by_group.setdefault(t, []).append(v)
    for (t, v), flag in got.items():
        vals = by_group[t]
        if len(vals) < 2 or statistics.pstdev(vals) == 0:
            expect = 0
        else:
            z = (v - statistics.mean(vals)) / statistics.stdev(vals)
            expect = 1 if abs(z) > 2.5 else 0
        assert flag == expect, (t, v, flag, expect)


def test_zscore_threshold_matches_decimal_reference_on_boundaries(spark):
    """r15: events_zscore_outliers' per-row compare became |n·cv − s1| ≥ t
    with t = isqrt(R div K) + 1 computed in exact Python integers (K =
    4(n−1), R = 25n(n·s2 − s1²)). Two layers pinned here:

    1. the DERIVATION, exhaustively at every boundary: for all small
       (R, K, a), K·a² > R ⟺ a ≥ isqrt(R // K) + 1 — including K | R,
       a² == R//K, and a² == R//K + 1;
    2. the ENTRY, bit-equal to the verbatim r14 decimal(38) join
       formulation on a frame with a zero-variance group, an n==1 group,
       NULL values, a NULL event_type, and a clear outlier."""
    import math

    for R in range(0, 401):
        for K in range(1, 18):
            t = math.isqrt(R // K) + 1
            for a in range(0, 25):
                assert (K * a * a > R) == (a >= t), (R, K, a, t)

    # Group "a": 8×0 plus one 90 — sample z = 80/30 ≈ 2.67 > 2.5, a real
    # flag (with one extreme value the max reachable |z| is (n−1)/√n, so
    # n must be ≥ 9 for any flag at all).
    rows = [*(("a", 0.00) for _ in range(8)), ("a", 90.00),
        ("b", 5.00), ("b", 5.00), ("b", 5.00),
        ("c", 7.25),
        ("d", 1.00), ("d", 2.00), ("d", 3.00), ("d", 4.00),
        ("e", None), ("e", 2.00), ("e", 2.00), ("e", -50.25),
        (None, 3.00), (None, 3.50),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")

    import flusher_spark.plans.relational as R_

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            tuple(r)
            for r in R_.events_zscore_outliers(spark, td).collect()
        }

    # Verbatim r14 decimal(38) reference (the join form the entry shipped
    # before the threshold rewrite).
    d38 = "decimal(38,0)"
    cv = (F.col("value").cast("decimal(8,2)") * 100).cast("long")
    ev = df.select("event_type", cv.alias("cv"))
    sq = F.col("cv") * F.col("cv")
    n = F.col("n")
    stats = (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("cv").alias("s1l"),
            F.sum(F.shiftright(sq, 32)).alias("s2q"),
            F.sum(sq.bitwiseAND(F.lit(4294967295))).alias("s2r"),
        )
        .withColumn("s1", F.col("s1l").cast(d38))
        .withColumn(
            "s2",
            F.lit(4294967296).cast(d38) * F.col("s2q").cast(d38) + F.col("s2r").cast(d38),
        )
        .withColumn(
            "rhs",
            F.lit(25).cast(d38) * n.cast(d38)
            * (n.cast(d38) * F.col("s2") - F.col("s1") * F.col("s1")),
        )
        .select("event_type", "n", "s1", "rhs")
    )
    j = ev.join(F.broadcast(stats), "event_type")
    dev = n.cast(d38) * F.col("cv").cast(d38) - F.col("s1")
    lhs = F.lit(4).cast(d38) * dev * dev * (n - F.lit(1)).cast(d38)
    ref = {
        tuple(r)
        for r in j.select(
            "event_type", n.alias("n"),
            F.when(lhs > F.col("rhs"), 1).otherwise(0).alias("f"),
        )
        .groupBy("event_type")
        .agg(F.min("n").alias("n"), F.sum("f").alias("outlier_cnt"))
        .orderBy("event_type")
        .collect()
    }
    assert got == ref
    # and the clear outlier really flags (guards against an all-zero wash)
    assert ("a", 9, 1) in got


def test_integer_div_matches_duckdb_including_negatives(spark):
    """Spark's `div` truncates toward zero, and — measured here, contrary
    to what 'floor division' syntax suggests — DuckDB's integer `//` ALSO
    truncates toward zero ((-7)//2 = -3, not -4). So every rank/bucket
    expression in the round-5 entries (winsorize's (n+9) div 10, MAD's
    (n+1) div 2, the histogram's (cv-lo)*10 div (hi-lo+1)) is portable
    even at signed inputs; all of them additionally keep numerators
    non-negative by construction, which this test pins on the exact
    boundary cases."""
    cases = [(0, 10), (1, 10), (9, 10), (10, 10), (19, 10), (7, 64), (12345, 64), (-7, 2), (7, -2)]
    df = spark.createDataFrame(cases, "a long, b long")
    got = {
        (r["a"], r["b"]): r["q"]
        for r in df.selectExpr("a", "b", "a div b AS q").collect()
    }
    con = duckdb.connect()
    for a, b in cases:
        assert got[(a, b)] == con.sql(f"SELECT ({a}) // ({b})").fetchone()[0], (a, b)
    assert got[(-7, 2)] == -3  # truncation, both engines


def test_business_day_prefix_formula_matches_calendar():
    """The closed-form weekday prefix count scalar_business_days uses
    (5*whole-weeks + clamped Thu-anchored partial week) is implemented
    IDENTICALLY in the Spark entry and its DuckDB oracle — so the hash
    gate cannot catch a bug in the formula itself. This validates the
    math against the calendar (datetime.weekday) over random intervals,
    including ship-before-order (negative) spans the fixtures never hit."""
    import datetime as dt
    import random

    def prefix(e: int) -> int:
        # Mirror of plans/relational.py::scalar_business_days prefix_weekdays.
        return 5 * ((e - e % 7) // 7) + min(e % 7, 2) + max(e % 7 - 4, 0)

    def naive(d1: dt.date, d2: dt.date) -> int:
        n, d = 0, d1
        while d < d2:
            n += d.weekday() < 5
            d += dt.timedelta(days=1)
        return n

    epoch = dt.date(1970, 1, 1)
    rng = random.Random(1)
    for _ in range(500):
        a = epoch + dt.timedelta(days=rng.randint(0, 20000))
        b = a + dt.timedelta(days=rng.randint(-30, 300))
        got = prefix((b - epoch).days) - prefix((a - epoch).days)
        want = naive(a, b) if b >= a else -naive(b, a)
        assert got == want, f"{a}..{b}: formula {got} != calendar {want}"


def test_local_sql_twins_match_plans_constants():
    """The module-local _TOKENS_SQL/_NORM_SQL above exist to run on the `t`
    column; they must stay byte-identical to the plans-layer constants
    (modulo the column name) or these edge tests silently stop testing the
    production forms — exactly how the r11 tokenization fix briefly left
    them pinning the OLD artifact."""
    from flusher_spark.plans import llm

    assert llm._NORM_SQL.replace("lower(text)", "lower(t)") == _NORM_SQL
    assert llm._TOKENS_SQL.replace("lower(text)", "lower(t)") == _TOKENS_SQL


def test_null_text_concat_parity_pii_and_html(spark):
    """r12 review: Spark's concat NULL-PROPAGATES while DuckDB's SKIPS
    NULL arguments, so any synthesized-column entry concat'ing raw text
    diverges the engines the moment a fixture carries a NULL text. The
    corpus entries guard with coalesce(text, '') on BOTH sides — this
    test runs both engines on a NULL-text micro-fixture and requires
    byte-identical augmented strings."""
    import duckdb as _dd

    from flusher_spark.plans.corpus import _aug_pii

    rows = [(1, "hello world"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["t"]
        for r in df.selectExpr("doc_id", f"{_aug_pii(True)} as t").collect()
    }
    con = _dd.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = dict(
        con.sql(f"SELECT doc_id, {_aug_pii(False)} FROM documents ORDER BY doc_id").fetchall()
    )
    assert got == want
    assert got[2] is not None and "@example.com" in got[2]  # NULL text guarded


def test_dup_rate_counts_null_text_docs(spark):
    """r12 review: the dup-rate report's md5 equi-join silently dropped
    NULL-text documents in BOTH engines (invisible to the hash gate). The
    per-doc 'N:' disambiguator keeps them as singleton non-dup rows."""
    from flusher_spark.plans.corpus import corpus_dup_rate_by_source

    import os
    import tempfile

    rows = [
        (1, "same", "a"), (2, "same", "a"),  # one dup pair
        (3, None, "a"),  # NULL text: counted, never a dup
        (4, None, "b"),
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    got = {
        r["source"]: (r["n_docs"], r["n_dup_docs"])
        for r in corpus_dup_rate_by_source(spark, d).collect()
    }
    assert got == {"a": (3, 2), "b": (1, 0)}
