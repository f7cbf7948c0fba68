"""Property-based tests for the custom join/ranking operators: on random
small inputs, the distributed formulations must agree exactly with their
naive single-node twins. Example counts are small — each example runs real
Spark jobs — but the input space (duplicates, empty sides, ties, intervals
spanning many bins) is exactly where hand-written cases miss."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

points = st.lists(st.integers(min_value=0, max_value=3600), min_size=0, max_size=25)
intervals = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3600), st.integers(min_value=1, max_value=7200)),
    min_size=0,
    max_size=15,
)


@given(points=points, ivals=intervals)
@settings(**SETTINGS)
def test_range_join_equals_naive(spark, points, ivals):
    from flusher_spark.operators.rangejoin import range_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=p)) for i, p in enumerate(points)] or [(0, None)],
        "lid long, ts timestamp",
    ).where(F.col("ts").isNotNull())
    right = spark.createDataFrame(
        [
            (j, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + d))
            for j, (s, d) in enumerate(ivals)
        ]
        or [(0, None, None)],
        "rid long, s timestamp, e timestamp",
    ).where(F.col("s").isNotNull())

    got = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, "ts", "s", "e", bin_width="10 minutes").collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .where((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .collect()
    }
    assert got == naive


@given(
    vals=st.lists(
        st.tuples(st.integers(min_value=-5, max_value=5), st.integers(min_value=0, max_value=10**6)),
        min_size=1,
        max_size=40,
    ),
    n=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_global_ntile_equals_window(spark, vals, n):
    from flusher_spark.operators.ranking import with_global_ntile

    # (value, uid) — uid makes the order total even with duplicate values.
    rows = [(v, i) for i, (v, _) in enumerate(vals)]
    df = spark.createDataFrame(rows, "v long, uid long")
    got = {
        (r["uid"], r["b"])
        for r in with_global_ntile(df, ["v", "uid"], n, out="b").collect()
    }
    w = Window.orderBy("v", "uid")
    expected = {
        (r["uid"], r["b"])
        for r in df.withColumn("b", F.ntile(n).over(w).cast("long")).collect()
    }
    assert got == expected


# -- substring dedup vs naive -------------------------------------------------

_docs_strategy = st.lists(
    st.lists(st.sampled_from("abcd"), min_size=0, max_size=20),
    min_size=2,
    max_size=5,
)


@given(docs=_docs_strategy)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_substring_dup_spans_equals_naive(spark, docs):
    """Differential check of the whole substring-dedup contract against an
    O(n^2) single-node twin on random tiny-vocabulary corpora (a 4-symbol
    vocabulary makes shared k-grams — including the overlapping-passage
    interleavings the r9 review caught — common instead of adversarial):
    per document, the spans' token union must equal the brute-force set of
    positions covered by any >=2-doc anchor window, spans must never
    overlap, sum(n_tok) must equal the covered-set size, and
    remove_dup_spans must emit exactly the uncovered tokens in order."""
    from flusher_spark.operators.dedup import remove_dup_spans, substring_dup_spans

    k = 3
    # Naive twin: inverted index of k-gram -> distinct docs, then the union
    # of every duplicated anchor's token window.
    gram_docs: dict[tuple, set] = {}
    for d, toks in enumerate(docs):
        for i in range(len(toks) - k + 1):
            gram_docs.setdefault(tuple(toks[i : i + k]), set()).add(d)
    covered = {d: set() for d in range(len(docs))}
    for d, toks in enumerate(docs):
        for i in range(len(toks) - k + 1):
            if len(gram_docs[tuple(toks[i : i + k])]) >= 2:
                covered[d].update(range(i, i + k))

    df = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    spans = substring_dup_spans(df, k=k, min_docs=2)
    by_doc: dict[int, list] = {}
    for r in spans.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["start_tok"], r["end_tok"], r["n_tok"]))
    for d, toks in enumerate(docs):
        got = sorted(by_doc.get(d, []))
        union: set = set()
        for s, e, n in got:
            assert n == e - s + 1
            assert not (union & set(range(s, e + 1))), f"doc {d}: overlapping spans {got}"
            union.update(range(s, e + 1))
        assert union == covered[d], f"doc {d}: span union != naive covered set"
        assert sum(n for _, _, n in got) == len(covered[d])

    masked = {r["doc_id"]: r["text"] for r in remove_dup_spans(df, spans).collect()}
    for d, toks in enumerate(docs):
        expect = " ".join(t for i, t in enumerate(toks) if i not in covered[d])
        assert masked[d] == expect, f"doc {d}: masked text != naive uncovered tokens"


# -- nearest as-of vs naive ---------------------------------------------------


@given(
    lefts=st.lists(st.tuples(st.integers(1, 2), st.integers(0, 40)), min_size=1, max_size=12),
    rights=st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 40), st.integers(0, 9)),
        min_size=0,
        max_size=12,
    ),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_asof_nearest_fractional_equals_naive(spark, lefts, rights):
    """asof_join_nearest on FRACTIONAL (double, quarter-unit grid)
    timestamps against a naive twin implementing the documented contract:
    back = latest rt <= t (ties to largest payload), fwd = smallest rt > t
    (ties to largest payload), pick the closer within tolerance, distance
    ties prefer the prior row. The quarter grid makes sub-unit distances,
    exact equidistance, and equal-rt payload ties all common — the space
    where the r9 truncation defect lived."""
    from flusher_spark.operators.asof import asof_join_nearest

    tol = 2.0
    lrows = [(i, k, q / 4.0) for i, (k, q) in enumerate(lefts)]
    rrows = [(k, q / 4.0, v) for (k, q, v) in rights]

    def naive(k, t):
        back = [(rt, rv) for (rk, rt, rv) in rrows if rk == k and rt <= t]
        fwd = [(rt, rv) for (rk, rt, rv) in rrows if rk == k and rt > t]
        b = max(back) if back else None          # max rt, then max payload
        f = min(fwd, key=lambda p: (p[0], -p[1])) if fwd else None  # min rt, max payload
        b_ok = b is not None and t - b[0] <= tol
        f_ok = f is not None and f[0] - t <= tol
        if b_ok and (not f_ok or t - b[0] <= f[0] - t):
            return b
        return f if f_ok else None

    left = spark.createDataFrame(lrows, "lid long, k long, t double")
    right = spark.createDataFrame(rrows or [(0, None, None)], "k long, rt double, rv long").where(
        F.col("rt").isNotNull()
    )
    got = {
        r["lid"]: (r["rt_right"], r["rv_right"])
        for r in asof_join_nearest(left, right, ["k"], "t", "rt", tolerance_us=tol).collect()
    }
    for lid, k, t in lrows:
        assert got[lid] == (naive(k, t) or (None, None)), (
            f"lid={lid} k={k} t={t}: got {got[lid]}, naive {naive(k, t)}"
        )


_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=11),
        st.integers(min_value=0, max_value=11),
    ),
    min_size=1,
    max_size=24,
)


@given(edges=_edges_strategy, iters=st.integers(min_value=1, max_value=3))
@settings(**SETTINGS)
def test_label_propagation_equals_python_reference(spark, edges, iters):
    """On random small graphs (self-loops, duplicate/bidirected edges,
    multiple components, tie-heavy label counts), deterministic sync LPA
    must agree exactly with a pure-Python simulation of its definition —
    the tie/oscillation space is exactly what a hand-written case misses."""
    from collections import Counter, defaultdict

    from flusher_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"] for r in label_propagation(df, iters=iters).collect()}

    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    # Node set from the RAW edges (r14: a self-loop-only node has an edge —
    # the documented contract — and keeps its own label every round, having
    # no non-self neighbor to adopt from).
    nodes = {n for e in edges for n in e}
    lab = {n: n for n in nodes}
    for _ in range(iters):
        nxt = {}
        for n in nodes:
            if adj[n]:
                cnt = Counter(lab[m] for m in adj[n])
                best = max(cnt.values())
                nxt[n] = min(l for l, c in cnt.items() if c == best)
            else:
                nxt[n] = n
        lab = nxt
    assert got == lab
