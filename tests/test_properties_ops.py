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
