"""Scale toolkit: co-located (bucketed) joins and skew salting.

The two shuffle levers the DataFrame API doesn't apply for you:

- **Bucketing**: pre-shuffle a fact table ONCE at write time
  (``bucketBy(key)``) so every later equi-join/aggregation on that key runs
  shuffle-free — the biggest single win for a repeatedly-joined 100 TB fact
  table. ``write_bucketed``/``read_table`` wrap the catalog round-trip;
  tests assert the join plan has no Exchange over the bucketed sides.

- **Salting**: a skewed join key (one user with 10M events) puts its entire
  key group in one task. ``salted_join`` splits each left key group across
  ``n_salt`` sub-keys (deterministic row-hash, not rand() — retries must not
  reshuffle rows) and replicates the matching right rows once per sub-key:
  parallelism × n_salt for the hot key, n_salt× duplication of only the
  right side. AQE's skew-join handles moderate skew automatically
  (session.py enables it); salting is for the pathological tail where a
  single key exceeds an executor.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    One shuffle now; every later join/groupBy on ``key`` against another
    table bucketed the same way is exchange-free (and sort-free when
    ``sort``). The bucket count is a layout contract — both join sides must
    match it."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A previous SESSION may have left the managed location behind while this
    # session's in-memory catalog has no entry for it — saveAsTable then
    # fails with LOCATION_ALREADY_EXISTS. Clear the orphan.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    # Managed-table layout: identifiers are stored lowercased, and a
    # database-qualified name lives under <db>.db/<table> — the raw string
    # would miss both (r9 review: the rmtree silently cleaned nothing for
    # 'MyEvents' or 'db.tbl' and LOCATION_ALREADY_EXISTS came back). A
    # catalog prefix ('spark_catalog.db.tbl') addresses the same location:
    # only the last two parts name the directory, and the default database
    # lives at the warehouse ROOT, not under default.db/.
    parts = table.lower().split(".")
    db = parts[-2] if len(parts) >= 2 else "default"
    rel = parts[-1] if db == "default" else os.path.join(f"{db}.db", parts[-1])
    path = os.path.join(warehouse.removeprefix("file:"), rel)
    shutil.rmtree(path, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: plans as a
    SortMergeJoin with NO Exchange on either side (asserted in
    tests/test_operators.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: split each left key group over ``n_salt``
    deterministic sub-keys and replicate right rows across all of them.

    Exactly equal to ``left.join(right, on, how)`` for inner/left joins:
    each left row carries ONE salt value, and the right side has exactly one
    replica per salt value, so no duplicates and no losses. The salt is a
    hash of the left row's hashable columns — deterministic under task
    retries (rand() would re-deal rows between attempts and can
    drop/duplicate under speculative execution). Map-typed columns are
    excluded (``hash`` rejects MapType at analysis time); if ALL columns
    are map-typed the salt falls back to 0 — correct, just unsalted.
    Caveat: BYTE-IDENTICAL hot-key rows share a salt by construction — a
    deterministic row hash cannot separate them; project in any
    distinguishing column (an id, an offset) before salting if the hot key
    is fully duplicated."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if n_salt < 1:
        # Loud at call time (the zorder_key guard class, r14 review): with
        # n_salt=0 the replication array is empty, so explode drops every
        # right row, and pmod(hash, 0) dies mid-job with DIVIDE_BY_ZERO
        # under the repo's ANSI sessions — a late, cryptic failure for a
        # caller-side mistake.
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    # Exclude maps at ANY nesting depth (array<map<...>>, struct fields):
    # F.hash rejects MapType wherever it appears in the type tree.
    hashable = [
        F.col(c) for c, t in left.dtypes if "map<" not in t
    ]
    salt = (
        F.pmod(F.hash(*hashable), F.lit(n_salt)) if hashable else F.lit(0)
    )
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    return lhs.join(rhs, [on, "__salt"], how).drop("__salt")


def zorder_key(cols: list, bits: int = 8):
    """Morton (Z-order) interleave of ``len(cols)`` already-normalized
    integer columns — the multi-dimensional clustering key behind
    lakehouse OPTIMIZE ZORDER: range-partitioning + sorting by this key
    groups rows that are close in EVERY dimension into the same files, so
    per-file min/max statistics prune scans filtered on ANY of the
    dimensions (a lexicographic sort only prunes its leading column).

    Inputs must already be normalized to [0, 2^bits) longs (see
    ``normalize_to_bits`` — integer arithmetic, so the key is a pure
    deterministic function reproducible in ANSI SQL). The interleave is a
    statically generated codegen'd expression: bit b of column j lands at
    output bit b*len(cols)+j — ``bits × len(cols)`` shift/mask/or terms,
    no Python at row time.

    Width safety (r11 review): the key must fit a SIGNED long, so
    ``bits × len(cols) > 63`` raises instead of silently wrapping, and
    every input is cast to long before shifting — Spark's shiftleft keeps
    the INPUT's integer width, so a raw IntegerType column would hit the
    sign bit at position 31 and wrap shift counts mod 32, landing bits
    from different dimensions on the same output position (distinct
    coordinates colliding on one key = clustering silently broken)."""
    n = len(cols)
    if n < 1 or bits < 1:
        # Loud at the API, not an unexplained IndexError at terms[0] (r13
        # review): zorder over zero columns / zero bits is always misuse.
        raise ValueError(f"zorder_key needs >= 1 column and >= 1 bit (got {n} cols, {bits} bits)")
    if bits * n > 63:
        raise ValueError(
            f"zorder_key width {bits}*{n}={bits * n} bits exceeds a signed "
            "long (63 usable bits) — lower bits or split the column set"
        )
    terms = []
    for j, c in enumerate(cols):
        expr = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            terms.append(F.shiftleft(F.shiftright(expr, b).bitwiseAND(F.lit(1)), b * n + j))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def normalize_to_bits(col, vmin, vmax, bits: int = 8):
    """Map an integer column with known [vmin, vmax] bounds (columns or
    literals — e.g. a broadcast 1-row global min/max) onto [0, 2^bits) via
    (v − min)·(2^bits − 1) div (max − min), computed exactly: the numerator
    is integer, and the division subtracts ``pmod`` first so the double
    divide is of an exact multiple — exact for numerators < 2^53 (inputs up
    to ~3.5e13 at bits=8; the fixture keys are ≤1e6). Engine-portable — the
    oracle states the same arithmetic with DuckDB's ``//`` — which is what
    lets the z-order key be oracle-checked bit-for-bit."""
    top = F.lit((1 << bits) - 1)
    lo = F.lit(vmin) if isinstance(vmin, int) else vmin
    hi = F.lit(vmax) if isinstance(vmax, int) else vmax
    c = F.col(col) if isinstance(col, str) else col
    span = (hi - lo).cast("long")
    num = ((c.cast("long") - lo.cast("long")) * top).cast("long")
    exact_div = ((num - F.pmod(num, span)) / span).cast("long")
    return F.when(span > 0, exact_div).otherwise(F.lit(0))
