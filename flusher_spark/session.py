"""SparkSession construction and per-session configuration.

The engine never creates sessions at import time (the reference's import-time
auth side effect, flusher/__init__.py:20, is a documented anti-pattern).
``get_session`` builds a locally-tuned session; ``configure`` applies the
runtime confs the engine needs to any externally-provided session (e.g. the
driver harness owns its own SparkSession and only lends it to us).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable SQL confs the engine relies on. Applied defensively in
#: `configure` because entry points may receive a session we did not build.
RUNTIME_CONFS = {
    # events.parquet carries nanosecond timestamps; Spark 4 refuses them
    # unless they are surfaced as raw longs (we convert to µs ourselves).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Oracle comparisons (DuckDB) use UTC-naive timestamps.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing + skew-join splitting — essential at scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Post-shuffle partition target: 64 MB keeps a partition's working set
    # well inside executor memory even with wide rows and agg buffers (the
    # 100 TB sizing lever the brief calls out; AQE coalesces up to it).
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    # Arrow transfer for the pandas-UDF operators (similarity, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Conf not settable at runtime on this build — rely on defaults.
            pass
    return spark


def _launcher_owns_master() -> bool:
    """True when an external launcher (spark-submit / a managed runtime)
    already owns --master and --driver-memory: the py4j gateway env vars
    are its signature — the JVM driver exists before this process starts.
    Builder-set values would silently OVERRIDE the launcher's (a YARN
    submit used to run local[N] on the driver host; r14 review)."""
    return "PYSPARK_GATEWAY_PORT" in os.environ


def get_session(app_name: str = "flusher_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a session tuned for local testing.

    On a real cluster the same code runs unchanged — only master/memory come
    from spark-submit instead. Shuffle partitions default to the core count:
    the 200-partition default over-parallelizes local runs and the AQE
    coalescer handles the scale-up direction.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    builder = SparkSession.builder.appName(app_name)
    if not _launcher_owns_master():
        # Standalone python process (tests, bench, CLI): provide the local
        # master and driver memory ourselves. Under spark-submit the gateway
        # env vars are set and the JVM driver ALREADY exists with
        # --master/--driver-memory applied; builder-set values would
        # silently override them — .master() on a YARN submit used to run
        # the whole job local[N] on the driver host (r14 review).
        builder = builder.master(f"local[{cpus}]").config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        # Progress bars interleave \r into stdout of CLI tools (bench,
        # check_oracle) whose output is machine-parsed.
        .config("spark.ui.showConsoleProgress", "false")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
