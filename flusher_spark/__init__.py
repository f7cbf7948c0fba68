"""flusher_spark — a PySpark-native data-pipeline engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL runner (danielerapati/flusher): worksheet/range sources, CSV and
table sinks with full-refresh vs incremental semantics, a jobs control table
with human-readable refresh intervals, a job state machine and audit log —
rebuilt idiomatically on Spark DataFrames, plus a full relational query
surface and LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Unlike the reference (which authenticates and opens network clients at import
time — flusher/__init__.py:15-20, an anti-pattern we deliberately do not
replicate), importing this package has no side effects.
"""

__version__ = "0.1.0"
