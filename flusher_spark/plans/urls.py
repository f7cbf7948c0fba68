"""Synthesized-URL fixture arithmetic + canonicalization, shared between
``dedup_canonical_url`` (plans/llm.py) and the e2e corpus pipelines
(plans/corpus.py) so the two stay equivalent BY CONSTRUCTION — the e2e
docstring's claim that each stage is "the exact mechanism its standalone
entry oracle-checks" is pinned by this module, not by hand-synced copies.

``URL_SQL`` is one SQL fragment valid verbatim in BOTH engines (DuckDB
accepts STRING as a VARCHAR alias): doc_id residues mod 97 define the
canonical page; mods 2/3/5/7 add scheme/case/utm/slash noise that
canonicalization must collapse (~5 docs per canonical URL at the fixture
scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_R = "CAST(doc_id % 97 AS STRING)"

URL_SQL = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) || "
    f"(CASE doc_id % 3 WHEN 0 THEN 'WWW.Site' || {_R} || '.COM' "
    f"                 WHEN 1 THEN 'www.site' || {_R} || '.com' "
    f"                 ELSE 'site' || {_R} || '.com' END) || "
    f"'/a/' || {_R} || "
    "(CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed' ELSE '' END)"
)


def url_expr() -> Column:
    """The synthesized URL as a Spark Column (documents table in scope)."""
    return F.expr(URL_SQL)


def canonical_url_col(url) -> Column:
    """Canonicalize a URL column: utm_* tracking query dropped, host
    case-folded, 'www.' stripped, scheme http→https, trailing slash
    trimmed — each a codegen'd string/regexp op. Oracles state the same
    chain inline (regexp_replace/replace/lower nest identically in
    DuckDB)."""
    return F.regexp_replace(
        F.regexp_replace(
            F.replace(
                F.lower(F.regexp_replace(url, r"\?utm_[a-z_]+=[a-z]+$", "")),
                F.lit("://www."),
                F.lit("://"),
            ),
            r"^http://",
            "https://",
        ),
        r"/$",
        "",
    )


def keep_best_agg() -> Column:
    """Struct-argmax keep-best aggregate: longest text (n_chars) then lowest
    doc_id — a constant-memory partial aggregate (dedup_keep_best's
    discipline, never a per-key sort). Recover the winner with
    ``(-col("b.negid")).alias("doc_id")`` / ``col("b.n_chars")``."""
    return F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("negid")))
