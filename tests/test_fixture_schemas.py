"""Loud guard against driver fixture regeneration drift.

The driver regenerates /root/testdata between rounds and has already shipped
``events.ts`` under two different physical encodings (INT64 TIMESTAMP(NANOS),
then timestamp[us]/NTZ) — a silent change that once broke 4 correctness
entries, 13 tests, and an entire bench round. This test pins the LOGICAL
expectations per table and enumerates the physical encodings
``io/tables.py::normalize_event_ts`` knows how to canonicalize; a third
encoding fails HERE, by name, instead of 13 tests deep.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flusher_spark.io.tables import TABLES
from tests.conftest import SF_DIR, SF_DIR_BIG, SF_DIR_MED

SF_DIRS = [SF_DIR, SF_DIR_MED, SF_DIR_BIG]

#: Physical arrow types normalize_event_ts can canonicalize for events.ts.
KNOWN_TS_ENCODINGS = {
    pa.int64(),  # INT64 TIMESTAMP(NANOS) read under nanosAsLong
    pa.timestamp("ns"),
    pa.timestamp("us"),  # NTZ on the Spark side
    pa.timestamp("us", tz="UTC"),
}

#: Columns every plan assumes exist, per table (names only — dtypes for the
#: hot columns are asserted separately below).
REQUIRED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        # etl_content_checksum / etl_schema_evolution_merge / etl_snapshot_expire_vacuum
        "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "user_id", "event_type", "ts", "value"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", TABLES)
def test_fixture_has_required_columns(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    assert os.path.exists(path), f"driver fixture missing: {path}"
    schema = pq.read_schema(path)
    cols = REQUIRED_COLUMNS.get(table)
    assert cols is not None, (
        f"add {table!r} to REQUIRED_COLUMNS (new table in io/tables.py TABLES)"
    )
    missing = cols - set(schema.names)
    assert not missing, f"{path}: driver dropped columns {sorted(missing)}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_encoding_is_known(sf_dir):
    t = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    assert t in KNOWN_TS_ENCODINGS, (
        f"events.ts arrived as NEW physical type {t!r} — extend "
        "flusher_spark/io/tables.py::normalize_event_ts (and this list) "
        "before anything else this round; see the round-2 NTZ incident."
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_hot_column_dtypes(sf_dir):
    """Dtypes the exact-arithmetic entries depend on."""
    def typ(table, col):
        return pq.read_schema(os.path.join(sf_dir, f"{table}.parquet")).field(col).type

    assert pa.types.is_floating(typ("events", "value")) or pa.types.is_decimal(
        typ("events", "value")
    ), "events.value changed away from float/decimal — z-score cv scaling breaks"
    assert pa.types.is_integer(typ("documents", "doc_id"))
    assert pa.types.is_string(typ("documents", "text")) or pa.types.is_large_string(
        typ("documents", "text")
    )
    emb = typ("embeddings", "embedding")
    assert pa.types.is_list(emb) and pa.types.is_floating(emb.value_type), (
        f"embeddings.embedding is {emb!r} — similarity fold SQL assumes list<float>"
    )
