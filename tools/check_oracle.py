"""Local stand-in for the driver's correctness harness.

Runs every catalog entry's Spark plan and (when present) its DuckDB oracle on
the same parquet tables, then compares row count, column names, and an
order-insensitive canonical value dump. Stricter than the driver can be
assumed to be: floats must repr() identically after float() coercion.

Usage: python tools/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flusher_spark.io.tables import TABLES
from flusher_spark.plans.catalog import registry
from flusher_spark.session import get_session


def _type_family(arrow_type: str) -> str | None:
    """Coarse type family for a DuckDB-arrow type string. Families are the
    granularity at which a type-aware value hash can diverge: int64 vs
    int128/decimal, float vs decimal, etc. Returns None for types we don't
    police (strings, dates, lists, structs — those round-trip identically)."""
    t = arrow_type.lower()
    if t in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32"):
        return "int"
    if t in ("uint64", "int128") or t.startswith("decimal"):
        return "bigdecimal"
    if t in ("float", "double", "halffloat", "float32", "float64"):
        return "float"
    if t == "bool":
        return "bool"
    return None


def _spark_type_family(spark_type: str) -> str | None:
    t = spark_type.lower()
    if t in ("tinyint", "smallint", "int", "bigint", "byte", "short", "integer", "long"):
        return "int"
    if t.startswith("decimal"):
        return "bigdecimal"
    if t in ("float", "double"):
        return "float"
    if t == "boolean":
        return "bool"
    return None


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_value(r[i]) for i in idx) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2:]
    spark = get_session("oracle_check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    entries = registry()
    failures = []
    for name, entry in sorted(entries.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = entry.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        if entry.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (rows-only check) [{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"  WARNING: {name} returned 0 rows")
            continue
        try:
            ores = con.sql(entry.oracle)
            ocols = [c.lower() for c in ores.columns]
            oschema = ores.arrow().schema
            orows = ores.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        sc = [c.lower() for c in scols]
        ok = True
        # Physical-type parity: the driver's value hash is type-aware (an
        # uncast DuckDB SUM is HUGEINT/int128 while Spark emits int64, and
        # the values hash differently even when they stringify identically —
        # the round-4 failure mode). Compare arrow-level type families.
        try:
            sarrow_schema = {f.name.lower(): f.dataType.simpleString() for f in sdf.schema.fields}
            for fname, ftype in zip(oschema.names, oschema.types):
                st = sarrow_schema.get(fname.lower())
                ot = str(ftype)
                fam_o = _type_family(ot)
                fam_s = _spark_type_family(st) if st else None
                if fam_s and fam_o and fam_s != fam_o:
                    print(
                        f"TYPE  {name}: column '{fname}' spark={st}({fam_s}) "
                        f"oracle={ot}({fam_o}) — driver hash will differ"
                    )
                    ok = False
        except Exception:
            traceback.print_exc()
        if sorted(sc) != sorted(ocols):
            print(f"FAIL  {name}: columns differ spark={sorted(sc)} oracle={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            ok = False
        else:
            s_canon = canon_rows(scols, [tuple(r) for r in srows])
            o_canon = canon_rows(ores.columns, orows)
            if s_canon != o_canon:
                diffs = [(a, b) for a, b in zip(s_canon, o_canon) if a != b]
                print(f"FAIL  {name}: {len(diffs)} differing rows of {len(s_canon)}")
                for a, b in diffs[:3]:
                    print(f"  spark : {a}\n  oracle: {b}")
                ok = False
        if ok:
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
