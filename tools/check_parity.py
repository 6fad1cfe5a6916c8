"""Local mirror of the driver's correctness gate.

Runs every registered query through Spark AND its oracle SQL through
DuckDB on the same parquet tables, then compares:
  1. oracle result TYPES (must lie inside Spark's emitting set — see
     ``oracle_type_violations``),
  2. row count,
  3. column-name sets,
  4. order-insensitive values (columns sorted by name, rows sorted by
     canonical string form, exact match after canonicalization).

Usage:
    python tools/check_parity.py [--sf /root/testdata/sf0.01] [qkey ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pipeline_airflow_docker_spark import plans  # noqa: E402
from pipeline_airflow_docker_spark.catalog import TABLES  # noqa: E402
from pipeline_airflow_docker_spark.session import get_spark  # noqa: E402


# ------------------------------------------------------------------
# Oracle type strictness. Round 4 lesson: this mirror compared values
# through ``fetchall()``, where a DuckDB HUGEINT (int128 — what DuckDB
# widens every un-CAST integer SUM to) arrives as a plain Python int,
# so five oracles passed locally while the driver's hasher, which
# canonicalizes through column TYPES, failed them. The mirror is now
# strictly harder than the driver on types: any oracle column whose
# DuckDB type lies outside the set Spark can emit fails HERE, before
# values are even fetched.
#
# Allowed = the DuckDB types with an exact Spark counterpart:
#   BOOLEAN, TINYINT/SMALLINT/INTEGER/BIGINT, FLOAT/DOUBLE,
#   DECIMAL(p<=38,s), VARCHAR, BLOB, DATE, TIMESTAMP[ WITH TIME ZONE],
#   LIST (T[]), STRUCT, MAP.
# Denied = everything Spark cannot produce: the unsigned/int128 family
# (HUGEINT & friends), INTERVAL, TIME, UUID, ENUM, UNION, BIT, VARINT.
# ------------------------------------------------------------------
# Leaf type IDs (DuckDBPyType.id) with an exact Spark counterpart.
_LEAF_ALLOW = {
    "boolean", "tinyint", "smallint", "integer", "bigint",
    "float", "double", "varchar", "blob", "date",
    "timestamp", "timestamp with time zone",
}
# Nested containers we recurse into (everything else — hugeint, time,
# interval, uuid, enum, union, bit, varint, fixed-size array, … — is a
# violation by omission: allowlist, not denylist).
_NESTED_IDS = {"list", "struct", "map"}


def _walk_type(typ, bad: list[str]) -> None:
    """Recursively validate one DuckDBPyType against Spark's emitting
    set, appending human-readable offenders to ``bad``. Structural (by
    ``.id`` + ``.children``), so an uppercase STRUCT field name or a
    future type alias in the rendered string cannot false-positive —
    only actual type nodes are judged."""
    tid = typ.id
    if tid in _LEAF_ALLOW:
        return
    if tid == "decimal":
        # children = [('precision', p), ('scale', s)] — plain ints.
        prec = dict(typ.children).get("precision", 0)
        if int(prec) > 38:
            bad.append(f"DECIMAL>{38}")
        return
    if tid in _NESTED_IDS:
        for _name, child in typ.children:
            _walk_type(child, bad)
        return
    bad.append(tid.upper())


def oracle_type_violations(cols: list[str], types: list) -> list[str]:
    """Columns whose DuckDB type Spark cannot emit (nested types are
    walked structurally, so a HUGEINT buried in a STRUCT or LIST is
    caught while an uppercase STRUCT *field name* is not). Returns
    human-readable violations."""
    out = []
    for col, typ in zip(cols, types):
        if isinstance(typ, str):  # convenience for tests / callers
            typ = duckdb.sql(f"SELECT CAST(NULL AS {typ}) x").types[0]
        bad: list[str] = []
        _walk_type(typ, bad)
        if bad:
            out.append(f"{col}: {typ} (disallowed: {sorted(set(bad))})")
    return out


def _canon(v) -> str:
    """Canonical string form of a cell value, engine-agnostic."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        # Normalize trailing zeros so DECIMAL(38,4) '1.5000' == '1.5'.
        return f"dec:{v.normalize()}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if hasattr(v, "asDict"):  # pyspark Row (struct)
        d = v.asDict(recursive=True)
        return "{" + ",".join(f"{k}={_canon(d[k])}" for k in sorted(d)) + "}"
    return str(v)


def _rows_canon(cols: list[str], rows) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def check(name: str, sf_dir: str, spark, con) -> dict:
    fn = plans.QUERIES[name]
    t0 = time.time()
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    t_spark = time.time() - t0
    result = {"name": name, "spark_rows": len(srows), "spark_sec": round(t_spark, 2)}

    oracle = plans.ORACLES.get(name)
    if oracle is None:
        result["status"] = "ROWS_ONLY" if len(srows) >= 0 else "FAIL"
        return result

    rel = con.sql(oracle)
    ocols = list(rel.columns)
    # Type gate FIRST — before values are fetched and HUGEINT collapses
    # into an indistinguishable Python int (the round-4 failure mode).
    viol = oracle_type_violations(ocols, list(rel.types))
    if viol:
        result["status"] = "ORACLE_TYPE"
        result["detail"] = "; ".join(viol)
        return result
    orows = rel.fetchall()
    result["oracle_rows"] = len(orows)

    if sorted(scols) != sorted(ocols):
        result["status"] = "SCHEMA_MISMATCH"
        result["detail"] = f"spark={sorted(scols)} oracle={sorted(ocols)}"
        return result
    if len(srows) != len(orows):
        result["status"] = "ROWCOUNT_MISMATCH"
        return result

    sc = _rows_canon(scols, srows)
    oc = _rows_canon(ocols, orows)
    if sc == oc:
        result["status"] = "OK"
        return result

    result["status"] = "VALUE_MISMATCH"
    diffs = [(a, b) for a, b in zip(sc, oc) if a != b]
    result["n_diff_rows"] = len(diffs)
    result["first_diff"] = {"spark": diffs[0][0], "oracle": diffs[0][1]} if diffs else None
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        # Spark-written tables (e.g. the generated .benchdata scale
        # factors) are DIRECTORIES of part files; DuckDB needs a glob.
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    spark = get_spark("parity-check")

    keys = args.keys or sorted(plans.QUERIES)
    failures = 0
    for name in keys:
        try:
            r = check(name, args.sf, spark, con)
        except Exception as e:  # noqa: BLE001
            r = {"name": name, "status": "ERROR", "detail": f"{type(e).__name__}: {e}"}
        ok = r["status"] in ("OK", "ROWS_ONLY")
        failures += 0 if ok else 1
        marker = "✓" if ok else "✗"
        print(f"{marker} {r['name']:32s} {r['status']:18s}", {k: v for k, v in r.items() if k not in ('name', 'status')})
    print(f"\n{len(keys) - failures}/{len(keys)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
