"""Local mirror of the driver's correctness gate.

Runs every registered query through Spark AND its oracle SQL through
DuckDB on the same parquet tables, then compares:
  1. row count,
  2. column-name sets,
  3. order-insensitive values (columns sorted by name, rows sorted by
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

    cur = con.execute(oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
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
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
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
