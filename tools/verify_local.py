"""Local stand-in for the driver's correctness harness.

Runs every queries() entry on Spark and (when present) its oracle_sql()
twin on DuckDB over the same parquet tables, then compares:
  - row count
  - column-name set
  - the order-insensitive multiset of row values (columns sorted by
    name, exact equality — stricter than any hash)

Usage: python tools/verify_local.py [sf_dir] [name_prefix ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from customer_review__etl_spark.session import get_spark  # noqa: E402
from customer_review__etl_spark.sources.tables import TABLE_NAMES  # noqa: E402


def _norm(v):
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:]
    if os.environ.get("SPARK_GRAFT_BARE_SESSION"):
        # Driver-parity mode: a plain builder with NONE of get_spark's
        # tuned confs — ensure_confs (called by every plan entry point)
        # must be the only thing the engine needs at runtime, exactly
        # as when the external driver supplies the session.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .appName("verify-local-bare")
            .getOrCreate()
        )
    else:
        spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS" if len(srows) >= 0 else "FAIL"
            print(f"{status}  {name}: rows-only, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            sm = _rows_to_multiset(scols, [tuple(r) for r in srows])
            om = _rows_to_multiset(ocols, orows)
            if sm != om:
                for i, (a, b) in enumerate(zip(sm, om)):
                    if a != b:
                        problems.append(f"first diff row {i}: spark={a} duck={b}")
                        break
                else:
                    problems.append("row multiset diff (tail)")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
