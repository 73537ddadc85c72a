"""One-off FULL-REGISTRY bench (round-7 VERDICT ask #2): time every
registered query once at $SPARK_GRAFT_SF_DIR (default sf0.1) so no
query is left without a timing row — the headline bench (bench.py)
covers the curated set with reps and scale ratios; this sweep exists to
surface a hidden slow query in the tail.

Writes bench_full_registry.json {"queries": {name: sec}, ...} next to
the repo root (coverage_report.py unions it with bench_full.json) and
prints the top-10 slowest.

Usage: python tools/bench_registry.py [--skip name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from customer_review__etl_spark.session import get_spark  # noqa: E402


def _materialize(df) -> None:
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    skip = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1 :])

    from customer_review__etl_spark.plans import all_queries

    spark = get_spark("bench_registry")
    from pyspark.sql import functions as F

    _materialize(
        spark.range(100000).groupBy(F.pmod("id", F.lit(7)).alias("g")).count()
    )

    # Environment canaries (r14 VERDICT ask #3: the full-registry
    # sweep must carry the same contamination confession as the
    # headline bench — an un-stamped sweep can't be trusted across
    # rounds). Reuses bench.py's probe + history machinery verbatim.
    out_canary: dict = {}
    try:
        from bench import _canary_check

        _canary_check(spark, out_canary)
    except Exception as e:  # canary failure must not kill the sweep
        out_canary["canary_error"] = f"{type(e).__name__}: {e}"[:200]

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    specs = all_queries()
    for i, (name, spec) in enumerate(specs.items()):
        if name in skip:
            continue
        t0 = time.time()
        try:
            _materialize(spec.fn(spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # record, keep sweeping
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        spark.catalog.clearCache()
        print(
            f"[{i + 1}/{len(specs)}] {name}: "
            f"{timings.get(name, 'ERR')}",
            flush=True,
        )

    out = {
        "metric": "wall_sec_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf_dir,
        "reps": 1,
        "n_queries": len(timings),
        **out_canary,
        "queries": timings,
        "errors": errors,
    }
    (REPO / "bench_full_registry.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print(json.dumps({"total": out["value"], "n": len(timings),
                      "errors": len(errors), "slowest": dict(slowest)}))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
