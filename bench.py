"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (scan → plan → execute → full
materialization via the no-op sink, so nothing is skipped by laziness
and no driver-side collect cost pollutes the numbers) and prints ONE
JSON line:

    {"metric": "wall_sec_total", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from customer_review__etl_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family — scan+agg (q1), join+topk (q3),
# multi-join (q5), group-count flagship (a01), window (w03), big equi
# join (j02), text chain + top-K words, exact + near dedup, similarity
# top-k. Names must exist in __spark_entry__.queries().
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "a01_group_count",
    "w03_running_sum",
    "j02_inner_equi",
    "t03_topk_words",
    "t04_quality_scores",
    "d01_exact_dedup",
    "d02_minhash_near_dup",
    "d03_simhash_near_dup",
    "s01_cosine_topk",
    "s02_ann_lsh",
    "st01_tumbling_window",
]


def _materialize(df) -> None:
    """Force full execution of every column without collecting to driver."""
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        # Fallback for plans the noop sink rejects (e.g. exotic types):
        # count() still executes the full plan since Spark cannot prune
        # through the preceding aggregates/windows in these queries.
        df.count()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()

    # Warm the JVM paths the timings shouldn't charge to the first
    # query: whole-stage codegen compilation and the noop sink. Touches
    # no benchmark data.
    from pyspark.sql import functions as F

    _materialize(
        spark.range(100000).groupBy(F.pmod("id", F.lit(7)).alias("g")).count()
    )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        # Build once to warm metadata (file listing, schema inference),
        # then time plan-build + execution.
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "wall_sec_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
