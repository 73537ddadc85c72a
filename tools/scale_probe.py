"""Measured scale-up probe: run key operators at sf0.1 AND at a
synthesized 10x corpus, and report the wall-clock ratio per query.

bench.py's scale_ratio compares sf0.01 -> sf0.1 (10x up to the largest
shipped fixture); this probe extends the curve one more decade by
UNIONING 10 doc_id-remapped copies of the sf0.1 documents/embeddings
tables (plus proportionally remapped events) into a scratch corpus —
same distributions, 10x the rows — so superlinear behavior that only
appears beyond the fixtures is measured, not argued. A blocked/banded
dedup whose candidate fan-out is bounded should land near ~10x
(linear) or below (fixed overhead still amortizing); anything well
above 10x is a scale red flag.

Caveat (documented, inherent to replication): near-dup families gain
cross-copy duplicate pairs (every doc now has 9 exact twins), so
pair-emitting queries do MORE than 10x the semantic work — their
ratios are upper bounds, reported separately as `dup_inflated`.

Writes SCALE_PROBE.json. Usage: python tools/scale_probe.py [mult]
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

# Linear-expected set: per-doc/narrow-map and capped-candidate ops.
PROBE = [
    "t03_topk_words",
    "t08_bpe_token_count",
    "t23_inverted_index",
    "t24_bm25_topk",
    "t25_quality_rules",
    "t26_line_dedup",
    "p19_sequence_pack",
    "d01_exact_dedup",
    "t19_cdc_chunks",
    "s02_ann_lsh",
    "ml12_hashed_features",
]
# Pair-emitting dedup: ratios are upper bounds under replication (every
# doc gains 9 exact twins -> candidate sets genuinely grow superlinearly
# in SEMANTIC content, not a plan defect).
PROBE_DUP_INFLATED = [
    "d02_minhash_near_dup",
    "d04_ngram_jaccard",
]


def synthesize(spark, src: str, dst: str, mult: int) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    out = None
    for k in range(mult):
        part = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(k * max_doc)).cast("long")
        )
        out = part if out is None else out.unionByName(part)
    out.write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    out = None
    for k in range(mult):
        part = emb.withColumn(
            "vec_id", (F.col("vec_id") + F.lit(k * max_vec)).cast("long")
        )
        out = part if out is None else out.unionByName(part)
    out.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")

    # small dims some probe queries' sources expect to exist
    for t in ("nation", "region"):
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")


def _materialize(df) -> None:
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])  # optional subset of probe names
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale_probe")
    from customer_review__etl_spark.scratch import run_scratch

    dst = run_scratch("scaleprobe_")
    t0 = time.time()
    synthesize(spark, src, dst, mult)
    build_s = round(time.time() - t0, 1)

    from customer_review__etl_spark.plans import all_queries

    qs = all_queries()
    out: dict = {
        "mult": mult,
        "base_sf_dir": src,
        "synth_build_sec": build_s,
        "queries": {},
    }
    for name in PROBE + PROBE_DUP_INFLATED:
        if only and name not in only:
            continue
        fn = qs[name].fn
        times = {}
        for label, d in (("base", src), ("big", dst)):
            best = None
            for _ in range(2):
                t0 = time.time()
                _materialize(fn(spark, d))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            times[label] = round(best, 3)
        ratio = round(times["big"] / times["base"], 2) if times["base"] else None
        out["queries"][name] = {
            **times,
            "ratio": ratio,
            "dup_inflated": name in PROBE_DUP_INFLATED,
        }
        print(f"{name}: base={times['base']} big={times['big']} "
              f"ratio={ratio}", flush=True)

    fname = "SCALE_PROBE.json" if mult == 10 else f"SCALE_PROBE_{mult}x.json"
    (REPO / fname).write_text(json.dumps(out, indent=1) + "\n")
    lin = [v["ratio"] for n, v in out["queries"].items()
           if not v["dup_inflated"] and v["ratio"]]
    print(json.dumps({"mult": mult,
                      "max_linear_family_ratio": max(lin) if lin else None}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
