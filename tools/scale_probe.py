"""Measured scale-up probe: run key operators at sf0.1 AND at a
synthesized N× corpus, and report the wall-clock ratio per query.

bench.py's scale_ratio compares sf0.01 -> sf0.1 (10x up to the largest
shipped fixture); this probe extends the curve one more decade by
UNIONING N id-remapped copies of the sf0.1 documents / embeddings /
lineitem tables into a scratch corpus — N× the rows — so superlinear
behavior that only appears beyond the fixtures is measured, not
argued. A blocked/banded dedup whose candidate fan-out is bounded
should land near ~N× (linear) or below (fixed overhead still
amortizing); anything well above N× is a scale red flag.

Two growth modes (round-8 VERDICT ask #5 — the pair-emitting and
graph families need BOTH measured):

- REPLICATED (the adversarial mode): copies are verbatim, so every
  document gains N−1 exact twins and every part keeps its identity
  across copies. Near-dup pair counts grow ~quadratically in N BY
  CONSTRUCTION (those pairs are real), and co-purchase weights
  densify — replicated ratios are upper bounds on plan behavior,
  reported as `ratio_repl`.
- ORGANIC (the fair mode): each copy k ≥ 1 is content-decorrelated
  while its WITHIN-copy structure is preserved exactly —
  · documents: translate() applies a per-copy deterministic
    permutation of the full a-z alphabet (see _copy_perm — ≈mult
    distinct content classes at any multiple; the pre-round-12
    9-letter rotation cycled after 9 copies and silently replicated
    content verbatim at larger multiples), the same bijection applied
    to every doc of the copy, so planted near-dup pairs inside a copy
    survive verbatim while cross-copy shingle/gram overlap collapses;
  · embeddings: a per-copy deterministic ±1 sign flip per dimension
    (an orthogonal diagonal transform — within-copy cosines are
    EXACTLY preserved, cross-copy cosines decorrelate to ~0);
  · lineitem: l_orderkey AND l_partkey remap per copy (N disjoint
    co-purchase graphs — organic growth in components).
  Organic ratios (`ratio_org`) are the linear-scaling claim: N×
  independent corpora through the same plan.

Writes SCALE_PROBE.json (or SCALE_PROBE_<N>x.json for N != 10).
Usage: python tools/scale_probe.py [mult] [query_name ...]
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

# Linear-expected set: per-doc/narrow-map and capped-candidate ops —
# probed on the REPLICATED corpus only (content identity does not
# change their work shape; d04's DF cap self-limiting under
# replication is itself the measurement of record, SCALING.md).
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
# Pair-emitting / graph set: probed on BOTH corpora. Replicated
# ratios are upper bounds (cross-copy twins / densified graphs do
# genuinely more semantic work); organic ratios are the linear claim.
PROBE_PAIR = [
    "d02_minhash_near_dup",
    "d04_ngram_jaccard",   # moved from PROBE r15: it IS pair-emitting,
                           # and the r14 merge-pin evidence wants its
                           # ORGANIC wall + candidate volumes, not just
                           # the cap-self-limiting replicated bound
    "d07_containment_pairs",
    "d10_adaptive_block_jaccard",  # r15: d04 + the 6-gram recovery pass —
                                   # its saturation behavior IS the scale
                                   # story, so probe both decades
    "d11_adaptive_containment",  # r16: d07's occupancy-adaptive twin —
                                 # probed through the same saturation
                                 # transition as d10
    "dc03_verbatim_decontaminate",
    "gr02_triangle_count",
    "gr03_khop_reachability",
    "s03_embedding_neardup",
    "s09_capped_lsh_neardup",  # the occupancy-adaptive answer to s03
    "d08_repeated_substrings",  # winnowed anchors; replication = true
                                # quadratic output, organic = linear
    "s10_capped_ann",  # occupancy-capped ANN: ml09's migrated leg —
                       # must NOT reproduce s02's 472x conviction
    "pl04_data_recipe",  # the composed recipe: its candidate stages are
                         # d02's bands + dc01/dc03 gram joins, so the
                         # pair-growth modes apply to the whole chain
    "d09_substring_excision",  # d08's pairs + involved-doc gram
                               # shuffles; replication makes every doc
                               # involved (true work), organic keeps
                               # involvement within-copy
    "pl05_data_recipe_excised",  # pl04 + the d09 apply stage: the
                                 # full excised recipe inherits both
                                 # pair-growth modes
    "pl06_data_recipe_unified",  # pl05 with d06's union-of-evidence
                                 # survivors: adds the d03/d04 edge
                                 # pipelines + the unified CC collapse
                                 # to the probed chain
]

# Per-copy text decorrelation (round 12 — REPLACES the 9-letter
# rotation). The old transform rotated "etaoinshr" by k % 9, which has
# only NINE distinct content classes: at 100× each class held ~11
# VERBATIM-identical copies (506 cross-copy twin pairs per doc), so
# "organic" mode was heavily replicated for exact-substring operators
# — measured: d09 read 152× at 100× before this fix, quadratic true
# pair work the synthesizer itself planted, not a plan property. Now
# each copy k applies a deterministic Fisher-Yates permutation of the
# full a-z alphabet (keyed by a Knuth multiplicative hash of (k, i)),
# giving ≈mult distinct content classes at any realistic multiple;
# within-copy structure is still preserved exactly (one bijection per
# copy), and a 40-char gram collides across copies only if the two
# permutations agree on every letter it contains. Content-sensitive
# stages downstream of the dedup ops (t25's stopword rule inside the
# composed recipes) pass only structurally-English copies — documented
# in SCALING.md: composed-recipe organic rows measure the pre-gate
# stages at full multiplicity plus the gate-surviving tail, which is
# what corpus growth by decorrelated content actually does to them.
_AZ = "abcdefghijklmnopqrstuvwxyz"
# Round-13 (round-12 ADVICE #4): the bijection now also covers A-Z and
# 0-9 as two further class-preserving permutations (uppercase stays
# uppercase, digits stay digits, so token shapes / number heuristics
# survive). Before this, any ≥40-char run dominated by uppercase or
# digits (IDs, shouting text, code-like spans) passed through the
# lowercase-only translate verbatim — a residue of the exact
# replication bias the round-12 fix targeted for d08/d09. The
# lowercase leg keeps the exact round-12 formula (salt 0) so 30×/100×
# rows stay comparable across rounds.
_SRC = _AZ + _AZ.upper() + "0123456789"


def _fy_perm(alphabet: str, k: int, salt: int) -> str:
    chars = list(alphabet)
    for i in range(len(chars) - 1, 0, -1):
        j = (((k * 31 + i) * 2654435761 + salt * 40503) % 4294967296) % (
            i + 1
        )
        chars[i], chars[j] = chars[j], chars[i]
    return "".join(chars)


def _copy_perm(k: int) -> str:
    return (
        _fy_perm(_AZ, k, 0)
        + _fy_perm(_AZ, k, 1).upper()
        + _fy_perm("0123456789", k, 2)
    )


def synthesize(spark, src: str, dst: str, mult: int,
               organic: bool = False) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    out = None
    for k in range(mult):
        part = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(k * max_doc)).cast("long")
        )
        if organic and k:
            part = part.withColumn(
                "text", F.translate("text", _SRC, _copy_perm(k))
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
        if organic and k:
            # deterministic per-copy ±1 diagonal: orthogonal, so
            # within-copy cosines are bit-preserved; cross-copy ~0
            part = part.withColumn(
                "embedding",
                F.expr(
                    f"transform(embedding, (x, i) -> CAST(x * (CASE WHEN "
                    f"((i + 1) * 2654435761 * {k + 1}) % 4294967296 "
                    f">= 2147483648 THEN -1.0 ELSE 1.0 END) AS FLOAT))"
                ),
            )
        out = part if out is None else out.unionByName(part)
    out.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    max_pk = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    out = None
    for k in range(mult):
        part = li.withColumn(
            "l_orderkey", (F.col("l_orderkey") + F.lit(k * max_ok)).cast("long")
        )
        if organic and k:
            part = part.withColumn(
                "l_partkey",
                (F.col("l_partkey") + F.lit(k * max_pk)).cast("long"),
            )
        out = part if out is None else out.unionByName(part)
    out.write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")

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


def _best_of(fn, spark, d, reps=2, cold_out=None):
    """Best-of-n steady-state wall. For queries whose plan consumes a
    once-per-process run-scratch landing (materialized_df), the FIRST
    rep pays the landing build and later reps read parquet — so the
    best-of deliberately measures steady state, and the cold first-rep
    wall (the one that includes the landing, i.e. the actual stage
    work) is reported separately via `cold_out[key]` so the probe's
    scale claim still covers the full chain (r14: pl06's stage-1–5
    landing would otherwise escape the probed wall entirely)."""
    best = None
    for i in range(reps):
        t0 = time.time()
        _materialize(fn(spark, d))
        dt = time.time() - t0
        if i == 0 and cold_out is not None:
            cold_out.append(round(dt, 3))
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
    return round(best, 3)


def merge_probe_queries(prior: dict, fresh: dict) -> dict:
    """FIELD-level merge of a probe session's per-query rows into the
    existing record (round 13): a subset or org-only re-run must not
    clobber the repl fields (or instrumentation fields) of a row it
    only partially refreshed. New fields win; surviving prior fields
    keep their own session's ratios (a ratio is always base/big from
    ONE session — never recomputed across sessions, where machine
    state differs).

    Internal consistency (round-13 ADVICE #1, unit-tested r15): a
    ratio is only meaningful against the 'base' measured in the SAME
    session. If this run refreshed 'base' but not a variant's
    big/ratio pair (e.g. an org-only re-run), the surviving prior pair
    would sit next to a base it was never measured against — drop the
    stale pair rather than store a ratio that no longer equals
    big/base of its neighbours."""
    merged = dict(prior)
    for q, row in fresh.items():
        base_row = dict(merged.get(q, {}))
        if "base" in row:
            for v in ("repl", "org"):
                if f"big_{v}" not in row:
                    base_row.pop(f"big_{v}", None)
                    base_row.pop(f"ratio_{v}", None)
                    base_row.pop(f"cold_{v}", None)
                    base_row.pop(f"ratio_{v}_cold", None)
        base_row.update(row)
        merged[q] = base_row
    return merged


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])  # optional subset of probe names
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale_probe")
    from customer_review__etl_spark.scratch import run_scratch

    # SPARK_GRAFT_PROBE_MODES=org skips the replicated corpus entirely
    # (round-11 VERDICT ask #7: the ≥60× extrapolation runs organic
    # only — replicated at that multiple is quadratic TRUE output for
    # the pair families and would dominate the probe's budget without
    # bounding anything the 30× repl rows haven't already bounded).
    modes = os.environ.get("SPARK_GRAFT_PROBE_MODES", "both")
    dst_repl = run_scratch("scaleprobe_repl_") if modes != "org" else None
    dst_org = run_scratch("scaleprobe_org_")
    t0 = time.time()
    if dst_repl is not None:
        synthesize(spark, src, dst_repl, mult, organic=False)
    synthesize(spark, src, dst_org, mult, organic=True)
    build_s = round(time.time() - t0, 1)

    from customer_review__etl_spark.plans import all_queries
    from customer_review__etl_spark.plans.baselines import baseline_queries

    # demoted baselines (s02/s03) stay probe-able so their quadratic
    # convictions remain measured numbers, not repo lore (r15)
    qs = {**all_queries(), **baseline_queries()}
    out: dict = {
        "mult": mult,
        "base_sf_dir": src,
        "synth_build_sec": build_s,
        "queries": {},
    }
    # SPARK_GRAFT_PROBE_WALL=0 skips the wall-clock measurements and
    # records only the instrumentation fields (prescan timings,
    # candidate-volume counts) — used at 100× where a full s09 run is
    # ~30 min of wall that bounds nothing the 30× rows haven't, but
    # the pre-scan cost claim (round-12 VERDICT ask #5) still needs a
    # measured number at that multiple.
    walls = os.environ.get("SPARK_GRAFT_PROBE_WALL", "1") != "0"
    for name in PROBE + PROBE_PAIR:
        if only and name not in only:
            continue
        fn = qs[name].fn
        row: dict = {}
        if walls:
            cold: list = []
            row["base"] = _best_of(fn, spark, src, cold_out=cold)
            row["cold_base"] = cold[-1]
            if dst_repl is not None:
                row["big_repl"] = _best_of(fn, spark, dst_repl,
                                           cold_out=cold)
                row["cold_repl"] = cold[-1]
                row["ratio_repl"] = (
                    round(row["big_repl"] / row["base"], 2)
                    if row["base"] else None
                )
            if name in PROBE_PAIR:
                row["big_org"] = _best_of(fn, spark, dst_org,
                                          cold_out=cold)
                row["cold_org"] = cold[-1]
                row["ratio_org"] = (
                    round(row["big_org"] / row["base"], 2)
                    if row["base"] else None
                )
                # landing-consuming chains (pl06): the steady-state
                # ratio excludes the once-per-corpus landing build, so
                # also record the cold-wall ratio — the full-chain claim
                if row["cold_base"]:
                    row["ratio_org_cold"] = round(
                        row["cold_org"] / row["cold_base"], 2
                    )
        if name in ("s09_capped_lsh_neardup", "s10_capped_ann"):
            # round-12 VERDICT ask #5: the occupancy pre-scan's cost is
            # claimed O(one partial-agg pass + ≤1 KB collect) — measure
            # it per corpus (memo bypassed: the _scan fn is called
            # directly) so the claim is a number, not an argument.
            from customer_review__etl_spark.plans import simplans

            scan = (
                simplans._s09_effective_depth_scan
                if name.startswith("s09")
                else simplans._s10_effective_depth_scan
            )
            for key, d in (("base", src), ("repl", dst_repl),
                           ("org", dst_org)):
                if d is None:
                    continue
                t0 = time.time()
                depth = scan(spark, d)
                row[f"prescan_sec_{key}"] = round(time.time() - t0, 3)
                row[f"depth_{key}"] = depth
        if name in ("d04_ngram_jaccard", "d07_containment_pairs"):
            # r14 VERDICT ask #8: the d04/d07 verify joins carry the
            # same merge pin the d08 blowup forced — record candidate
            # VOLUMES so the pin's premise (candidates ~linear in the
            # corpus, bounded by the DF cap) is counted, not argued.
            from customer_review__etl_spark.plans import dedupplans

            cand_fn = (
                dedupplans.d04_candidates_df
                if name.startswith("d04")
                else dedupplans.d07_candidates_df
            )
            for key, d in (("base", src), ("repl", dst_repl),
                           ("org", dst_org)):
                if d is None:
                    continue
                row[f"cands_{key}"] = cand_fn(spark, d).count()
        if name in ("d10_adaptive_block_jaccard",
                    "d11_adaptive_containment"):
            # r15/r16: the level-2 recovery stream grows with
            # SATURATION — count uncovered docs and per-level
            # candidates so the wall ratio has its mechanism on record
            from customer_review__etl_spark.plans import dedupplans

            stats_fn = (
                dedupplans.d10_level2_stats
                if name.startswith("d10")
                else dedupplans.d11_level2_stats
            )
            for key, d in (("base", src), ("repl", dst_repl),
                           ("org", dst_org)):
                if d is None:
                    continue
                st = stats_fn(spark, d)
                for k, v in st.items():
                    row[f"{k}_{key}"] = v
        if name == "d08_repeated_substrings":
            # the candidate stage's input size: anchors must grow ~N
            # even when the TRUE pair output grows quadratically
            from pyspark.sql import functions as F

            from customer_review__etl_spark.plans import dedupplans
            from customer_review__etl_spark.sources import tables

            for key, d in (("base", src), ("repl", dst_repl),
                           ("org", dst_org)):
                if d is None:
                    continue
                docs = tables.load_parallel(spark, d, "documents").filter(
                    F.length("text") >= dedupplans.D08_SUBSTR_LEN
                ).select("doc_id", "text")
                row[f"anchors_{key}"] = dedupplans.d08_doc_anchors(
                    docs
                ).count()
        if name in ("d09_substring_excision", "pl05_data_recipe_excised",
                    "pl06_data_recipe_unified"):
            # round-12 VERDICT ask #6: the excision's candidate volume
            # as ROW COUNTS, not just wall ratios — d08 true pairs, the
            # involved-doc set they induce, and the exact size of the
            # gram stream those docs shuffle into the merge-pinned
            # gram⋈gmin join (sum over involved docs of len−L+1; no
            # explode needed to count it). pl05's excision stage
            # consumes d09_cleaned on the RAW corpus verbatim
            # (pipelineplans._pl05_packed_in), so the same counts are
            # recorded on both rows by construction.
            from pyspark.sql import functions as F

            from customer_review__etl_spark.plans import dedupplans
            from customer_review__etl_spark.sources import tables

            L = dedupplans.D08_SUBSTR_LEN
            for key, d in (("base", src), ("org", dst_org)):
                if d is None:
                    continue
                pairs = dedupplans.d08_pairs_m(spark, d)
                row[f"pairs_{key}"] = pairs.count()
                involved = (
                    pairs.select(F.col("doc_a").alias("doc_id"))
                    .union(pairs.select(F.col("doc_b")))
                    .distinct()
                )
                gram_rows = (
                    tables.load_parallel(spark, d, "documents")
                    .filter(F.length("text") >= L)
                    .join(involved, "doc_id")
                    .agg(
                        F.count("*").alias("docs"),
                        F.coalesce(
                            F.sum(F.length("text") - F.lit(L - 1)),
                            F.lit(0),
                        ).alias("grams"),
                    )
                    .collect()[0]
                )
                row[f"involved_docs_{key}"] = gram_rows["docs"]
                row[f"gram_rows_{key}"] = gram_rows["grams"]
        out["queries"][name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)

    fname = "SCALE_PROBE.json" if mult == 10 else f"SCALE_PROBE_{mult}x.json"
    # MERGE into an existing record — FIELD-level (round 13): a
    # subset or org-only re-run must not clobber the repl fields (or
    # instrumentation fields) of a row it only partially refreshed.
    # New fields win; surviving prior fields keep their own session's
    # ratios (a ratio is always base/big from ONE session — never
    # recomputed across sessions, where machine state differs).
    path = REPO / fname
    if path.is_file():
        try:
            prior = json.loads(path.read_text())
            out["queries"] = merge_probe_queries(
                prior.get("queries", {}), out["queries"]
            )
        except json.JSONDecodeError:
            pass
    path.write_text(json.dumps(out, indent=1) + "\n")
    lin = [
        v.get("ratio_org") or v.get("ratio_repl")
        for n, v in out["queries"].items()
        if v.get("ratio_org") or (n in PROBE and v.get("ratio_repl"))
    ]
    print(json.dumps({"mult": mult,
                      "max_fair_ratio": max(lin) if lin else None}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
