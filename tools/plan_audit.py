"""Physical-plan audit: one row per registered query summarizing the
plan properties that matter at 100 TB — shuffle (Exchange) count,
broadcast joins, nested-loop joins, whether scan pushdown/pruning is
active, and whether any Python (Arrow) stage is in the plan.

Writes PLANS.md. Run: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from customer_review__etl_spark.session import get_spark  # noqa: E402

# Queries that legitimately contain a nested-loop join: a deliberately
# tiny broadcast side with a non-equi predicate.
EXPECTED_BNLJ = {
    "j06_theta_range",   # theta/range join is BNLJ by definition
    "s01_cosine_topk",   # 16-row broadcast query side, != predicate
    "q22_idle_customers",  # ONE-row global-aggregate threshold, broadcast
    "q11_important_stock",  # ONE-row global-total threshold, broadcast
    "q15_top_supplier",  # ONE-row global-max threshold, broadcast
    "s04_ivf_ann",       # 8-row broadcast centroid table, cross assignment
    "st08_gapfill_resample",  # generated bin spine × 5-value type dim
    "p14_weighted_mix",   # ONE-row (N,G) totals broadcast onto ≤#langs rates
    "t12_vocab_coverage",  # ONE-row token-total broadcast onto top-V slice
    "t13_unigram_surprisal",  # ONE-row corpus-total broadcast onto tokens
    "s06_pq_ann",  # 8-row codebook / 16-row query-LUT broadcast crosses
    "gr01_pagerank",  # ONE-row node-count broadcast onto the degree table
    "ml06_kmeans",  # k-row centroid table broadcast cross per round
    "ml07_naive_bayes",  # #classes-row class-stats broadcast cross (scoring)
    "t14_heavy_hitters",  # ONE-row corpus-total broadcast onto candidates
    "a11_scalable_median",  # ONE-row (N, k) totals broadcast onto histogram
    "t16_tfidf_terms",  # ONE-row doc-count broadcast onto the tf table
    "a09_approx_stats",  # 6-row rank-bracket broadcast onto the histogram
                         # (cum >= k AND prev < k bucket locate) + ONE-row
                         # kth/stats crosses
    "p18_temperature_mix",  # ONE-row (n_total, Σ√n) totals broadcast onto
                            # ≤#langs rates (the p14 shape)
    "ml11_confidence_calibration",  # inherits ml07's #classes-row
                                    # class-stats broadcast crosses
    "a15_revenue_concentration",  # ONE-row revenue-total broadcast onto
                                  # the ~40-row log2 bucket spine
    "j13_bloom_semi_join",  # ONE-row (16 KB bloom bitmap) broadcast cross
                            # onto the fact scan — the runtime-filter probe
    "t24_bm25_topk",  # ONE-row (N, S) corpus-totals broadcast cross onto
                      # the matching postings (the t16 doc-count shape)
    "s08_rrf_fusion",  # inherits t24's totals cross + the ONE-row anchor
                       # embedding broadcast cross (the s01 query shape)
    "pl03_retrieval_corpus",  # inherits the same two tiny crosses at
                              # query-set width: ONE-row (N, S) chunk
                              # totals + the 3-row anchor-embedding
                              # broadcast (vec_id ≠ query anchor non-equi)
    "pl04_data_recipe",  # inherits p14's ONE-row (N, G) totals broadcast
                         # cross onto the ≤#langs mix-rate table
    "pl05_data_recipe_excised",  # same two p14 totals crosses as pl04
                                 # (shared _pl04_mixed stage)
}


# Packing queries run pack_sequences, whose localCheckpoint+collect
# truncates the registered query's explain output to the post-
# checkpoint tail — the (much larger) upstream subplan would be
# invisible to this audit (round-11 ADVICE #2: exactly the class of
# bug the d09 79-exchange catch proved this gate exists for). For
# each, additionally audit the exposed pre-packing DataFrame and fold
# its counts into the row's notes.
def _prepack_builders():
    from customer_review__etl_spark.plans import pipelineplans, relational

    return {
        "p19_sequence_pack": relational._p19_packed_in,
        "pl04_data_recipe": pipelineplans._pl04_packed_in,
        "pl05_data_recipe_excised": pipelineplans._pl05_packed_in,
    }


# Wide-payload broadcast audit (round 12). The dc03 catch: under a
# composed consumer's column pruning, Catalyst flipped the build side
# of dc03's anchor join and broadcast the corpus-sized train-gram
# stream (full normalized text on every gram row — 8.2 GiB at the 30×
# probe, over Spark's broadcast hard limit). Estimate-driven build
# choices are not stable across scales or consumers, so every
# BroadcastExchange whose payload includes a body/gram/vector column
# must be either (a) bounded by construction and whitelisted here
# with the bound, or (b) a bug. Column-name heuristic; suffixes like
# `#123` and qualifiers are stripped before matching.
_WIDE_COL = re.compile(
    r"^(text|norm|ev_norm|cleaned|body|g|gram|grams|anchor_text|shingle|"
    r"shingles|embedding|emb|emb_a|emb_b|q_emb|n_emb|cent_emb|v|toks|"
    r"tokens|words|terms|line|lines|chunk|content)$"
)
EXPECTED_WIDE_BROADCAST: dict[str, str] = {
    # query name -> justification (the bound that makes it safe)
    "s01_cosine_topk": "16-row query-vector side (vec_id < 16)",
    "s04_ivf_ann": "8-row centroid table / 16-row probe side",
    "s06_pq_ann": "8-row codebook + 16-row query LUT",
    "s05_semantic_clusters": "k-row centroid table per round",
    "ml06_kmeans": "k-row centroid table per round",
    "s08_rrf_fusion": "ONE anchor embedding row",
    "pl03_retrieval_corpus": "3-row anchor embedding side",
    "dc03_verbatim_decontaminate": (
        "eval anchor table: one row per eval doc of a benchmark set "
        "(pinned broadcast(anchors) — the round-12 fix)"
    ),
    "t12_vocab_coverage": "top-V vocabulary slice (V fixed)",
    "t24_bm25_topk": "query-term list (fixed, tiny)",
    "ml07_naive_bayes": "class-stats vectors, ≤ #classes rows",
    "ml11_confidence_calibration": "inherits ml07's ≤ #classes-row stats",
}


def _wide_broadcasts(plan: str) -> list[str]:
    hits = []
    for m in re.finditer(
        r"\(\d+\) BroadcastExchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan
    ):
        cols = [
            c.strip().split("#")[0].split(".")[-1]
            for c in m.group(1).split(",")
        ]
        wide = [c for c in cols if _WIDE_COL.match(c)]
        if wide:
            hits.append("+".join(sorted(set(wide))))
    return hits


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df.queryExecution() if hasattr(df, "queryExecution") else df._jdf.queryExecution(),
        "formatted",
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    rows = []
    unexpected_bnlj = []
    unexpected_wide = []
    for name, fn in sorted(entrymod.queries().items()):
        if name in (
            "st04_stream_tumbling", "st05_stream_dedup",
            "st06_stateful_stats", "st07_stream_static_join",
        ):
            # st04-06 execute a streaming job at plan-build time; audit
            # their batch twins (st01) instead of running the stream.
            rows.append((name, "—", "—", "—", "streaming (see st01 twin / jobs.py)"))
            continue
        try:
            df = fn(spark, sf_dir)
            plan = _plan(df)
        except Exception as e:  # noqa: BLE001
            rows.append((name, "?", "?", "?", f"explain failed: {type(e).__name__}"))
            continue
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        n_bc = plan.count("BroadcastHashJoin")
        n_bnlj = plan.count("BroadcastNestedLoopJoin") + plan.count(
            "CartesianProduct"
        )
        pushed = "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "-"
        python = "arrow" if ("ArrowEvalPython" in plan or "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan) else "-"
        notes = []
        if n_bnlj:
            notes.append(f"BNLJ×{n_bnlj}" + (" (expected: tiny broadcast side, non-equi)" if name in EXPECTED_BNLJ else " (UNEXPECTED)"))
            if name not in EXPECTED_BNLJ:
                unexpected_bnlj.append(name)
        if python != "-":
            notes.append("python stage (documented UDF path)")
        wide = _wide_broadcasts(plan)
        if wide:
            if name in EXPECTED_WIDE_BROADCAST:
                notes.append(
                    f"wide bcast [{' '.join(wide)}] (expected: "
                    f"{EXPECTED_WIDE_BROADCAST[name]})"
                )
            else:
                notes.append(f"wide bcast [{' '.join(wide)}] (UNEXPECTED)")
                unexpected_wide.append(name)
        prepack = _prepack_builders().get(name)
        if prepack is not None:
            pplan = _plan(prepack(spark, sf_dir))
            p_ex = len(re.findall(r"\(\d+\) Exchange", pplan))
            p_bc = pplan.count("BroadcastHashJoin")
            p_bnlj = pplan.count("BroadcastNestedLoopJoin") + pplan.count(
                "CartesianProduct"
            )
            note = (
                f"checkpoint-truncated row; prepack subplan: {p_ex} ex, "
                f"{p_bc} bcast"
            )
            if p_bnlj:
                note += f", BNLJ×{p_bnlj}" + (
                    " (expected)" if name in EXPECTED_BNLJ else " (UNEXPECTED)"
                )
                if name not in EXPECTED_BNLJ:
                    unexpected_bnlj.append(name + " (prepack)")
            pwide = _wide_broadcasts(pplan)
            if pwide:
                # composed consumers inherit their fragments' expected
                # wide broadcasts (pl04/pl05 contain dc03's anchors)
                inherited = name in EXPECTED_WIDE_BROADCAST or name in (
                    "pl04_data_recipe",
                    "pl05_data_recipe_excised",
                )
                note += f", wide bcast [{' '.join(pwide)}]" + (
                    " (expected: inherited fragment bounds)"
                    if inherited
                    else " (UNEXPECTED)"
                )
                if not inherited:
                    unexpected_wide.append(name + " (prepack)")
            notes.append(note)
        rows.append((name, str(n_ex), str(n_bc), pushed, "; ".join(notes)))
        spark.catalog.clearCache()

    out = Path(__file__).resolve().parent.parent / "PLANS.md"
    with out.open("w", encoding="utf-8") as f:
        f.write(
            "# PLANS — physical-plan audit\n\n"
            f"Generated by `tools/plan_audit.py` at `{sf_dir}`.\n"
            "Columns: shuffles = `Exchange` operators in the formatted plan "
            "(includes the final output sort where one exists); bcast = "
            "BroadcastHashJoin count; pushdown = non-empty `PushedFilters` "
            "on a scan.\n\n"
            "Checkpoint truncation: queries that run pack_sequences "
            "(p19/pl04/pl05) or an iterative fixpoint (d05/d06/gr05, BPE) "
            "materialize via localCheckpoint, so their registered row shows "
            "only the post-checkpoint tail. For the packers the hidden "
            "upstream is audited separately and reported in notes as the "
            "`prepack subplan`; the fixpoint ops' per-round subplans are "
            "bounded by design (scalar-only collects, pointer-jumping)."
            "\n\n"
            "| query | shuffles | bcast joins | pushdown | notes |\n"
            "|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write("| " + " | ".join(r) + " |\n")
    print(f"wrote {out} ({len(rows)} queries)")
    rc = 0
    if unexpected_bnlj:
        print("UNEXPECTED nested-loop joins:", unexpected_bnlj)
        rc = 1
    if unexpected_wide:
        print("UNEXPECTED wide-payload broadcasts:", unexpected_wide)
        rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
