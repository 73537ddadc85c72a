"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (scan → plan → execute → full
materialization via the no-op sink, so nothing is skipped by laziness
and no driver-side collect cost pollutes the numbers).

Output contract (round-5 VERDICT #3): the consumer keeps only the LAST
~2000 chars of stdout, so the final printed line must stay compact. The
full per-query detail (big + small timings, scale ratios) is written to
`bench_full.json` next to this file; stdout gets ONE short JSON line:

    {"metric": "wall_sec_total", "value": N, "unit": "sec", "sf": 0.1,
     "reps": 2, "n_queries": 43, "queries": {...only if it fits...},
     "worst_scale_ratio": {...top 5...}, "detail": "bench_full.json"}

The per-query map is included on stdout only when the whole line still
fits the 1.5 KB truncation budget; otherwise it lives in the detail
file alone.

- Each query is timed `reps` times (default 2) and the MINIMUM kept:
  ambient load in a shared sandbox inflates single-shot wall clock by
  20-40% (the round-3 phantom regression); min-of-n is the standard
  de-noising estimator for cold-cache-free throughput.
- The same set also runs at a SMALL scale factor (default sf0.01) and
  `scale_ratio` reports t_big/t_small per query — with 10x the rows, a
  ratio well above 10 flags super-linear work (the 100TB red flag),
  while ratios below 10 show fixed overhead still dominating.

Usage: python bench.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
     SPARK_GRAFT_SF_SMALL_DIR (default /root/testdata/sf0.01; set empty
     to skip the small block), SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS
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
# multi-join (q5), correlated-aggregate (q17), group-count flagship
# (a01), windows (w03/w05), grouping sets (g04), equi + range joins
# (j02/j10), text chain + top-K words, exact/minhash/simhash/ngram
# dedup + cluster collapse, similarity (brute/LSH/IVF), streaming
# window + session window, parquet IO roundtrip. Names must exist in
# __spark_entry__.queries().
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q17_small_qty_revenue",
    "q8_market_share",
    "a01_group_count",
    "w03_running_sum",
    "w05_ntile_frames",
    "g04_pivot",
    "j02_inner_equi",
    "j10_bucketed_range",
    "j12_interval_overlap",
    "t18_sliding_chunks",
    "t03_topk_words",
    "t04_quality_scores",
    "t11_chunk_dedup",
    "t12_vocab_coverage",
    "u02_sequence_pack",
    "pl01_training_pipeline",
    "dc01_decontaminate",
    "d01_exact_dedup",
    "d02_minhash_near_dup",
    "d03_simhash_near_dup",
    "d04_ngram_jaccard",
    # round-15 addition: occupancy-adaptive blocking-key length (the
    # engineered answer to the measured 3-gram-space saturation)
    "d10_adaptive_block_jaccard",
    "d05_neardup_clusters",
    "d06_unified_clusters",
    "dc02_neardup_decontaminate",
    "s01_cosine_topk",
    # s02_ann_lsh dropped r15 with its registry demotion to
    # plans/baselines.py (convicted quadratic; s10 is the registered
    # twin and keeps the ANN row below) — headline is 125 queries from
    # r15 on, vs 126 in r12–r14 records.
    "s04_ivf_ann",
    "s05_semantic_clusters",
    "s06_pq_ann",
    "s07_multiprobe_ann",
    "ml08_linreg",
    "t13_unigram_surprisal",
    "w07_scd2_intervals",
    "w09_range_frame",
    "w08_rolling_median",
    "u03_ewma_smooth",
    "u06_ewma_partitioned",
    "u04_sentence_udtf",
    "u05_grouped_agg_udf",
    "p16_scalable_ordinal",
    "gr01_pagerank",
    "gr02_triangle_count",
    "gr03_khop_reachability",
    "gr04_item_similarity",
    "t14_heavy_hitters",
    "t15_bigram_surprisal",
    "t16_tfidf_terms",
    "t17_reading_ease",
    "ml09_knn_label",
    "j11_fuzzy_blocked_join",
    "io10_zorder_cluster",
    "ml07_naive_bayes",
    "p17_oversample_mix",
    "a10_funnel_stages",
    "a11_scalable_median",
    "a12_observed_metrics",
    "ml06_kmeans",
    "st01_tumbling_window",
    "st03_session_window",
    "st09_stream_stream_join",
    "st10_keyed_upsert",
    "st11_incremental_resume",
    "io02_parquet_roundtrip",
    "io05_bucketed_join",
    "io06_schema_evolution",
    "io07_compaction",
    "io08_dynamic_partition_overwrite",
    "io09_table_diff",
    "io11_python_datasource",
    "io13_partition_pruned_read",
    # round-7 late additions
    "w10_sessionize",
    "t19_cdc_chunks",
    "io14_merge_upsert",
    "io15_snapshot_read",
    "p18_temperature_mix",
    "d07_containment_pairs",
    # round-16 addition: d07's occupancy-adaptive twin (the engineered
    # answer to d07's measured 100× candidate recall loss) — 124 query
    # rows (+3 build rows = 127 artifact rows) from r16 on
    "d11_adaptive_containment",
    "pl02_incremental_refresh",
    "ml11_confidence_calibration",
    "a13_grouped_quantiles",
    "a14_running_distinct",
    "a15_revenue_concentration",
    "io16_quarantine_write",
    "ml12_hashed_features",
    "u07_arrow_batch_clip",
    "a16_mad_outliers",
    "gr05_connected_components",
    "t20_novelty_ratio",
    "t21_bpe_merges",
    "t22_bpe_encode",
    "dc03_verbatim_decontaminate",
    "w11_ohlc_bars",
    "st12_stream_quarantine",
    # round-8 additions (p19/j13/t23 new; the rest are >3 s discoveries
    # from the one-off full-registry sweep, bench_full_registry.json)
    "p19_sequence_pack",
    "j13_bloom_semi_join",
    "t23_inverted_index",
    "t24_bm25_topk",
    "s08_rrf_fusion",
    "t25_quality_rules",
    "t26_line_dedup",
    "w12_retention_cohorts",
    "a09_approx_stats",
    "ml01_lda_themes",
    "ml02_topic_top_words",
    "ml04_classifier_metrics",
    "ml10_classifier_gate",
    # round-9 additions
    "d08_repeated_substrings",
    "pl03_retrieval_corpus",
    "t27_perplexity_buckets",
    "gr06_label_propagation",
    "w13_forward_fill",
    "p20_length_curriculum",
    "st13_late_data_audit",
    "s09_capped_lsh_neardup",
    # round-10/11 additions (s10: the coverage tripwire's never_benched
    # warning; pl04: the composed data recipe; d09: substring excision)
    "s10_capped_ann",
    "pl04_data_recipe",
    "d09_substring_excision",
    # round-12 addition: the excised data recipe (pl04 + d09 apply step)
    "pl05_data_recipe_excised",
    # round-13 addition: the unified-survivor recipe (pl05 with d06's
    # union-of-evidence dedup as stage 1)
    "pl06_data_recipe_unified",
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


def _time_queries(
    spark, qs, sf_dir: str, reps: int
) -> tuple[dict[str, float], dict[str, list[float]], dict[str, float]]:
    """Returns (min-per-query, all-rep timings). Every rep is recorded
    so ambient-load / cache-state anomalies show up as VARIANCE in
    bench_full.json instead of a mystery cross-round regression (the
    round-6 d04 lesson: 7.8 s vs 17.5 s rep-to-rep with constant JVM
    CPU). Caches are cleared after every rep so each number is a
    cold-cache measurement attributable to the query alone; the
    once-per-process scratch-parquet materializations of SHARED
    intermediates (shingle/pair sets) survive by design — they are the
    claimed cross-query plan, and their build cost lands on the first
    consumer's first rep, visible in that query's rep spread."""
    timings: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    # Shared run-scratch intermediates (shingle stream, d02/d03/d04
    # pair sets, s03 pairs, s02 kNN candidates, co-purchase edges) land
    # once per process per corpus on their FIRST consumer — which made
    # that consumer's rep-1 number unattributable (d06 15.0 s vs 6.3 s,
    # s05 7.0 vs 2.5 at sf0.1). Pay them up front as ONE timed
    # `scratch_build` row; the per-query reps then measure steady-state
    # plans. Round-9 (round-8 VERDICT ask #4): the warm set now builds
    # each intermediate DIRECTLY (the old form ran three consumer
    # QUERIES, paying their CC fixpoint loops and vote joins on top of
    # the landings), each build is timed individually into
    # `scratch_build_detail`, and ALL builds launch concurrently
    # (Spark schedules jobs from many threads; materialized_df's
    # per-kind locks serialize exactly the shingles→d02 dependency
    # chain and nothing else). Per-kind walls under concurrency
    # overlap — their sum exceeds the row.
    from concurrent.futures import ThreadPoolExecutor

    from customer_review__etl_spark.plans import shared_intermediates

    detail: dict[str, float] = {}
    # Landing attribution (r15 VERDICT optional #7): each kind records
    # its [start, end] offset within the warm window, and an IO-canary
    # probe brackets the whole phase — a disk wave that arrives during
    # the warm is then localizable to the specific landings whose
    # windows overlap it, instead of condemning the whole artifact.
    windows: dict[str, list[float]] = {}
    warm_t0 = 0.0

    def _build_kind(item) -> None:
        kind, fn = item
        # FAIR mode schedules round-robin BETWEEN pools but FIFO within
        # one; each build gets its own on-demand pool (default weight)
        # so concurrent warms genuinely share task slots (r9 ADVICE #2)
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"warm_{kind}"
        )
        t = time.time()
        try:
            fn(spark, sf_dir)  # forces the parquet landing on first touch
        finally:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
        end = time.time()
        detail[kind] = round(end - t, 3)
        windows[kind] = [round(t - warm_t0, 3), round(end - warm_t0, 3)]

    warmers = shared_intermediates()
    # Measurement valve (r15, pl05-drift A/B): exclude named kinds
    # from the up-front warm set so their landing cost falls back on
    # the first consumer's first rep — reverts a shared-scratch
    # arrangement for one run without touching the plans.
    skip_kinds = {
        k for k in os.environ.get(
            "SPARK_GRAFT_SKIP_WARM_KINDS", ""
        ).split(",") if k
    }
    if skip_kinds:
        warmers = {k: f for k, f in warmers.items() if k not in skip_kinds}
    # longest-first submission: the wall is bounded by the slowest
    # build, so it should get task slots from second zero ("shingles"
    # starts immediately too — "d02_pairs" blocks on its lock)
    longest_first = (
        "pl06_packed_in",  # deepest chain: d06_survivors → d02/3/4 + d09
        "d06_survivors",
        "d04_pairs", "s09_pairs", "shingles", "copurchase",
        "copurchase_thresholded", "d03_pairs", "s10_knn", "d02_pairs",
    )
    order = [k for k in longest_first if k in warmers] + sorted(
        k for k in warmers if k not in longest_first
    )
    io_pre = _canary_io_probe()
    t0 = warm_t0 = time.time()
    if order:  # SKIP_WARM_KINDS may empty the set entirely (A/B valve)
        with ThreadPoolExecutor(max_workers=len(order)) as pool:
            list(pool.map(_build_kind, [(k, warmers[k]) for k in order]))
    spark.catalog.clearCache()
    build = round(time.time() - t0, 3)
    io_probes = {"pre": io_pre, "post": _canary_io_probe()}
    # The warm builds (notably the d06 CC fixpoint's per-round local
    # checkpoints and the pl06 chain's shuffles) leave dead blocks and
    # shuffle files that Spark's ContextCleaner only reclaims after a
    # DRIVER GC. One explicit GC after the warm phase hands the reps a
    # clean block manager; its pause is timed as its own row (~0.2 s),
    # not charged to scratch_build. Cheap hygiene, not a measured
    # speedup: the r15 A/B that motivated it turned out to be
    # dominated by host disk-throughput variance (see the IO canary).
    t0 = time.time()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    detail["post_warm_gc"] = round(time.time() - t0, 3)
    timings["scratch_build"] = build
    all_reps["scratch_build"] = [build]
    # Measurement valve (r15): SPARK_GRAFT_ONLY=q1,q2 restricts the
    # timed set for targeted A/B reps (the warm set above still builds
    # in full unless SPARK_GRAFT_SKIP_WARM_KINDS also narrows it).
    only = {
        q for q in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if q
    }
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None or (only and name not in only):
            continue
        if name == "io05_bucketed_join":
            # The one-time bucketed CTAS is io05's SETUP, not its query:
            # timing it inside rep 1 made the io05 number a 5.8x
            # rep-spread mystery (round-7 VERDICT ask #3). Pay and time
            # it separately so the build cost stays visible as its own
            # row while the io05 reps measure the steady-state join.
            from customer_review__etl_spark.plans import ioplans

            t0 = time.time()
            ioplans.io05_bucketed_tables(spark, sf_dir)
            build = round(time.time() - t0, 3)
            timings["io05_build"] = build
            all_reps["io05_build"] = [build]
        if name == "t22_bpe_encode":
            # t22 applies the tokenizer t21 trains; the shared
            # per-process training (textplans.bpe_learned_m) is its
            # SETUP. Normally t21's reps already populated it (≈0 s
            # here); under a SPARK_GRAFT_ONLY subset that skips t21,
            # this row pays and times it visibly.
            from customer_review__etl_spark.plans import textplans

            t0 = time.time()
            textplans.bpe_learned_m(spark, sf_dir)
            build = round(time.time() - t0, 3)
            timings["bpe_train_build"] = build
            all_reps["bpe_train_build"] = [build]
        if name == "ml01_lda_themes":
            # The shared seed-42 LDA fit is ml01+ml02's SETUP (one fit
            # per process since r16, plans/mlplans.lda_model_m): pay
            # and time it as its own row so the two query reps measure
            # the scoring/describeTopics plans, not four redundant
            # re-fits of the identical model (the ml_fit_build
            # pattern).
            from customer_review__etl_spark.plans import mlplans

            t0 = time.time()
            mlplans.lda_model_m(spark, sf_dir)
            build = round(time.time() - t0, 3)
            timings["lda_fit_build"] = build
            all_reps["lda_fit_build"] = [build]
        if name == "ml04_classifier_metrics":
            # The 100-tree RF fit is ml04+ml10's shared SETUP (one fit
            # per process since round 9, plans/mlplans.py
            # _rf_label_prediction): pay and time it as its own row so
            # the two query reps measure the metric/gate plans, not
            # JVM model training (round-8 VERDICT ask #3).
            from customer_review__etl_spark.plans import mlplans

            t0 = time.time()
            mlplans._rf_label_prediction(spark, sf_dir)
            build = round(time.time() - t0, 3)
            timings["ml_fit_build"] = build
            all_reps["ml_fit_build"] = [build]
        times: list[float] = []
        for _ in range(reps):
            t0 = time.time()
            _materialize(fn(spark, sf_dir))
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        timings[name] = min(times)
        all_reps[name] = times
    return timings, all_reps, detail, windows, io_probes


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _canary_probe(spark) -> float:
    """Fixed synthetic CPU workload — an ENVIRONMENT probe, not an
    engine benchmark (round-11 VERDICT ask #2: the shipped r11 artifact
    was uniformly ~25 % hot from ambient load and nothing in the run
    flagged it). Deliberately independent of the registry and the
    testdata so engine/plan changes can never move it: 3.2 B xxhash64
    rows reduced to one sum, all 32 threads busy, ~0.8 s on an idle
    machine — sized so scheduler jitter stays well under the 1.2×
    warning threshold (sub-second workloads probed at 1.3–1.5×
    spreads of pure noise; at this size the idle spread is ~1.08×).
    Median of 3 runs."""
    from pyspark.sql import functions as F

    def one() -> float:
        t0 = time.time()
        spark.range(0, 3_200_000_000, 1, 32).select(
            F.sum(F.xxhash64("id") % 1000).alias("s")
        ).collect()
        return time.time() - t0

    return round(sorted(one() for _ in range(3))[1], 3)


def _canary_jobs_probe(spark) -> float:
    """Scheduler-overhead probe — the SECOND environment dimension
    (round 13): the r13 container ran the throughput canary at its
    trailing median (0.82 s, per-core speed identical) while every
    job-count-heavy query (graph fixpoints, streaming micro-batches,
    Python-worker rows) ran ~2× its r12 wall — driver-side scheduling
    and process-spawn latency had degraded, and the compute canary is
    blind to that mode by construction. This probe is the complement:
    40 back-to-back one-stage jobs of 32 trivial tasks each measure
    per-job submit→schedule→dispatch→wake overhead with ~zero compute,
    so it moves ONLY when scheduling latency does. Median of 3."""

    def one() -> float:
        t0 = time.time()
        for _ in range(40):
            spark.range(0, 32, 1, 32).count()
        return time.time() - t0

    return round(sorted(one() for _ in range(3))[1], 3)


def _jobs_canary_verdict(
    hist: list, jobs_sec: float, cores: int
) -> tuple[bool, float | None, str | None, dict]:
    """Pure decision core of the jobs-canary check (unit-testable —
    r14 VERDICT ask #6). Returns (warn, baseline_median,
    baseline_basis, extra_output_fields).

    Baseline precedence:
    1. clean_history — ≥3 samples that passed their own check (a LONE
       clean sample is weaker evidence than 3-of-5 agreement, r14
       ADVICE: it must not displace the agreement path by itself);
    2. stable_flagged_history — the round-13 stable-but-slow host
       bootstrap: the original absolute floor assumed bare-metal
       local-mode overhead (~10–25 ms/job), but a sandboxed container
       schedules 40 no-op jobs in ~5 s at idle (measured r14), so
       every sample tripped the floor, none entered the clean history,
       and the relative drift check could never activate. If ≥3 of
       the trailing 5 ambient-clean samples agree within a 1.25× band
       of their median, the host has a stable per-job latency — adopt
       the agreeing samples' median. Ambient-flagged samples stay out:
       a machine under SUSTAINED load would otherwise ratify its
       loaded latency as "stable";
    3. bootstrap floor — no baseline of any kind yet. 2 s per 40
       one-wave jobs (>50 ms/job = degraded on a bare-metal local[32]
       box), scaled by ceil(32/cores) task waves so a smaller host is
       not condemned for legitimately running more waves per job (r14
       VERDICT ask #6: "scale by core count")."""
    extra: dict = {}
    prev_j = sorted(
        h["jobs_sec"] for h in hist
        if "jobs_sec" in h and not h.get("scheduler_overhead_warning")
    )
    med_j = None
    basis = None
    if len(prev_j) >= 3:
        med_j = prev_j[len(prev_j) // 2]
        basis = "clean_history"
    else:
        recent = [
            h["jobs_sec"] for h in hist
            if "jobs_sec" in h and not h.get("ambient_load_warning")
        ][-5:]
        if len(recent) >= 3:
            rs = sorted(recent)
            rmed = rs[len(rs) // 2]
            agree = sorted(
                x for x in recent if rmed / 1.25 <= x <= rmed * 1.25
            )
            if len(agree) >= 3:
                med_j = agree[len(agree) // 2]
                basis = "stable_flagged_history"
                extra["canary_jobs_baseline_samples"] = agree
    if med_j is not None:
        warn = bool(jobs_sec > 1.2 * med_j)
    else:
        waves = -(-32 // max(1, cores))  # ceil(32 / cores)
        floor = 2.0 * waves
        extra["canary_jobs_bootstrap_floor"] = floor
        warn = bool(jobs_sec > floor)
    return warn, med_j, basis, extra


# Probe methodology version, recorded per history entry: v1 read the
# 64 MiB back through the page cache (memory bandwidth — blind to
# read-side disk degradation, r15 ADVICE #1), v2 evicts via
# posix_fadvise DONTNEED first. Cross-version samples must never feed
# each other's baseline (v1 readings are structurally faster), so the
# verdict filters history to the current version and the first sample
# of a new version re-seeds its own baseline unflagged.
IO_PROBE_VERSION = 2


def _io_canary_verdict(
    hist: list, io_sec: float, probe_v: int = IO_PROBE_VERSION
) -> tuple[bool, float | None]:
    """Pure decision core of the IO canary (unit-testable, mirroring
    _jobs_canary_verdict): compare against the clean-history median of
    SAME-PROBE-VERSION samples (samples that were themselves io-flagged
    stay recorded but never feed the baseline — the same anti-ratchet
    rule as the other two canaries; entries without io_probe_v are v1).
    Threshold 1.5× (disk is noisier than CPU); no bootstrap floor —
    the first sample of a probe version seeds its history unflagged."""
    prev_io = sorted(
        h["io_sec"] for h in hist
        if "io_sec" in h
        and not h.get("io_throughput_warning")
        and h.get("io_probe_v", 1) == probe_v
    )
    if not prev_io:
        return False, None
    med_io = prev_io[len(prev_io) // 2]
    return bool(io_sec > 1.5 * med_io), med_io


def _canary_io_probe() -> float:
    """Filesystem-throughput probe — the THIRD environment dimension
    (round 15): a subset A/B rep read pl05 at 12.1 s on a run whose
    compute AND jobs canaries were both green, while the `shingles`
    landing build read 8.0 s vs 0.8 s for identical code on the same
    day — the container's disk bandwidth had degraded ~10× invisibly
    to both existing canaries (one is pure CPU, the other pure
    scheduling). This probe writes 64 MiB to the run-scratch
    filesystem (the same one every materialized landing and shuffle
    spill uses), fsyncs, EVICTS the written pages from the page cache
    (posix_fadvise DONTNEED — a fresh read fd alone does NOT drop the
    cache, so without the eviction the read leg measures memory
    bandwidth and the probe is blind to exactly the read-side
    degradation that motivated it; r15 ADVICE #1), and reads it back
    from disk — it moves ONLY when disk throughput does. Median of 3.
    On filesystems where fadvise is a no-op (e.g. some overlayfs) the
    read leg degrades to cache speed and the probe still carries the
    write/fsync signal — strictly no worse than before."""
    from customer_review__etl_spark.scratch import run_scratch

    d = Path(run_scratch("iocanary_"))
    block = os.urandom(1 << 20)  # 1 MiB of incompressible bytes

    def one(i: int) -> float:
        p = d / f"probe_{i}.bin"
        t0 = time.time()
        with open(p, "wb") as f:
            for _ in range(64):
                f.write(block)
            f.flush()
            os.fsync(f.fileno())
            if hasattr(os, "posix_fadvise"):
                os.posix_fadvise(
                    f.fileno(), 0, 0, os.POSIX_FADV_DONTNEED
                )
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass
        sec = time.time() - t0
        p.unlink()
        return sec

    return round(sorted(one(i) for i in range(3))[1], 3)


def _canary_check(spark, out: dict) -> None:
    """Run the probe, compare to the trailing median of previous runs
    (bench_canary_history.json, kept in-repo), and stamp the result
    into the bench output. A >1.2× drift means the machine is loaded
    and every number in this artifact is suspect — the warning is the
    artifact's own confession, catching contamination at run time
    instead of judge time."""
    sec = _canary_probe(spark)
    jobs_sec = _canary_jobs_probe(spark)
    out["canary_sec"] = sec
    out["canary_jobs_sec"] = jobs_sec
    hist_path = Path(__file__).resolve().parent / "bench_canary_history.json"
    hist: list[dict] = []
    if hist_path.exists():
        try:
            hist = json.loads(hist_path.read_text())
        except ValueError:
            hist = []
    # The baseline is the median of CLEAN history only (round-12
    # ADVICE #1): samples that were themselves flagged stay in the
    # file for the record but are excluded from the median, otherwise
    # a persistently loaded machine ratchets the trailing median up
    # and the >1.2× warning self-silences after ~10 hot runs.
    prev = sorted(
        h["sec"] for h in hist if not h.get("ambient_load_warning")
    )
    if prev:
        med = prev[len(prev) // 2]
        out["canary_trailing_median"] = med
        out["ambient_load_warning"] = bool(sec > 1.2 * med)
        if out["ambient_load_warning"]:
            print(
                f"WARNING: canary {sec:.2f}s is {sec / med:.2f}x its "
                f"trailing median {med:.2f}s - machine under ambient "
                "load, timings in this artifact are inflated",
                file=sys.stderr,
            )
    # Scheduler dimension (round 13): compared to ITS clean history;
    # a drift here with a clean compute canary means job-count-heavy
    # rows (graph fixpoints, streaming, Python-worker queries) are
    # inflated while scan/shuffle-bound rows are fine — the artifact
    # says WHICH numbers to distrust.
    cores = max(1, spark.sparkContext.defaultParallelism)
    sched_warn, med_j, basis, extra = _jobs_canary_verdict(
        hist, jobs_sec, cores
    )
    out.update(extra)
    if med_j is not None:
        out["canary_jobs_trailing_median"] = med_j
        out["canary_jobs_baseline_basis"] = basis
    out["scheduler_overhead_warning"] = sched_warn
    if sched_warn:
        print(
            f"WARNING: jobs canary {jobs_sec:.2f}s "
            f"({jobs_sec / 40 * 1000:.0f} ms/job) exceeds its bound - "
            "driver-side scheduling is degraded, job-count-heavy "
            "timings in this artifact are inflated",
            file=sys.stderr,
        )
    # Disk-throughput dimension (round 15): compared to ITS clean
    # history. A drift here with the other two canaries green means
    # landing builds, shuffle spills, and scratch-consuming reps are
    # inflated while pure-compute rows are fine. Threshold 1.5× (disk
    # is noisier than CPU); no bootstrap floor — the first sample
    # seeds the history.
    io_sec = _canary_io_probe()
    out["canary_io_sec"] = io_sec
    io_warn, med_io = _io_canary_verdict(hist, io_sec)
    if med_io is not None:
        out["canary_io_trailing_median"] = med_io
    out["io_throughput_warning"] = io_warn
    if io_warn:
        print(
            f"WARNING: io canary {io_sec:.2f}s is "
            f"{io_sec / med_io:.2f}x its trailing median {med_io:.2f}s "
            "- scratch-filesystem throughput is degraded, landing "
            "builds and spill-heavy timings in this artifact are "
            "inflated",
            file=sys.stderr,
        )
    entry = {"ts": round(time.time(), 1), "sec": sec, "jobs_sec": jobs_sec,
             "io_sec": io_sec, "io_probe_v": IO_PROBE_VERSION}
    if out.get("io_throughput_warning"):
        entry["io_throughput_warning"] = True
    if out.get("ambient_load_warning"):
        entry["ambient_load_warning"] = True
    if out.get("scheduler_overhead_warning"):
        entry["scheduler_overhead_warning"] = True
    if basis is not None:
        # auditability (round-13 VERDICT ask #4): the history records
        # WHAT the verdict for this sample was judged against
        entry["jobs_baseline"] = med_j
        entry["jobs_baseline_basis"] = basis
    hist.append(entry)
    hist_path.write_text(json.dumps(hist[-20:], indent=1) + "\n")


def _canary_recheck(spark, out: dict) -> None:
    """END-of-run canary re-probe (r15): the three start probes cannot
    see a wave that arrives mid-run — the second r15 headline attempt
    started all-green and finished with 1.1 rep spreads and a 2×
    scratch_build. Re-probe the two cheap dimensions (compute + IO)
    after the timed work and compare against the SAME clean-history
    medians the start probes used; a flagged end probe stamps
    mid_run_contamination_warning on the artifact and on this run's
    history entry, even though the start was clean. (The start-sample
    values stay valid baseline feed — they were measured at a clean
    moment; only the artifact's trustworthiness changes.)"""
    sec2 = _canary_probe(spark)
    io2 = _canary_io_probe()
    out["canary_end_sec"] = sec2
    out["canary_end_io_sec"] = io2
    warn = False
    med = out.get("canary_trailing_median")
    if med and sec2 > 1.2 * med:
        warn = True
    med_io = out.get("canary_io_trailing_median")
    if med_io and io2 > 1.5 * med_io:
        warn = True
    out["mid_run_contamination_warning"] = warn
    if warn:
        print(
            f"WARNING: end-of-run canaries (compute {sec2:.2f}s, io "
            f"{io2:.2f}s) exceed their clean medians - an ambient wave "
            "arrived MID-RUN; rep spreads in this artifact locate the "
            "affected rows",
            file=sys.stderr,
        )
    hist_path = Path(__file__).resolve().parent / "bench_canary_history.json"
    try:
        hist = json.loads(hist_path.read_text())
    except (OSError, ValueError):
        return
    if hist:
        hist[-1]["end_sec"] = sec2
        hist[-1]["end_io_sec"] = io2
        if warn:
            hist[-1]["mid_run_contamination_warning"] = True
        hist_path.write_text(json.dumps(hist[-20:], indent=1) + "\n")


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    small_dir = os.environ.get(
        "SPARK_GRAFT_SF_SMALL_DIR", "/root/testdata/sf0.01"
    )
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))

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

    out: dict = {"metric": "wall_sec_total", "unit": "sec", "reps": reps}
    _canary_check(spark, out)

    # --canary-only: probe the environment, append to the canary
    # history, and exit — used to (re)establish the jobs-canary
    # baseline (round-13 VERDICT ask #4) without paying a full bench.
    if "--canary-only" in sys.argv[1:]:
        print(json.dumps({
            k: v for k, v in out.items() if k.startswith("canary")
            or k.endswith("warning")
        }))
        return 0

    if small_dir and os.path.isdir(small_dir) and small_dir != sf_dir:
        small = _time_queries(spark, qs, small_dir, reps)[0]
        out["sf_small"] = _sf_of(small_dir)
        out["queries_small"] = small
    else:
        small = {}

    timings, rep_detail, scratch_detail, scratch_windows, scratch_io = (
        _time_queries(spark, qs, sf_dir, reps)
    )
    _canary_recheck(spark, out)
    out["value"] = round(sum(timings.values()), 3)
    out["queries"] = timings
    out["queries_reps"] = rep_detail
    # per-intermediate attribution of the scratch_build row (walls
    # overlap: builds after "shingles" run concurrently)
    out["scratch_build_detail"] = scratch_detail
    # landing attribution (r15 VERDICT optional #7): per-kind [start,
    # end] offsets inside the warm window plus IO-probe readings taken
    # immediately before/after it — a mid-run disk wave points at the
    # specific landings whose windows it overlaps (post ≫ pre with a
    # green start canary = the wave arrived DURING the warm phase)
    out["scratch_build_windows"] = scratch_windows
    out["scratch_build_io_probe"] = scratch_io
    # spread = (max-min)/min per query — the contention/caching
    # instability signal; anything > ~0.5 means the min is not a
    # steady-state number and cross-round deltas for that query are
    # noise until root-caused.
    out["rep_spread"] = {
        n: round((max(ts) - min(ts)) / min(ts), 2)
        for n, ts in rep_detail.items()
        if min(ts) > 0
    }
    out["sf"] = _sf_of(sf_dir)
    if small:
        out["scale_ratio"] = {
            n: round(timings[n] / small[n], 2)
            for n in timings
            if small.get(n)
        }

    # Full detail survives in-repo regardless of stdout truncation.
    # Subset A/B runs (SPARK_GRAFT_ONLY) write their own file so they
    # can never clobber the committed full-headline record (r15).
    subset_run = bool(os.environ.get("SPARK_GRAFT_ONLY", "").strip(","))
    detail_name = (
        "bench_full_subset.json" if subset_run else "bench_full.json"
    )
    detail_path = Path(__file__).resolve().parent / detail_name
    detail_path.write_text(json.dumps(out, indent=1) + "\n")

    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "reps": reps,
        "n_queries": len(timings),
        "detail": detail_path.name,
    }
    for k in ("canary_sec", "canary_trailing_median", "ambient_load_warning",
              "canary_jobs_sec", "canary_jobs_trailing_median",
              "canary_jobs_baseline_basis", "scheduler_overhead_warning",
              "canary_io_sec", "canary_io_trailing_median",
              "io_throughput_warning", "canary_end_sec",
              "canary_end_io_sec", "mid_run_contamination_warning"):
        if k in out:
            compact[k] = out[k]
    ratios = out.get("scale_ratio", {})
    if ratios:
        worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
        compact["worst_scale_ratio"] = dict(worst)
    spreads = out.get("rep_spread", {})
    if spreads:
        noisy = sorted(spreads.items(), key=lambda kv: -kv[1])[:5]
        compact["worst_rep_spread"] = dict(noisy)
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    compact["slowest"] = dict(slowest)
    # The driver contract requires the per-query map inline:
    # {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
    # r16 dropped it past 1500 chars, which left PERF_r16.per_query empty;
    # always emit it now (compact separators keep the line as short as
    # possible in case the capture window is bounded).
    with_queries = dict(compact, queries=timings)
    print(json.dumps(with_queries, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
