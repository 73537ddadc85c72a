"""Similarity-search plans over the `embeddings` table (array<float>,
64-dim): brute-force cosine top-k as the exactness baseline, and
hyperplane-LSH bucketed variants as the scale path (ANN top-k and
near-duplicate pair mining).

Everything is JVM-side higher-order-function math (functions.vectors) —
no UDFs. Cross-engine determinism: both Spark's `aggregate` fold and
DuckDB's list_dot_product/list_cosine_similarity are sequential
left-to-right double folds, verified bit-identical on this data, so
even the float cosine values hash-match and every query here has a full
oracle twin.

The LSH hyperplanes are derived from a pure-integer formula (Knuth
multiplicative hash of the (plane, dim) index), not an RNG, so both
engines construct bit-identical planes with no literal tables:

    plane[p][d] = ((p*64 + d) * 2654435761 mod 2^32) / 2^31 - 1.0

Scale notes:
- s01 broadcasts the tiny query side over the candidate scan: one
  map-side pass, no shuffle of the big side; the top-k window
  partitions by query id (small state per partition).
- s02/s03 shuffle on the integer bucket key only — the classic
  sign-LSH partitioning; recall is the standard LSH trade and the
  oracle implements the identical buckets, so the check is exact.
- at 100 TB: more planes/bands + multiprobe, and pre-normalized
  vectors to halve the per-pair cost; the plan shape is unchanged.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_from_norms, l2_norm
from ..sources import tables
from . import QuerySpec
from .helpers import sql_cc_min_label

N_QUERIES = 16   # s01 brute-force query set: vec_id < 16
TOPK = 5         # s01 neighbors per query
ANN_PLANES = 6   # s02: 6 sign bits → 64 buckets
ANN_TOPK = 3
NEAR_BANDS = 2   # s03: 2 bands × 3 planes
NEAR_COS = 0.4   # s03 near-pair threshold (matches testdata's top tail)


# One cached relation per op, swapped on re-invocation (round-10
# ADVICE #2): s09/s10 cache their bucketed embedding scan because the
# plan reads it 3-4 times, but a long-lived session (bench loops,
# scale-probe reps) would otherwise accumulate one cached relation per
# call until an external clearCache. Unpersisting the PREVIOUS call's
# cache bounds storage at one relation per op; a still-held stale
# DataFrame simply recomputes.
_CACHE_SLOTS: dict[str, DataFrame] = {}
# bench builds plans from multiple threads (round-11 ADVICE #1): an
# unguarded pop/assign pair can leak a cached relation or unpersist one
# an in-flight concurrent job is reading (correct but slow — Spark
# recomputes). Mirrors materialized_df's per-kind locking.
_CACHE_LOCK = threading.Lock()


def _cache_slot(key: str, df: DataFrame) -> DataFrame:
    with _CACHE_LOCK:
        prev = _CACHE_SLOTS.pop(key, None)
        if prev is not None:
            try:
                prev.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
        _CACHE_SLOTS[key] = df.cache()
        return _CACHE_SLOTS[key]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings + a precomputed L2 norm per vector: each vector's
    norm is folded ONCE at scan time, so candidate joins pay one dot
    product + one multiply per pair instead of three O(d) folds
    (round-2 VERDICT perf item #4)."""
    emb = tables.load_parallel(spark, sf_dir, "embeddings")
    return emb.withColumn("nrm", l2_norm(F.col("embedding")))


def _plane_dot_expr(p: int, planes_per_unit: int = 64) -> str:
    """Spark SQL: sequential fold of embedding·plane[p] (see module
    docstring for the integer plane formula)."""
    return (
        "aggregate(sequence(0, 63), cast(0.0 as double), (acc, d) -> "
        f"acc + embedding[d] * (((({p} * 64) + d) * 2654435761) % 4294967296 "
        "/ 2147483648.0 - 1.0))"
    )


def _sql_plane_dot(p: int) -> str:
    """DuckDB twin of _plane_dot_expr (list_dot_product is the same
    sequential fold; range(0,64) is 0..63, list indexing 1-based)."""
    return (
        "list_dot_product(embedding::DOUBLE[], "
        f"list_transform(range(0, 64), d -> (((({p} * 64) + d) * 2654435761) "
        "% 4294967296) / 2147483648.0 - 1.0))"
    )


def _bucket_col(n_planes: int, first_plane: int = 0) -> Column:
    bits = [
        F.when(F.expr(_plane_dot_expr(first_plane + p)) > 0, 2 ** p).otherwise(0)
        for p in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def _sql_bucket(n_planes: int, first_plane: int = 0) -> str:
    return (
        "CAST("
        + " + ".join(
            f"(CASE WHEN {_sql_plane_dot(first_plane + p)} > 0 "
            f"THEN {2 ** p} ELSE 0 END)"
            for p in range(n_planes)
        )
        + " AS BIGINT)"
    )


def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for queries vec_id < 16: the
    correctness baseline every ANN variant is judged against."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    return (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            cosine_from_norms(
                F.col("q_emb"), F.col("n_emb"),
                F.col("q_nrm"), F.col("n_nrm"),
            ).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("q_id", "n_id", "cos", "rn")
    )


def s02_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN: 6 hyperplane sign bits → 64 buckets; exact cosine
    top-3 within each query's bucket. The scale path for s01."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "embedding", "nrm", _bucket_col(ANN_PLANES).alias("bucket")
    )
    q = emb.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
        F.col("bucket").alias("n_bucket"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    # the neighbor side carries the full corpus embeddings - never
    # broadcastable at scale; pinned sort-merge (round-12 audit)
    return (
        q.join(
            c.hint("merge"),
            (F.col("q_bucket") == F.col("n_bucket"))
            & (F.col("q_id") != F.col("n_id")),
        )
        .select(
            "q_id",
            "n_id",
            cosine_from_norms(
                F.col("q_emb"), F.col("n_emb"),
                F.col("q_nrm"), F.col("n_nrm"),
            ).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ANN_TOPK)
        .select("q_id", "n_id", "cos", "rn")
    )


def s03_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share ≥1 of
    2 LSH bands (3 planes each), verified by exact cosine ≥ 0.4.

    Candidates come from a hash equi-join on the exploded
    (band_idx, bucket) key — an OR-of-band-equalities join condition
    would force an all-pairs nested loop. Only (vec_id, band, bucket)
    triples are shuffled for candidate generation; the 64-dim vectors
    are joined back solely for the per-candidate cosine check."""
    emb = _cache_slot(
        "s03",
        _emb(spark, sf_dir).select(
            "vec_id",
            "embedding",
            "nrm",
            _bucket_col(3, first_plane=0).alias("band0"),
            _bucket_col(3, first_plane=3).alias("band1"),
        ),
    )
    bands = emb.select(
        "vec_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), F.col("band0").alias("bv")),
                F.struct(F.lit(1).alias("band"), F.col("band1").alias("bv")),
            )
        ).alias("e"),
    ).select("vec_id", "e.band", "e.bv")
    b2 = bands.select(
        F.col("vec_id").alias("vec_b"),
        F.col("band").alias("band_b"),
        F.col("bv").alias("bv_b"),
    )
    cand = (
        bands.join(
            b2,
            (F.col("band") == F.col("band_b"))
            & (F.col("bv") == F.col("bv_b"))
            & (F.col("vec_id") < F.col("vec_b")),
        )
        .select(F.col("vec_id").alias("vec_a"), "vec_b")
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    # exact-verify joins against the corpus embedding table: the
    # embedding sides must never broadcast (round-12 audit pin)
    return (
        cand.join(ea.hint("merge"), "vec_a")
        .join(eb.hint("merge"), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            cosine_from_norms(
                F.col("emb_a"), F.col("emb_b"),
                F.col("nrm_a"), F.col("nrm_b"),
            ).alias("cos"),
        )
        .filter(F.col("cos") >= NEAR_COS)
    )


N_CENTROIDS = 8  # s04 IVF coarse-quantizer size (vec_id < 8 seed points)
IVF_TOPK = 3


def s04_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest of 8
    deterministic centroids (the vec_id<8 seed vectors), then answer
    each query (vec_id<16) from its own inverted list only.

    The centroid table is tiny and broadcast for assignment — one
    map-side pass over the collection, no shuffle of embeddings; the
    probe join shuffles on the integer cell id. At 100 TB the
    centroids come from a sampled k-means (pyspark.ml KMeans) and
    n_centroids grows to √N, but the plan shape is identical."""
    emb = _emb(spark, sf_dir)
    cent = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_emb"),
        F.col("nrm").alias("cent_nrm"),
    )
    wassign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), "cent_id")
    assigned = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "nrm",
            "cent_id",
            cosine_from_norms(
                F.col("embedding"), F.col("cent_emb"),
                F.col("nrm"), F.col("cent_nrm"),
            ).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(wassign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "nrm", F.col("cent_id").alias("cell"))
    )
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("cell").alias("q_cell"),
    )
    c = assigned.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
        F.col("cell").alias("n_cell"),
    )
    wtop = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    return (
        q.join(
            c,
            (F.col("q_cell") == F.col("n_cell"))
            & (F.col("q_id") != F.col("n_id")),
        )
        .select(
            "q_id",
            "n_id",
            cosine_from_norms(
                F.col("q_emb"), F.col("n_emb"),
                F.col("q_nrm"), F.col("n_nrm"),
            ).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= IVF_TOPK)
        .select("q_id", "n_id", "cos", "rn")
    )


# ---------------------------------------------------------------------------
# Occupancy-gated ADAPTIVE DEPTH (round-11 VERDICT ask #3). The s09/s10
# level loops are depth-parameterized, and a level whose every bucket
# path sits at or under its cap is provably a NO-OP: no path saturates,
# so every home key k_lv and probe key p_lv is the sentinel -1 and the
# level's equi-join term matches trivially — the depth-D plan returns
# results bit-identical to the depth-(D_eff) plan, where D_eff is the
# deepest genuinely ACTIVE level. But a dormant level is not free to
# COMPILE: each one adds a size-table aggregate, two broadcast joins
# and an explode to the physical plan (r11 measured depth-3 s09 at 17
# exchanges / 34 broadcasts vs r9's 5/10, ~2× wall at sf0.1 where the
# deep levels never fire). So each call runs a one-job pre-scan first:
# ONE groupBy over the banded keys at the finest prospective grouping
# (map-side combinable into ≤ base·8^(D-1) groups — 1 024 rows for s09,
# 512 for s10; an O(1 KB) collect), then replays the exact per-level
# saturation cascade driver-side on that tiny table and compiles ONLY
# the active levels. The decision rule is the SAME rule the plan's
# size tables implement (level lv groups rows whose every ancestor
# path saturated, by the path through r_{lv-1}), so the chosen plan is
# hash-identical to the static depth-MAX oracle by construction — the
# dormancy equivalence is exact, not heuristic. At 100 TB the pre-scan
# is one partial-agg pass over the embedding scan; the payoff is a
# main plan whose exchange/broadcast count tracks the corpus's real
# occupancy instead of the worst-case knob.
# ---------------------------------------------------------------------------


def _cascade_effective_depth(
    fine: list[tuple],
    base_len: int,
    caps: tuple[int, ...],
    max_depth: int,
) -> int:
    """Replay the per-level saturation cascade on the collected fine
    occupancy table. `fine` rows are (base_key..., r1..r_{max_depth-1},
    n); `caps[0]` gates level 1 and `caps[-1]` every deeper level.
    Returns the deepest ACTIVE level (≥ 1 — one dormant level keeps
    the generators' loop shape and costs a single sentinel column)."""
    if max_depth <= 1:
        return max_depth
    live = {tuple(r[:-1]): int(r[-1]) for r in fine}
    for lv in range(1, max_depth + 1):
        plen = base_len + lv - 1
        sizes: dict[tuple, int] = {}
        for key, n in live.items():
            pk = key[:plen]
            sizes[pk] = sizes.get(pk, 0) + n
        cap = caps[0] if lv == 1 else caps[-1]
        sat = {g for g, n in sizes.items() if n > cap}
        if not sat:
            # level lv is dormant → so is every deeper one (their size
            # sources filter on k_{lv} ≥ 0, which no row has)
            return max(lv - 1, 1)
        live = {k: n for k, n in live.items() if k[:plen] in sat}
    return max_depth


# Effective-depth memo (round-12 ADVICE #2): the occupancy pre-scan is
# a full-corpus job, and s09/s10 are built far more often than their
# corpus changes — every bench rep, every explain-only plan_audit
# build, every oracle run in a sweep. Memoize per (op, corpus
# signature); the signature is the embeddings parquet file listing
# (name, size, mtime_ns), so a probe that overwrites the same path
# invalidates naturally. Signature failure (remote path, racing
# writer) falls back to scanning — never to a stale answer.
_DEPTH_MEMO: dict[tuple, int] = {}


def _emb_signature(sf_dir: str) -> tuple | None:
    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        if os.path.isdir(path):
            return tuple(sorted(
                (e.name, e.stat().st_size, e.stat().st_mtime_ns)
                for e in os.scandir(path)
            ))
        st = os.stat(path)
        return ((path, st.st_size, st.st_mtime_ns),)
    except OSError:
        return None


def _memo_depth(op: str, sf_dir: str, knobs: tuple, scan) -> int:
    sig = _emb_signature(sf_dir)
    if sig is None:
        return scan()
    key = (op, sf_dir, knobs, sig)
    with _CACHE_LOCK:
        if key in _DEPTH_MEMO:
            return _DEPTH_MEMO[key]
    depth = scan()  # outside the lock: a racing double-scan is
    # harmless and cheaper than serializing concurrent bench builds
    with _CACHE_LOCK:
        # one live entry per op: probe scratch dirs are throwaway,
        # so dropping the previous corpus's entry bounds the memo
        for k in [k for k in _DEPTH_MEMO if k[0] == op]:
            del _DEPTH_MEMO[k]
        _DEPTH_MEMO[key] = depth
    return depth


def _s09_effective_depth(spark: SparkSession, sf_dir: str) -> int:
    # the cap knobs are part of the key: stress tests monkeypatch them,
    # and the cascade's answer is a function of (corpus, caps, depth)
    return _memo_depth(
        "s09",
        sf_dir,
        (S09_BUCKET_CAP, S09_SUBBUCKET_CAP, S09_MAX_DEPTH),
        lambda: _s09_effective_depth_scan(spark, sf_dir),
    )


def _s09_effective_depth_scan(spark: SparkSession, sf_dir: str) -> int:
    """One-job occupancy pre-scan for s09: fine counts per
    (band, bv, r1..r_{D-1}) — r columns use the same per-band
    disjoint-plane formula as the main plan, so the cascade replayed
    on the collected table is the plan's own saturation rule."""
    D = S09_MAX_DEPTH
    if D <= 1:
        return D
    e = tables.load_parallel(spark, sf_dir, "embeddings").select(
        "embedding",
        _bucket_col(3, first_plane=0).alias("band0"),
        _bucket_col(3, first_plane=3).alias("band1"),
        *[
            _bucket_col(3, first_plane=6 * lv + 3 * b).alias(f"sub{lv}b{b}")
            for lv in range(1, D)
            for b in (0, 1)
        ],
    )
    bands = e.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col(f"band{b}").alias("bv"),
                        *[
                            F.col(f"sub{lv}b{b}").alias(f"r{lv}")
                            for lv in range(1, D)
                        ],
                    )
                    for b in (0, 1)
                ]
            )
        ).alias("e")
    ).select("e.*")
    fine = bands.groupBy(
        "band", "bv", *[f"r{lv}" for lv in range(1, D)]
    ).agg(F.count(F.lit(1)).alias("n")).collect()
    return _cascade_effective_depth(
        [tuple(r) for r in fine], 2, (S09_BUCKET_CAP, S09_SUBBUCKET_CAP), D
    )


def _s10_effective_depth(spark: SparkSession, sf_dir: str) -> int:
    return _memo_depth(
        "s10",
        sf_dir,
        (S10_BUCKET_CAP, S10_MAX_DEPTH),
        lambda: _s10_effective_depth_scan(spark, sf_dir),
    )


def _s10_effective_depth_scan(spark: SparkSession, sf_dir: str) -> int:
    """s09's pre-scan on the directed (single 64-way bucket) shape."""
    D = S10_MAX_DEPTH
    if D <= 1:
        return D
    e = tables.load_parallel(spark, sf_dir, "embeddings").select(
        _bucket_col(ANN_PLANES).alias("bucket"),
        *[
            _bucket_col(3, first_plane=3 * lv + 3).alias(f"r{lv}")
            for lv in range(1, D)
        ],
    )
    fine = e.groupBy(
        "bucket", *[f"r{lv}" for lv in range(1, D)]
    ).agg(F.count(F.lit(1)).alias("n")).collect()
    return _cascade_effective_depth(
        [tuple(r) for r in fine], 1, (S10_BUCKET_CAP,), D
    )


S09_BUCKET_CAP = 200  # level-1 (band, bucket) occupancy refinement cap
# sub-bucket occupancy cap driving every DEEPER split (levels >= 2).
# A separate knob from S09_BUCKET_CAP: each refinement level trades
# ~0.69x recall on the pairs it touches (P[<=1-bit/3-plane
# disagreement at cos 0.4]), so deployments tune the levels
# independently - refine level N only where level N-1 is genuinely
# saturated, one decade of corpus growth per level (SCALING.md).
S09_SUBBUCKET_CAP = 200
# refinement levels below the band bucket. The round-10 30x probe
# measured depth-2 at 69-78x wall (completing where depth-1 timed out
# >370x): 30x sf0.1 is 1.5 decades, and the per-level stacking rule
# says the half-decade past depth-2's budget needs level 3. The
# construction is a LOOP, not hand-unrolled levels — raising this knob
# is the entire scale response as a corpus grows by further decades.
S09_MAX_DEPTH = 3


def s09_capped_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s03 with OCCUPANCY-ADAPTIVE bucketing — the engineered answer to
    the round-9 scale probe's finding (SCALING.md): s03's fixed 3-plane
    bands give 8 buckets per band, so per-bucket occupancy grows
    linearly with the corpus and within-bucket candidate PAIRS grow
    quadratically (measured 12.8× wall at 10× data). Here any level-1
    (band, bucket) whose member count exceeds S09_BUCKET_CAP is
    refined with 3 MORE hyperplanes (an 8-way split of exactly the
    crowded buckets); small buckets keep a sentinel sub-key so their
    candidates are untouched. Candidate fan-out is then bounded by
    C(cap + sub-bucket occupancy, 2) per key instead of C(n/8, 2) —
    the d04-DF-cap idea transplanted to vector LSH. Truly identical
    embeddings can still crowd one sub-bucket, but those pairs are
    TRUE near-dups (quadratic OUTPUT, collapsed downstream by s05's
    components, the d08 argument).

    Recall trade, engineered: refinement only SPLITS buckets, so s09's
    candidate set ⊆ s03's (pinned in pytest), but a plain 8-way split
    loses pairs straddling a sub-bucket boundary (measured 0.22 recall
    vs s03 under an aggressive cap — cos 0.4 pairs disagree on a given
    hyperplane with p ≈ 0.37). So refined members MULTIPROBE (the s07
    move applied at level 2): each probes its own sub-bucket plus the
    three hamming-distance-1 ones, recovering every pair whose
    sub-signatures differ in ≤ 1 of 3 bits per band — measured 0.65
    recall under the same aggressive stress cap, and 0.83 at the
    shipped cap on sf0.1 (where refinement is genuinely active and
    s09 already runs ~1.9× faster than s03; both pinned in pytest) —
    for a bounded 4× key fan-out on exactly the crowded buckets. The level-1 size table is 16 rows
    (2 bands × 8 buckets) and broadcasts; everything else is s03's
    shape: explode to (vec_id, band, key) triples, hash equi-join,
    exact cosine ≥ NEAR_COS on candidates only.

    GENERALIZED DEPTH (round-11 — SCALING.md's level-stacking rule as
    a LOOP, not hand-unrolled levels): the round-9 30× probe showed
    one 8-way refinement level buys one decade of corpus growth before
    its sub-buckets themselves exceed the cap, and the round-10 depth-2
    measurement confirmed it (30× = 1.5 decades → depth-2 completes at
    69–78× wall where depth-1 timed out >370×, with the residual
    superlinearity coming from the saturated THIRD level). So the
    construction is one loop over S09_MAX_DEPTH levels: at level lv
    any path (band, bv, k1..k_{{lv-1}}) whose occupancy exceeds its cap
    splits 8 more ways on that level's planes, with hamming-1
    multiprobe at every refined level (≤1-bit disagreement per level
    recovered; fan-out 4^lv probe keys paid ONLY by members of
    lv-times-crowded buckets). Consistency rule that makes the
    asymmetric probing exact at every level: the level-(lv+1) decision
    for a probe keys on the occupancy of the TARGET path
    (band, bv, p1..p_lv), identical to the home-side decision of any
    member it can meet there — so both sides of every candidate pair
    agree on whether level lv+1 participates in the key. The level-lv
    size table is ≤ 2·8^lv rows and broadcasts. Raising S09_MAX_DEPTH
    is the entire scale response for further decades of growth.

    Per-band planes at every level (round-10 ADVICE #1): level lv,
    band b uses planes 6·lv+3·b .. 6·lv+3·b+2 — disjoint across bands
    AND levels. With a shared sub column, a crowded pair differing ≥2
    bits on it was dropped from BOTH bands at once, correlating band
    misses exactly where the 2-band OR-construction is supposed to
    rescue recall; disjoint planes restore the per-band independence
    the ~0.69×-per-level recall model assumes.

    ADAPTIVE DEPTH (round-11 VERDICT ask #3): S09_MAX_DEPTH is the
    CEILING; each call first runs the one-job occupancy pre-scan
    (_s09_effective_depth, rationale at its definition) and compiles
    only the levels the corpus actually saturates. A dormant level's
    keys are all sentinel -1, so the shallow plan is hash-identical to
    the static depth-MAX oracle — while small corpora get back the
    r9-era 5-exchange plan instead of paying 17 exchanges / 34
    broadcasts of dormant machinery (the r11 bench's one real
    per-query regression)."""
    D = _s09_effective_depth(spark, sf_dir)
    emb = _cache_slot(
        "s09",
        _emb(spark, sf_dir).select(
            "vec_id",
            "embedding",
            "nrm",
            _bucket_col(3, first_plane=0).alias("band0"),
            _bucket_col(3, first_plane=3).alias("band1"),
            # level lv, band b → planes 6·lv+3·b .. 6·lv+3·b+2 (the
            # per-band disjointness rule at every level)
            *[
                _bucket_col(3, first_plane=6 * lv + 3 * b).alias(
                    f"sub{lv}b{b}"
                )
                for lv in range(1, D + 1)
                for b in (0, 1)
            ],
        ),
    )
    bands = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col(f"band{b}").alias("bv"),
                        *[
                            F.col(f"sub{lv}b{b}").alias(f"r{lv}")
                            for lv in range(1, D + 1)
                        ],
                    )
                    for b in (0, 1)
                ]
            )
        ).alias("e"),
    ).select("vec_id", "e.*")
    # One loop builds both sides. HOME keys k1..kD: level lv splits on
    # r_lv iff the parent path's occupancy exceeds its cap (a child key
    # can only be live when the parent's is — unmatched size rows give
    # NULL n → sentinel -1). PROBE keys p1..pD: a member probes its own
    # sub-key plus the 3 hamming-1 variants iff the TARGET path
    # (band, bv, p1..p_{lv-1}) is refined — the occupancy it keys on is
    # the same row every home member of that path keyed on, so both
    # sides of every reachable pair agree on whether level lv
    # participates (the depth-2 consistency rule, now per level).
    # Size tables are ≤ 2·8^lv rows and broadcast.
    keyed = bands
    probes = bands
    path = ["band", "bv"]
    for lv in range(1, D + 1):
        cap = S09_BUCKET_CAP if lv == 1 else S09_SUBBUCKET_CAP
        src = keyed if lv == 1 else keyed.filter(F.col(f"k{lv - 1}") >= 0)
        sizes = src.groupBy(*path).agg(F.count(F.lit(1)).alias("n"))
        keyed = (
            keyed.join(F.broadcast(sizes), path, "left")
            .withColumn(
                f"k{lv}",
                F.when(F.col("n") > cap, F.col(f"r{lv}"))
                .otherwise(F.lit(-1))
                .cast("long"),
            )
            .drop("n")
        )
        ppath = ["band", "bv"] + [f"p{i}" for i in range(1, lv)]
        tsizes = sizes.select(
            *[F.col(c).alias(p) for c, p in zip(path, ppath)],
            F.col("n").alias("tn"),
        )
        probes = (
            probes.join(F.broadcast(tsizes), ppath, "left")
            .withColumn(
                f"p{lv}",
                F.explode(
                    F.when(
                        F.col("tn") > cap,
                        F.array(
                            F.col(f"r{lv}"),
                            F.col(f"r{lv}").bitwiseXOR(F.lit(1)),
                            F.col(f"r{lv}").bitwiseXOR(F.lit(2)),
                            F.col(f"r{lv}").bitwiseXOR(F.lit(4)),
                        ),
                    ).otherwise(F.array(F.lit(-1).cast("long")))
                ),
            )
            .drop("tn")
        )
        path = path + [f"k{lv}"]
    k2 = keyed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("band").alias("band_b"),
        F.col("bv").alias("bv_b"),
        *[F.col(f"k{lv}").alias(f"k{lv}_b") for lv in range(1, D + 1)],
    )
    cond = (
        (F.col("band") == F.col("band_b"))
        & (F.col("bv") == F.col("bv_b"))
        & (F.col("vec_id") < F.col("vec_b"))
    )
    for lv in range(1, D + 1):
        cond = cond & (F.col(f"p{lv}") == F.col(f"k{lv}_b"))
    cand = (
        probes.join(k2, cond)
        .select(F.col("vec_id").alias("vec_a"), "vec_b")
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    # exact-verify joins against the corpus embedding table: the
    # embedding sides must never broadcast (round-12 audit pin)
    return (
        cand.join(ea.hint("merge"), "vec_a")
        .join(eb.hint("merge"), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            cosine_from_norms(
                F.col("emb_a"), F.col("emb_b"),
                F.col("nrm_a"), F.col("nrm_b"),
            ).alias("cos"),
        )
        .filter(F.col("cos") >= NEAR_COS)
    )


def _s09_sql(
    cap: int | None = None,
    cap2: int | None = None,
    depth: int | None = None,
    order: bool = True,
) -> str:
    """Oracle twin of s09, generated by the SAME per-level loop as the
    Spark plan; caps parameterized (round-9 ADVICE #4) so edge tests
    can differentially exercise the refined + multiprobe paths at
    every level under small caps, and `depth` parameterized so tests
    can pin that a deeper level only PRUNES its parent's candidates.
    `order=False` yields the pair set without the final ORDER BY —
    shared verbatim by the s09 spec and s05's recursive closure so the
    two oracles can never drift (round-15: s05 migrated off the
    demoted s03 miner)."""
    if cap is None:
        cap = S09_BUCKET_CAP
    if cap2 is None:
        cap2 = S09_SUBBUCKET_CAP
    D = S09_MAX_DEPTH if depth is None else depth
    sub_cols = ",\n         ".join(
        f"{_sql_bucket(3, 6 * lv + 3 * b)} AS sub{lv}b{b}"
        for lv in range(1, D + 1)
        for b in (0, 1)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {b} AS band, band{b} AS bv, "
        + ", ".join(f"sub{lv}b{b} AS r{lv}" for lv in range(1, D + 1))
        + " FROM e"
        for b in (0, 1)
    )
    ctes = [
        "e AS (\n"
        "  SELECT vec_id, embedding::DOUBLE[] AS v,\n"
        f"         {_sql_bucket(3, 0)} AS band0,"
        f" {_sql_bucket(3, 3)} AS band1,\n"
        f"         {sub_cols}\n"
        "  FROM embeddings\n)",
        f"bands AS (\n  {band_rows}\n)",
    ]
    path = ["band", "bv"]
    for lv in range(1, D + 1):
        c = cap if lv == 1 else cap2
        keycols = ", ".join(path)
        prev = "bands" if lv == 1 else f"keyed{lv - 1}"
        where = "" if lv == 1 else f" WHERE k{lv - 1} >= 0"
        join = "JOIN" if lv == 1 else "LEFT JOIN"
        ctes.append(
            f"sizes{lv} AS (SELECT {keycols}, count(1) AS n FROM {prev}"
            f"{where} GROUP BY {keycols})"
        )
        ctes.append(
            f"keyed{lv} AS (\n"
            f"  SELECT k.*, CASE WHEN s.n > {c} THEN k.r{lv} ELSE -1 END"
            f" AS k{lv}\n"
            f"  FROM {prev} k {join} sizes{lv} s USING ({keycols})\n)"
        )
        pprev = "bands" if lv == 1 else f"p{lv - 1}"
        on = " AND ".join(
            f"s.{k} = p.{pk}"
            for k, pk in zip(
                path, ["band", "bv"] + [f"p{i}" for i in range(1, lv)]
            )
        )
        keep = ", ".join(
            [f"p.p{i}" for i in range(1, lv)]
            + [f"p.r{i}" for i in range(lv + 1, D + 1)]
        )
        keep = f" {keep}," if keep else ""
        ctes.append(
            f"p{lv} AS (\n"
            f"  SELECT p.vec_id, p.band, p.bv,{keep} _u{lv}.p{lv}\n"
            f"  FROM {pprev} p LEFT JOIN sizes{lv} s ON {on},\n"
            f"       UNNEST(CASE WHEN s.n > {c}\n"
            f"                   THEN [p.r{lv}, xor(p.r{lv}, 1),"
            f" xor(p.r{lv}, 2), xor(p.r{lv}, 4)]\n"
            f"                   ELSE [CAST(-1 AS BIGINT)] END)"
            f" AS _u{lv}(p{lv})\n)"
        )
        path = path + [f"k{lv}"]
    keymatch = " AND ".join(
        f"a.p{lv} = b.k{lv}" for lv in range(1, D + 1)
    )
    ctes.append(
        "cand AS (\n"
        "  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b\n"
        f"  FROM p{D} a JOIN keyed{D} b\n"
        f"    ON a.band = b.band AND a.bv = b.bv AND {keymatch}\n"
        "   AND a.vec_id < b.vec_id\n"
        "  GROUP BY 1, 2\n)"
    )
    body = ",\n".join(ctes)
    tail = "ORDER BY vec_a, vec_b\n" if order else ""
    return f"""
WITH {body}
SELECT c.vec_a, c.vec_b, {_cos('ea.v', 'eb.v')} AS cos
FROM cand c JOIN e ea ON ea.vec_id = c.vec_a
            JOIN e eb ON eb.vec_id = c.vec_b
WHERE {_cos('ea.v', 'eb.v')} >= {NEAR_COS}
{tail}"""


def s09_pairs_m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized s09 capped-LSH near-dup pair set — one occupancy-
    adaptive mining pass per process per corpus (consumer: s05 + its
    reps). Round-15: replaces the retired s03_pairs_m — s03's
    fixed-plane miner (convicted quadratic, SCALING.md) is demoted to
    plans/baselines.py and s05 rides the scale-safe generator."""
    from .dedupplans import materialized_df

    return materialized_df(
        spark, sf_dir, "s09_pairs", s09_capped_lsh_neardup,
        ["vec_a", "vec_b"],
    )


def s05_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style SEMANTIC dedup decision: collapse the s09
    embedding near-dup pairs into connected components and keep the
    lowest-vec_id representative per cluster — the embedding-space
    twin of d05 (text-space), turning ANN pair mining into an actual
    survivor map. Two documents never sharing a token but embedded
    nearby (translations, paraphrases) collapse here, which no
    fingerprint/shingle signal can do.

    Pair source (round-15): s09's occupancy-adaptive capped LSH — the
    scale-safe miner — not the demoted fixed-plane s03 (see
    plans/baselines.py). Below the caps s09's candidate set is
    bit-identical to s03's, so fixture-scale clusters are unchanged;
    at crowded-bucket scales s05 inherits s09's bounded fan-out
    instead of s03's quadratic.

    Scale: identical shape to d05 — edges are (long, long) pairs from
    the capped-LSH candidate join, components via min-label
    propagation with pointer jumping (O(log diameter) rounds), output
    is a left join of the full collection against the label map."""
    from .dedupplans import connected_components

    pairs = s09_pairs_m(spark, sf_dir).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    labels = connected_components(pairs)
    vecs = _emb(spark, sf_dir).select("vec_id")
    return (
        vecs.join(labels, vecs["vec_id"] == labels["node"], "left")
        .select(
            "vec_id",
            F.coalesce(F.col("lbl"), F.col("vec_id")).alias("cluster_id"),
        )
        .withColumn(
            "survivor",
            (F.col("vec_id") == F.col("cluster_id")).cast("int"),
        )
    )


PQ_M = 4        # s06: subspaces (64 dims → 4 × 16)
PQ_SUBDIM = 16
PQ_K = 8        # codewords per subspace (vec_id < 8 seed subvectors)
PQ_TOPK = 3


def _pq_d2_expr(m: int, a: str = "embedding", b: str = "cent_emb") -> str:
    """Spark SQL: sequential-fold squared L2 distance between the m-th
    16-dim subvectors of two array columns. Elements are cast to double
    BEFORE subtracting — float-minus-float would round at float
    precision while the DuckDB twin subtracts doubles."""
    o = PQ_SUBDIM * m
    d = f"(cast({a}[d] as double) - cast({b}[d] as double))"
    return (
        f"aggregate(sequence({o}, {o + PQ_SUBDIM - 1}), "
        f"cast(0.0 as double), (acc, d) -> acc + {d} * {d})"
    )


def _sql_pq_d2(m: int, a: str, b: str) -> str:
    """DuckDB twin of _pq_d2_expr: elementwise diff list, then the
    list_dot_product sequential fold (verified bit-identical to Spark's
    aggregate fold; 0.0 + t0 ≡ t0 so the missing explicit init is
    exact)."""
    o = PQ_SUBDIM * m
    diff = (
        f"list_transform(range({o}, {o + PQ_SUBDIM}), "
        f"d -> {a}[d + 1] - {b}[d + 1])"
    )
    return f"list_dot_product({diff}, {diff})"


def s06_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011, public): each
    vector compresses to 4 codes — per 16-dim subspace, the id of the
    nearest of 8 deterministic codewords (the vec_id<8 seed
    subvectors) — and queries rank candidates by ASYMMETRIC distance:
    the query's exact subvector vs the candidate's codeword, summed
    over subspaces via a per-query 4×8 lookup table.

    This is the memory-bound scale path past IVF: the collection is
    represented by 4 small ints per vector (here; 8-16 bytes at
    production bit-widths vs 256 bytes of floats), so the scan side of
    the search never touches raw embeddings — only the tiny query-side
    LUT does. At 100 TB the codebook comes from sampled k-means per
    subspace and an IVF cell filter (s04) prunes the candidate scan;
    the encode/LUT/rank plan shape is identical.

    Determinism: argmin via min over the (d2, cent_id) pair — exact
    lexicographic comparison, cent_id breaks ties; ADC adds the 4 LUT
    entries in fixed left-to-right order; both engines share the exact
    construction, so even the double ADC values hash-match."""
    emb = tables.load_parallel(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_emb"),
    )
    xc = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cent_id",
        *[F.expr(_pq_d2_expr(m)).alias(f"d2_{m}") for m in range(PQ_M)],
    )
    codes = xc.groupBy("vec_id").agg(
        *[
            F.min(
                F.array(F.col(f"d2_{m}"), F.col("cent_id").cast("double"))
            )[1].cast("long").alias(f"c{m}")
            for m in range(PQ_M)
        ]
    )
    luts = (
        xc.filter(F.col("vec_id") < N_QUERIES)
        .groupBy("vec_id")
        .agg(
            *[
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("cent_id").alias("k"),
                                F.col(f"d2_{m}").alias("v"),
                            )
                        )
                    ),
                    lambda s: s["v"],
                ).alias(f"l{m}")
                for m in range(PQ_M)
            ]
        )
        .withColumnRenamed("vec_id", "q_id")
    )
    adc = None
    for m in range(PQ_M):
        term = F.element_at(
            F.col(f"l{m}"), (F.col(f"c{m}") + 1).cast("int")
        )
        adc = term if adc is None else adc + term
    w = Window.partitionBy("q_id").orderBy("adc", "n_id")
    return (
        codes.withColumnRenamed("vec_id", "n_id")
        .crossJoin(F.broadcast(luts))
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", adc.alias("adc"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("q_id", "n_id", "adc", "rn")
    )


_SQL_COS = (
    "CASE WHEN sqrt(list_dot_product({a}, {a})) * "
    "sqrt(list_dot_product({b}, {b})) = 0 THEN 0.0 "
    "ELSE list_cosine_similarity({a}, {b}) END"
)


def s07_multiprobe_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe sign-LSH ANN — the recall knob the module docstring
    promises for 100 TB, made real (the p06→p16 move applied to s02):
    each query probes its own bucket PLUS the 6 hamming-distance-1
    buckets (one sign bit flipped), so vectors that fell just across a
    hyperplane are recovered without adding tables or planes.
    tests/test_round6_ops.py asserts recall(s07) ≥ recall(s02) against
    the s01 exact ground truth.

    Probe buckets of one query are pairwise distinct by construction
    (bucket ⊕ 2^b are all different), so a candidate can match at most
    one probe — no dedup pass is needed and the join stays a pure hash
    equi-join on the probe key. Cost: 7× the candidate-generation rows
    of s02 (still O(n·probes), never all-pairs); at 100 TB the probe
    count is the tunable recall/cost dial, the plan shape is fixed."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "embedding", "nrm", _bucket_col(ANN_PLANES).alias("bucket")
    )
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(2 ** b))
            for b in range(ANN_PLANES)
        ],
    )
    q = emb.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.explode(probes).alias("probe"),
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
        F.col("bucket").alias("n_bucket"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    # the neighbor side carries the full corpus embeddings - never
    # broadcastable at scale; pinned sort-merge (round-12 audit)
    return (
        q.join(
            c.hint("merge"),
            (F.col("probe") == F.col("n_bucket"))
            & (F.col("q_id") != F.col("n_id")),
        )
        .select(
            "q_id",
            "n_id",
            cosine_from_norms(
                F.col("q_emb"), F.col("n_emb"),
                F.col("q_nrm"), F.col("n_nrm"),
            ).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ANN_TOPK)
        .select("q_id", "n_id", "cos", "rn")
    )


def _cos(a: str, b: str) -> str:
    return _SQL_COS.format(a=a, b=b)


def _s02_sql() -> str:
    """The full s02 ANN query — shared verbatim by the s02 spec and
    ml09's kNN-vote oracle (the _s03_pairs_sql sharing pattern) so the
    candidate semantics can never drift between the two."""
    return f"""
        WITH e AS (
          SELECT vec_id, embedding, embedding::DOUBLE[] AS v,
                 {_sql_bucket(ANN_PLANES)} AS bucket
          FROM embeddings
        ),
        pairs AS (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                 {_cos('q.v', 'c.v')} AS cos
          FROM e q JOIN e c
            ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT q_id, n_id, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, n_id) AS rn
          FROM pairs
        )
        SELECT q_id, n_id, cos, CAST(rn AS BIGINT) AS rn
        FROM ranked WHERE rn <= {ANN_TOPK}
        """


S10_BUCKET_CAP = 200  # occupancy cap, gating EVERY refinement level
# refinement levels below the 64-way bucket (the s09 loop on the
# directed shape). The round-10 30x probe measured the hand-unrolled
# single level at 45-52x wall — exactly the next-level saturation s09
# showed (150 K vectors → ~290 per sub-bucket > cap); depth 2's 8-way
# split lands leaf occupancy ~37 at 30x. Raising the knob is the whole
# scale response for further decades.
S10_MAX_DEPTH = 2


def s10_capped_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s02's sign-LSH ANN with OCCUPANCY-ADAPTIVE buckets — the s09
    construction applied to the ANN (directed top-k) shape, closing the
    round-9 probe's conviction of s02 (fixed 64 buckets → per-bucket
    occupancy grows with the corpus → 472× wall at 30×,
    SCALE_PROBE_30x.json): any bucket path whose occupancy exceeds
    S10_BUCKET_CAP splits 8 ways on that level's planes (level lv →
    planes 3·lv+3 .. 3·lv+5, i.e. 6–8 then 9–11), and QUERIES in
    refined paths multiprobe their own + the 3 hamming-1 sub-keys per
    level (neighbors stay home-keyed: the q→n candidate edge is
    directed, so one probing side covers every ≤1-bit sub-signature
    difference; the probe's level-(lv+1) decision keys on the TARGET
    path's occupancy — identical to the home decision of any neighbor
    it can meet, the s09 consistency rule). Below the cap the sentinel
    keys (-1) make the plan bit-identical to s02 — at fixture scales
    (sf0.01: ~8/bucket, sf0.1: ~78/bucket) this IS s02, so ml09's vote
    semantics are unchanged where the oracle checks them, while the
    30× probe corpus (~2.3 K/bucket) refines level by level and
    candidate fan-out stays occupancy-bounded.

    Scale: the level-lv size table is ≤ 64·8^(lv-1) rows and
    broadcasts; candidates ride one hash equi-join on the full key
    path; the top-k window partitions by q_id over ≤ 4^D·cap rows per
    query. ADAPTIVE DEPTH (round-11 VERDICT ask #3): each call
    compiles only the levels the corpus saturates, chosen by the
    one-job occupancy pre-scan (_s10_effective_depth) — dormant-level
    equivalence makes the shallow plan hash-identical to the depth-MAX
    oracle, and below the level-1 cap the compiled plan is literally
    s02's."""
    D = _s10_effective_depth(spark, sf_dir)
    emb = _cache_slot(
        "s10",
        _emb(spark, sf_dir).select(
            "vec_id",
            "embedding",
            "nrm",
            _bucket_col(ANN_PLANES).alias("bucket"),
            *[
                _bucket_col(3, first_plane=3 * lv + 3).alias(f"r{lv}")
                for lv in range(1, D + 1)
            ],
        ),
    )
    keyed = emb
    probes = emb
    path = ["bucket"]
    for lv in range(1, D + 1):
        src = keyed if lv == 1 else keyed.filter(F.col(f"k{lv - 1}") >= 0)
        sizes = src.groupBy(*path).agg(F.count(F.lit(1)).alias("n"))
        keyed = (
            keyed.join(F.broadcast(sizes), path, "left")
            .withColumn(
                f"k{lv}",
                F.when(F.col("n") > S10_BUCKET_CAP, F.col(f"r{lv}"))
                .otherwise(F.lit(-1))
                .cast("long"),
            )
            .drop("n")
        )
        ppath = ["bucket"] + [f"p{i}" for i in range(1, lv)]
        tsizes = sizes.select(
            *[F.col(c).alias(p) for c, p in zip(path, ppath)],
            F.col("n").alias("tn"),
        )
        probes = (
            probes.join(F.broadcast(tsizes), ppath, "left")
            .withColumn(
                f"p{lv}",
                F.explode(
                    F.when(
                        F.col("tn") > S10_BUCKET_CAP,
                        F.array(
                            F.col(f"r{lv}"),
                            F.col(f"r{lv}").bitwiseXOR(F.lit(1)),
                            F.col(f"r{lv}").bitwiseXOR(F.lit(2)),
                            F.col(f"r{lv}").bitwiseXOR(F.lit(4)),
                        ),
                    ).otherwise(F.array(F.lit(-1).cast("long")))
                ),
            )
            .drop("tn")
        )
        path = path + [f"k{lv}"]
    q = probes.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
        *[F.col(f"p{lv}") for lv in range(1, D + 1)],
    )
    c = keyed.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
        F.col("bucket").alias("n_bucket"),
        *[F.col(f"k{lv}").alias(f"k{lv}_n") for lv in range(1, D + 1)],
    )
    cond = (F.col("q_bucket") == F.col("n_bucket")) & (
        F.col("q_id") != F.col("n_id")
    )
    for lv in range(1, D + 1):
        cond = cond & (F.col(f"p{lv}") == F.col(f"k{lv}_n"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "n_id")
    # neighbor side = full corpus embeddings: pinned sort-merge
    # (round-12 audit; ml09 inherits via the shared generator)
    return (
        q.join(c.hint("merge"), cond)
        .select(
            "q_id",
            "n_id",
            cosine_from_norms(
                F.col("q_emb"), F.col("n_emb"),
                F.col("q_nrm"), F.col("n_nrm"),
            ).alias("cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ANN_TOPK)
        .select("q_id", "n_id", "cos", "rn")
    )


def _s10_sql(cap: int | None = None, depth: int | None = None) -> str:
    """The full s10 capped-ANN query — shared verbatim by the s10 spec
    and ml09's kNN-vote oracle (the _s02_sql sharing pattern) so the
    candidate semantics can never drift; `cap` parameterized so edge
    tests differentially exercise the refined + multiprobe path, and
    `depth` so tests can pin that a deeper level only prunes. Generated
    by the SAME per-level loop as the Spark plan."""
    if cap is None:
        cap = S10_BUCKET_CAP
    D = S10_MAX_DEPTH if depth is None else depth
    sub_cols = ", ".join(
        f"{_sql_bucket(3, 3 * lv + 3)} AS r{lv}" for lv in range(1, D + 1)
    )
    ctes = [
        "e AS (\n"
        "  SELECT vec_id, embedding::DOUBLE[] AS v,\n"
        f"         {_sql_bucket(ANN_PLANES)} AS bucket,\n"
        f"         {sub_cols}\n"
        "  FROM embeddings\n)",
    ]
    path = ["bucket"]
    for lv in range(1, D + 1):
        keycols = ", ".join(path)
        prev = "e" if lv == 1 else f"keyed{lv - 1}"
        where = "" if lv == 1 else f" WHERE k{lv - 1} >= 0"
        join = "JOIN" if lv == 1 else "LEFT JOIN"
        ctes.append(
            f"sizes{lv} AS (SELECT {keycols}, count(1) AS n FROM {prev}"
            f"{where} GROUP BY {keycols})"
        )
        ctes.append(
            f"keyed{lv} AS (\n"
            f"  SELECT k.*, CASE WHEN s.n > {cap} THEN k.r{lv} ELSE -1 END"
            f" AS k{lv}\n"
            f"  FROM {prev} k {join} sizes{lv} s USING ({keycols})\n)"
        )
        pprev = "e" if lv == 1 else f"p{lv - 1}"
        on = " AND ".join(
            f"s.{k} = p.{pk}"
            for k, pk in zip(
                path, ["bucket"] + [f"p{i}" for i in range(1, lv)]
            )
        )
        keep = ", ".join(
            [f"p.p{i}" for i in range(1, lv)]
            + [f"p.r{i}" for i in range(lv + 1, D + 1)]
        )
        keep = f" {keep}," if keep else ""
        ctes.append(
            f"p{lv} AS (\n"
            f"  SELECT p.vec_id, p.v, p.bucket,{keep} _u{lv}.p{lv}\n"
            f"  FROM {pprev} p LEFT JOIN sizes{lv} s ON {on},\n"
            f"       UNNEST(CASE WHEN s.n > {cap}\n"
            f"                   THEN [p.r{lv}, xor(p.r{lv}, 1),"
            f" xor(p.r{lv}, 2), xor(p.r{lv}, 4)]\n"
            f"                   ELSE [CAST(-1 AS BIGINT)] END)"
            f" AS _u{lv}(p{lv})\n)"
        )
        path = path + [f"k{lv}"]
    keymatch = " AND ".join(f"q.p{lv} = c.k{lv}" for lv in range(1, D + 1))
    body = ",\n        ".join(ctes)
    return f"""
        WITH {body},
        pairs AS (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                 {_cos('q.v', 'c.v')} AS cos
          FROM p{D} q JOIN keyed{D} c
            ON q.bucket = c.bucket AND {keymatch}
           AND q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT q_id, n_id, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, n_id) AS rn
          FROM pairs
        )
        SELECT q_id, n_id, cos, CAST(rn AS BIGINT) AS rn
        FROM ranked WHERE rn <= {ANN_TOPK}
        """


def _s03_pairs_sql() -> str:
    """The s03 near-dup pair set WITHOUT the final ORDER BY — shared
    verbatim by the s03 spec and s05's recursive closure so the two
    oracles can never drift."""
    return f"""
        WITH e AS (
          SELECT vec_id, embedding, embedding::DOUBLE[] AS v,
                 {_sql_bucket(3, 0)} AS band0,
                 {_sql_bucket(3, 3)} AS band1
          FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_cos('a.v', 'b.v')} AS cos
        FROM e a JOIN e b
          ON (a.band0 = b.band0 OR a.band1 = b.band1)
         AND a.vec_id < b.vec_id
        WHERE {_cos('a.v', 'b.v')} >= {NEAR_COS}
    """


_S05_SQL = f"""
WITH pairs AS ({_s09_sql(order=False)}),
{sql_cc_min_label("pairs", "vec_a", "vec_b")}
SELECT emb.vec_id,
       least(emb.vec_id, coalesce(c.mn, emb.vec_id)) AS cluster_id,
       CAST(emb.vec_id = least(emb.vec_id, coalesce(c.mn, emb.vec_id))
            AS INTEGER) AS survivor
FROM embeddings emb LEFT JOIN cluster c ON c.node = emb.vec_id
ORDER BY emb.vec_id
"""


RRF_K = 60       # the standard reciprocal-rank-fusion damping constant
RRF_POOL = 100   # per-retriever candidate pool (top-N, not full lists)
RRF_TOPK = 20
RRF_ANCHOR = 0   # query = vec_id 0's embedding


def s08_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion — the
    lexical+semantic fusion step of a RAG/retrieval pipeline: the
    BM25 ranking (t24's scores, 3-term self-derived query) and the
    embedding ranking (cosine against the vec_id-0 anchor, the
    s01 machinery) each contribute their top-RRF_POOL docs, and fused
    docs score Σ 1/(RRF_K + rank) over the lists that contain them
    (standard RRF; a doc in one list only gets that one term).

    Exactness: ranks are integers from tie-broken row_numbers over
    bit-exact scores (BM25 integer-input divisions, cosine sequential
    folds — both proven hash-identical elsewhere); 1/(60+r) is one
    correctly-rounded division of exact inputs and the two terms add
    in fixed lex-then-sem order, so the fused doubles hash-match
    DuckDB.

    Scale: fusing POOLED lists is the point — each retriever
    contributes a tie-broken top-100 (a distributed TakeOrdered, not a
    global sort), so the rank windows and the full-outer fusion join
    see O(POOL) rows regardless of corpus size; ranks within a pool
    equal global ranks for exactly the rows a pool admits."""
    from .textplans import _bm25_scores

    lex_pool = (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(RRF_POOL)
        .withColumn(
            "r_lex",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), "doc_id"))
            .cast("long"),
        )
        .select("doc_id", "r_lex")
    )
    emb = _emb(spark, sf_dir).filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    anchor = emb.filter(F.col("vec_id") == RRF_ANCHOR).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    sem_pool = (
        emb.filter(F.col("vec_id") != RRF_ANCHOR)
        .crossJoin(F.broadcast(anchor))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_from_norms(
                F.col("q_emb"), F.col("embedding"),
                F.col("q_nrm"), F.col("nrm"),
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), "doc_id")
        .limit(RRF_POOL)
        .withColumn(
            "r_sem",
            F.row_number()
            .over(Window.orderBy(F.desc("cos"), "doc_id"))
            .cast("long"),
        )
        .select("doc_id", "r_sem")
    )
    fused = lex_pool.join(sem_pool, "doc_id", "full_outer").select(
        "doc_id",
        "r_lex",
        "r_sem",
        (
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("r_sem")), F.lit(0.0))
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(RRF_TOPK)


def _s08_sql() -> str:
    from .textplans import _bm25_scores_sql

    return f"""
WITH lex_pool AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
  FROM (SELECT * FROM ({_bm25_scores_sql()})
        ORDER BY bm25 DESC, doc_id LIMIT {RRF_POOL})
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
anchor AS (SELECT v AS q FROM e WHERE vec_id = {RRF_ANCHOR}),
sem AS (
  SELECT e.vec_id AS doc_id, {_cos('anchor.q', 'e.v')} AS cos
  FROM e, anchor WHERE e.vec_id <> {RRF_ANCHOR}
),
sem_pool AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r_sem
  FROM (SELECT * FROM sem ORDER BY cos DESC, doc_id LIMIT {RRF_POOL})
),
fused AS (
  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
         l.r_lex::BIGINT AS r_lex, s.r_sem::BIGINT AS r_sem,
         coalesce(1.0::DOUBLE / ({RRF_K} + l.r_lex), 0.0)
         + coalesce(1.0::DOUBLE / ({RRF_K} + s.r_sem), 0.0) AS rrf
  FROM lex_pool l FULL OUTER JOIN sem_pool s ON l.doc_id = s.doc_id
)
SELECT doc_id, r_lex, r_sem, rrf FROM fused
ORDER BY rrf DESC, doc_id LIMIT {RRF_TOPK}
"""


SPECS = [
    QuerySpec(
        "s01_cosine_topk",
        s01_cosine_topk,
        f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        pairs AS (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                 {_cos('q.v', 'c.v')} AS cos
          FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT q_id, n_id, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, n_id) AS rn
          FROM pairs
        )
        SELECT q_id, n_id, cos, CAST(rn AS BIGINT) AS rn
        FROM ranked WHERE rn <= {TOPK}
        """,
    ),
    # s02_ann_lsh / s03_embedding_neardup — the fixed-plane sign-LSH
    # baselines — were demoted to plans/baselines.py in round 15 (r14
    # VERDICT ask #4): both are convicted quadratics (s02: 472× wall at
    # 30× data, SCALING.md) whose scale-safe twins s09/s10 are
    # registered below. pytest keeps the oracle-matched baseline
    # comparison via baselines.BASELINE_SPECS.
    QuerySpec(
        "s04_ivf_ann",
        s04_ivf_ann,
        f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
                 WHERE vec_id < {N_CENTROIDS}),
        assigned AS (
          SELECT vec_id, v, cell FROM (
            SELECT e.vec_id, e.v, cent.cent_id AS cell,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_cos('e.v', 'cent.cv')} DESC, cent.cent_id) AS rn
            FROM e CROSS JOIN cent)
          WHERE rn = 1
        ),
        pairs AS (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                 {_cos('q.v', 'c.v')} AS cos
          FROM assigned q JOIN assigned c
            ON q.cell = c.cell AND q.vec_id <> c.vec_id
          WHERE q.vec_id < {N_QUERIES}
        ),
        ranked AS (
          SELECT q_id, n_id, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, n_id) AS rn
          FROM pairs
        )
        SELECT q_id, n_id, cos, CAST(rn AS BIGINT) AS rn
        FROM ranked WHERE rn <= {IVF_TOPK}
        """,
    ),
    QuerySpec("s05_semantic_clusters", s05_semantic_clusters, _S05_SQL),
    QuerySpec(
        "s06_pq_ann",
        s06_pq_ann,
        f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
                 WHERE vec_id < {PQ_K}),
        xc AS (
          SELECT e.vec_id, cent.cent_id,
                 {", ".join(
                     f"{_sql_pq_d2(m, 'e.v', 'cent.cv')} AS d2_{m}"
                     for m in range(PQ_M)
                 )}
          FROM e CROSS JOIN cent
        ),
        codes AS (
          SELECT vec_id,
                 {", ".join(
                     f"CAST(min([d2_{m}, cent_id::DOUBLE])[2] AS BIGINT)"
                     f" AS c{m}"
                     for m in range(PQ_M)
                 )}
          FROM xc GROUP BY vec_id
        ),
        luts AS (
          SELECT vec_id AS q_id,
                 {", ".join(
                     f"list(d2_{m} ORDER BY cent_id) AS l{m}"
                     for m in range(PQ_M)
                 )}
          FROM xc WHERE vec_id < {N_QUERIES} GROUP BY vec_id
        ),
        cand AS (
          SELECT q.q_id, n.vec_id AS n_id,
                 {" + ".join(
                     f"q.l{m}[n.c{m} + 1]" for m in range(PQ_M)
                 )} AS adc
          FROM luts q CROSS JOIN codes n WHERE n.vec_id <> q.q_id
        ),
        ranked AS (
          SELECT q_id, n_id, adc,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY adc, n_id) AS rn
          FROM cand
        )
        SELECT q_id, n_id, adc, CAST(rn AS BIGINT) AS rn
        FROM ranked WHERE rn <= {PQ_TOPK} ORDER BY q_id, rn
        """,
    ),
    QuerySpec(
        "s07_multiprobe_ann",
        s07_multiprobe_ann,
        f"""
        WITH e AS (
          SELECT vec_id, embedding, embedding::DOUBLE[] AS v,
                 {_sql_bucket(ANN_PLANES)} AS bucket
          FROM embeddings
        ),
        q AS (
          SELECT vec_id AS q_id, v AS qv,
                 unnest([bucket,
                         {", ".join(f"xor(bucket, {2 ** b})"
                                    for b in range(ANN_PLANES))}]) AS probe
          FROM e
        ),
        pairs AS (
          SELECT q.q_id, c.vec_id AS n_id,
                 {_cos('q.qv', 'c.v')} AS cos
          FROM q JOIN e c
            ON q.probe = c.bucket AND q.q_id <> c.vec_id
        ),
        ranked AS (
          SELECT q_id, n_id, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, n_id) AS rn
          FROM pairs
        )
        SELECT q_id, n_id, cos, CAST(rn AS BIGINT) AS rn
        FROM ranked WHERE rn <= {ANN_TOPK}
        """,
    ),
    QuerySpec("s08_rrf_fusion", s08_rrf_fusion, _s08_sql()),
    QuerySpec("s09_capped_lsh_neardup", s09_capped_lsh_neardup, _s09_sql()),
    QuerySpec("s10_capped_ann", s10_capped_ann, _s10_sql()),
]
