"""Round-6 operators: triangle counting (gr02), small-file compaction
(io07), streaming keyed upsert (st10) — plan-shape and invariant tests
beyond the differential oracle gate."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_gr02_no_cartesian_and_credit_sum(spark):
    """The degree-ordered wedge join must stay a hash join (an all-pairs
    fallback would defeat the O(m^1.5) bound), and total per-node credit
    must be 3× the number of triangles (each triangle credits exactly
    its three vertices)."""
    from customer_review__etl_spark.plans import graphplans

    df = graphplans.gr02_triangle_count(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    total_credit = df.agg(F.sum("n_triangles")).collect()[0][0]
    assert total_credit % 3 == 0
    spark.catalog.clearCache()


def test_io07_compacts_to_computed_file_count(spark):
    """The rewrite must actually reduce file count to the size-derived
    target, not just roundtrip the rows."""
    import glob

    from customer_review__etl_spark.plans import ioplans

    from customer_review__etl_spark.sources import tables

    df = ioplans.io07_compaction(spark, SF_DIR)
    n_docs = tables.load(spark, SF_DIR, "documents").count()
    assert df.count() == n_docs  # roundtripped, content-complete
    # the compacted dir is the newest io07_compact_* under this
    # process's run-scratch root
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp",
        f"run_{os.getpid()}_*",
        "io07_compact_*",
    )
    dirs = sorted(glob.glob(root), key=os.path.getmtime)
    assert dirs, "compacted scratch dir not found"
    files = [f for f in os.listdir(dirs[-1]) if f.endswith(".parquet")]
    # sf0.001 documents are far under the 1 MiB target → exactly 1 file,
    # down from the 64 deliberately fragmented inputs
    assert len(files) == 1


def test_io08_overwrites_only_the_changed_partition(spark):
    """Dynamic mode must leave every other partition's files physically
    untouched (the write-amplification claim): after the second write,
    only partition s_nationkey=IO08_PART has newer files than the base
    load — and all 25 partitions are still present (a static overwrite
    would have wiped the other 24)."""
    import glob

    from customer_review__etl_spark.plans import ioplans

    from customer_review__etl_spark.sources import tables

    src = tables.load(spark, SF_DIR, "supplier")
    n_parts = src.select("s_nationkey").distinct().count()
    df = ioplans.io08_dynamic_partition_overwrite(spark, SF_DIR)
    parts = df.select("s_nationkey").distinct().count()
    assert parts == n_parts  # static mode would leave 1
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp",
        f"run_{os.getpid()}_*",
        "io08_dynover_*",
    )
    dirs = sorted(glob.glob(root), key=os.path.getmtime)
    assert dirs, "io08 scratch dir not found"
    out = dirs[-1]

    def newest_mtime(part_dir: str) -> int:
        return max(
            os.stat(f).st_mtime_ns
            for f in glob.glob(os.path.join(part_dir, "*.parquet"))
        )

    touched = newest_mtime(
        os.path.join(out, f"s_nationkey={ioplans.IO08_PART}")
    )
    others = [
        newest_mtime(d)
        for d in glob.glob(os.path.join(out, "s_nationkey=*"))
        if not d.endswith(f"s_nationkey={ioplans.IO08_PART}")
    ]
    assert len(others) == n_parts - 1
    assert all(touched > m for m in others)


def test_u04_udtf_explodes_multisentence_docs(spark):
    """The fixture corpus has punctuation-free docs (1 fragment each),
    so pin the actual explosion semantics on a crafted corpus: empty
    fragments dropped, positions 1-based per doc, NULL text → 0 rows."""
    from customer_review__etl_spark.plans import relational

    # registers u04_sentences as a side effect
    relational.u04_sentence_udtf(spark, SF_DIR).limit(1).collect()
    df = spark.createDataFrame(
        [(1, "one. two! three?"), (2, "..."), (3, None), (4, "solo")],
        "doc_id BIGINT, text STRING",
    )
    rows = spark.sql(
        """
        SELECT d.doc_id, s.pos, s.sentence
        FROM {d} d, LATERAL u04_sentences(d.text) s
        ORDER BY d.doc_id, s.pos
        """,
        d=df,
    ).collect()
    got = [(r.doc_id, r.pos, r.sentence) for r in rows]
    assert got == [
        (1, 1, "one"),
        (1, 2, " two"),
        (1, 3, " three"),
        (4, 1, "solo"),
    ]


def test_run_incremental_checkpoint_resume(spark, tmp_path):
    """The durable-checkpoint catch-up contract: a second run after new
    source files land processes ONLY the delta — every event_id appears
    exactly once in the cumulative sink, and the first run's batch dirs
    are not rewritten."""
    import glob

    from customer_review__etl_spark.sources import tables
    from customer_review__etl_spark.streaming import jobs

    ev = tables.load(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type"
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    a.write.mode("append").parquet(src)

    def stream():
        return spark.readStream.schema(ev.schema).parquet(src)

    got1 = jobs.run_incremental(stream(), ckpt, out)
    assert got1.count() == a.count()
    first_dirs = {
        d: max(
            os.stat(f).st_mtime_ns for f in glob.glob(os.path.join(d, "*"))
        )
        for d in glob.glob(os.path.join(out, "batch=*"))
    }

    b.write.mode("append").parquet(src)
    got2 = jobs.run_incremental(stream(), ckpt, out)
    assert got2.count() == ev.count()
    assert (
        got2.select("event_id").distinct().count() == ev.count()
    )  # each id exactly once — the delta run didn't reprocess A
    for d, mtime in first_dirs.items():
        still = max(
            os.stat(f).st_mtime_ns for f in glob.glob(os.path.join(d, "*"))
        )
        assert still == mtime, f"first run's {d} was rewritten"


def test_st10_upsert_is_batch_chop_independent(spark, tmp_path):
    """Replay the same events in MANY micro-batches (one file each) and
    assert the final snapshot still equals the global latest-per-key —
    the MERGE correctness property run_keyed_upsert claims."""
    from customer_review__etl_spark.sources import tables
    from customer_review__etl_spark.streaming import jobs

    ev = tables.load(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    # shatter into 8 files so AvailableNow+maxFilesPerTrigger=1 yields
    # 8 micro-batches arriving in arbitrary file order
    src = str(tmp_path / "events_multi")
    ev.repartition(8).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = jobs.run_keyed_upsert(
        stream, keys=["user_id"], order_cols=["ts", "event_id"]
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    want = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
    assert len(got_rows) == ev.select("user_id").distinct().count()
