"""Source/sink roundtrip plans (SURVEY.md §2.1 S2-S4) — the CSV and
parquet writer/reader paths exercised inside the driver's correctness
gate, not just in unit tests.

Each roundtrip writes to a fresh scratch dir under the repo's .tmp/,
reads the result back with an explicit schema (ingest discipline,
SURVEY §1.3 — never inference in the engine path), and returns the
re-read rows; the oracle is a plain SELECT over the original table, so
the hash gate proves write→read is lossless.

Scale notes: both writers are the native distributed committers (one
file per partition, no driver funneling); `coalesce(1)` appears only
here, on a 25-row dimension table, to exercise the documented
single-file convenience path. Values roundtrip exactly: CSV carries
integer keys and strings only (no float text parsing), parquet is
binary-exact for all types.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..sources import sinks, tables
from . import QuerySpec

_NATION_SCHEMA = "n_nationkey INT, n_name STRING, n_regionkey INT"


def _scratch(prefix: str) -> str:
    base = Path(__file__).resolve().parents[2] / ".tmp"
    base.mkdir(exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def io01_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S3: nation → header CSV (single-file path) → explicit-schema
    read-back. Hash gate certifies losslessness vs the parquet original."""
    out = _scratch("io01_csv_")
    try:
        sinks.write_csv(
            tables.load(spark, sf_dir, "nation"), out, single_file=True
        )
        df = sinks.read_csv(spark, out, _NATION_SCHEMA)
        rows = df.collect()  # materialize before the scratch dir is removed
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(rows, df.schema)


def io02_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: supplier → parquet partitioned by s_nationkey → read-back.
    Partition columns come back typed from directory values; the plan
    re-selects the canonical column order."""
    out = _scratch("io02_pq_")
    try:
        src = tables.load(spark, sf_dir, "supplier")
        sinks.write_parquet(src, out, partition_by=["s_nationkey"])
        # Explicit schema: a zero-row partitioned write leaves nothing
        # to infer from, and the engine never relies on inference anyway.
        df = spark.read.schema(src.schema).parquet(out).select(*src.columns)
        df = df.withColumn(
            "s_nationkey", df["s_nationkey"].cast("int")
        )
        rows = df.collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(rows, df.schema)


SPECS = [
    QuerySpec(
        "io01_csv_roundtrip",
        io01_csv_roundtrip,
        "SELECT * FROM nation",
    ),
    QuerySpec(
        "io02_parquet_roundtrip",
        io02_parquet_roundtrip,
        "SELECT * FROM supplier",
    ),
]
