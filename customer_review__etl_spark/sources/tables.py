"""Typed source registry over the driver's parquet testdata.

Mirrors the reference's ingest discipline fix (SURVEY.md §1.3): the
reference inferred schema at every boundary (pd.read_csv with no dtypes,
cleaner.py:302) and patched case drift ad hoc; here every table has one
canonical schema, normalized once at load.

Scale: `spark.read.parquet` is the vectorized columnar scan — Catalyst
pushes filters and prunes columns into it, so plan code never needs to
hand-prune (the reference hand-pruned in its Cypher RETURN,
extract.py:62-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with canonical types.

    `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark's
    reader rejects; with spark.sql.legacy.parquet.nanosAsLong it arrives
    as a long that we convert with exact integer division (float
    division at 1e18 ns magnitudes loses sub-microsecond precision).
    Result is timestamp_ntz to match the other tables' date columns and
    the oracle's naive reading.
    """
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def _size_bytes(conf_val: str) -> int:
    """Parse a Spark byte conf ('1m', '128k', '134217728')."""
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    v = conf_val.strip().lower().removesuffix("b")
    if v and v[-1] in units:
        return int(float(v[:-1]) * units[v[-1]])
    return int(v)


def load_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """load() + guarantee enough partitions for CPU-heavy derivations.

    A small compressed parquet (one row group) scans as ONE task, so
    per-row text/vector work (regex, shingling, 64-dim folds) runs on
    one core no matter how many exist. Redistributing a sub-MB input is
    ~free and unlocks every core. When the scan already yields >= cores
    split-chunks — every real-scale input — this is a no-op: no shuffle
    is ever added to a big scan.

    The smallness probe is an O(1) file-size stat (local paths; remote
    object stores skip the stat and the repartition — at that scale
    inputs are multi-file anyway), never a plan/RDD materialization.
    """
    import os

    df = load(spark, sf_dir, name)
    want = spark.sparkContext.defaultParallelism
    max_pb = _size_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    try:
        n_splits = os.path.getsize(f"{sf_dir}/{name}.parquet") // max_pb + 1
    except OSError:
        return df
    if n_splits < want:
        df = df.repartition(want)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() entry points."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
