"""Custom Python DataSource (the Spark 4 DataSource API) — the
source-EXTENSION surface beyond built-in file formats (SURVEY §2.1):
how a user plugs a bespoke system (an internal feed, a synthetic
generator, an unusual wire format) into the engine as a first-class
`spark.read.format(...)` citizen with real partition planning.

The source here is deliberately synthetic-deterministic (rid →
Knuth-multiplicative score) so the io11 query can carry a full DuckDB
oracle over `range()`: the gate then proves the custom-source plumbing
— schema declaration, partition enumeration, per-partition iteration,
Arrow batching back to the JVM — end to end.

Scale notes: `partitions()` is the sharding contract — each
InputPartition carries only its index, every executor task reads just
its own [lo, hi) slice, and nothing flows through the driver. A real
100 TB source returns one InputPartition per file/split/shard here.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PYDS_ROWS = 8_000        # default row count
PYDS_PARTS = 8           # default partition count
PYDS_MULT = 2_654_435_761  # Knuth multiplicative constant
PYDS_MOD = 97


class SyntheticScoreSource(DataSource):
    """`spark.read.format("synthetic_scores")` — options: rows, partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_scores"

    def schema(self) -> str:
        return "rid BIGINT, score BIGINT"

    def reader(self, schema) -> "_ScoreReader":
        return _ScoreReader(
            int(self.options.get("rows", PYDS_ROWS)),
            int(self.options.get("partitions", PYDS_PARTS)),
        )


class _ScoreReader(DataSourceReader):
    def __init__(self, rows: int, parts: int) -> None:
        self.rows = rows
        self.parts = parts

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        i = partition.value
        lo = i * self.rows // self.parts
        hi = (i + 1) * self.rows // self.parts
        for rid in range(lo, hi):
            yield rid, (rid * PYDS_MULT) % PYDS_MOD
