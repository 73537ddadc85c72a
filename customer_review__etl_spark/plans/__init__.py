"""Named query plans — the driver-facing surface of the engine.

Each QuerySpec pairs a Spark DataFrame plan with (where SQL-expressible)
an ANSI-SQL oracle twin that DuckDB runs over the same parquet tables.
Column names/aliases are kept identical on both sides (the driver's
compare sorts columns by name before value-hashing).

Determinism rules every plan follows:
- no bare LIMIT: every top-K orders by a unique tie-broken key
- no dropDuplicates for parity paths: window row_number keep-first
- float aggregates are either exact (decimal-cast sums re-cast to
  double) or deterministic sequential folds rounded on both sides
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for the DuckDB oracle; None → rows-only check
    doc: str = ""


def build_registry() -> dict[str, QuerySpec]:
    from . import (
        dedupplans,
        ioplans,
        mlplans,
        multimodalplans,
        relational,
        simplans,
        streamplans,
        textplans,
    )

    registry: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        textplans,
        dedupplans,
        simplans,
        streamplans,
        mlplans,
        multimodalplans,
        ioplans,
    ):
        for spec in mod.SPECS:
            if spec.name in registry:
                raise ValueError(f"duplicate query name: {spec.name}")
            registry[spec.name] = spec
    return registry


_REGISTRY: dict[str, QuerySpec] | None = None


def all_queries() -> dict[str, QuerySpec]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = build_registry()
    return _REGISTRY
