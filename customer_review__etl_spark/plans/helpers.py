"""Cross-engine deterministic numeric helpers.

The driver value-hashes Spark output against DuckDB output, so floating
point must be bit-identical. Two rules make that true:

1. **Integer-exact money sums**: monetary columns carry ≤2 decimals, so
   `round(x*100)` is the exact integer of cents; summing longs is exact
   and order-independent; one final division by a power of ten is a
   single deterministic IEEE op. Engine-level SUM(double) would depend
   on partial-aggregation order and differ in the last bits.

2. **floor-scaling instead of round()**: `floor(x*1e6 + 0.5)/1e6` uses
   only IEEE-exact ops (multiply, add, floor, divide) so every engine
   computes the same double, whereas round() half-up/half-even behavior
   differs across engines on exact-half values (which dyadic floats do
   hit, e.g. 2^-7 = 0.0078125).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """Exact integer cents of a ≤2-decimal money double."""
    return F.round(col * 100).cast("long")


def sql_cents(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def floor6(col: Column) -> Column:
    """Deterministic 6-decimal quantization (see module docstring).

    Domain: |x| ≤ ~9.2e12 — Spark's floor() returns LONG, so x*1e6
    beyond int64 overflows (DuckDB's floor stays DOUBLE and silently
    diverges there). Callers only quantize ratio/cosine-scale values;
    tests/test_determinism_corpus.py pins the in-domain contract."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def sql_floor6(expr: str) -> str:
    return f"(floor(({expr}) * 1000000.0 + 0.5) / 1000000.0)"


def scaled(col: Column, decimals: int) -> Column:
    """Exact integer of a value with ≤`decimals` true decimal digits.

    Generalizes `cents`: e.g. extendedprice*(1-discount) carries 4
    decimals → scaled(col, 4) sums exactly as longs. Both engines
    compute the same double product (IEEE ops in the same order), so
    round() lands on the same integer.
    """
    return F.round(col * (10 ** decimals)).cast("long")


def sql_scaled(expr: str, decimals: int) -> str:
    return f"CAST(round(({expr}) * {10 ** decimals}) AS BIGINT)"


def sql_stopword_array() -> str:
    """The engine STOPWORDS as a DuckDB list literal (same words, same
    order) so oracle SQL filters with the identical set."""
    from ..functions.text import STOPWORDS

    inner = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"[{inner}]"


# ---------------------------------------------------------------------------
# DuckDB fragments mirroring functions.text — kept adjacent to their Spark
# twins' helpers so the two sides can only drift in one reviewable place.
# ---------------------------------------------------------------------------


def sql_normalize(expr: str) -> str:
    """DuckDB twin of text.normalize_text (F1-F3)."""
    return rf"regexp_replace(lower(coalesce({expr}, '')), '[^a-z\s]', '', 'g')"


def sql_raw_tokens(expr: str) -> str:
    """DuckDB twin of text.raw_tokens: \\s+ split, empties dropped,
    NULL ≡ empty (zero tokens, never a NULL list)."""
    return (
        rf"list_filter(string_split_regex(coalesce({expr}, ''), '\s+'), "
        rf"_t -> len(_t) > 0)"
    )


def sql_clean_tokens(expr: str) -> str:
    """DuckDB twin of text.clean_tokens (F4+F5 over normalized text)."""
    return (
        rf"list_filter(string_split_regex({sql_normalize(expr)}, '\s+'), "
        rf"_t -> len(_t) > 2 AND NOT list_contains({sql_stopword_array()}, _t))"
    )


def shuffle_width(spark) -> int:
    """Explicit-repartition width for CPU-heavy verify stages.

    Explicit `repartition(n, key)` is the cure for AQE coalescing a
    byte-tiny exchange whose ROWS are expensive to process (the d04
    straggler: per-row array_intersect cost, not byte size, is what
    matters). The width must follow the session, not a constant — 64
    on local[32], the configured shuffle width on a 1000-executor
    cluster — or the fix itself becomes the bottleneck at scale.
    AQE does not re-coalesce a user-specified numPartitions."""
    try:
        return max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        return 64
