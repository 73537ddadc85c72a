"""Property-based checks (hypothesis) for the two distributed
primitives the most queries stand on:

- pack_sequences (p19 + the pl04/pl05/pl06 recipes): the two-phase
  per-partition-offset cumsum must implement EXACT global
  concat-and-chunk semantics for ANY multiset of token counts and any
  input partitioning — conservation, tiling, and bounds are intrinsic
  invariants a reviewer can check without an oracle.
- connected_components (d05/d06/gr05/s05 and the recipe stage 1):
  min-label + pointer-jump to fixpoint must equal a driver-side
  union-find reference on arbitrary small graphs, including the
  shapes LSH actually produces (stars, chains, merged cliques,
  isolated pairs).

These complement the DuckDB differential harness: hypothesis explores
input SHAPES (zero-token docs, docs larger than several budgets,
single-node components, label paths against the id gradient) that the
fixed corpora hold constant.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from customer_review__etl_spark.plans.dedupplans import connected_components
from customer_review__etl_spark.plans.relational import (
    PACK_BUDGET,
    pack_sequences,
)


def test_pack_sequences_properties(spark):
    B = PACK_BUDGET

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        toks=st.lists(
            # mix zero-token docs, sub-budget docs, and docs spanning
            # several sequences (up to ~4.7 budgets)
            st.integers(min_value=0, max_value=PACK_BUDGET * 4 + 70),
            min_size=1,
            max_size=25,
        ),
        nparts=st.integers(min_value=1, max_value=7),
    )
    def check(toks, nparts):
        rows = [(i, n) for i, n in enumerate(toks)]
        docs = spark.createDataFrame(
            rows, "doc_id BIGINT, n_tokens BIGINT"
        ).repartition(nparts)
        out = pack_sequences(spark, docs).collect()

        total = sum(n for n in toks if n > 0)
        # (1) global token conservation
        assert sum(r.slice_len for r in out) == total
        # (2) per-doc conservation: every positive doc fully placed
        per_doc: dict[int, int] = {}
        for r in out:
            per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.slice_len
        assert per_doc == {i: n for i, n in enumerate(toks) if n > 0}
        # (3) bounds: slices are non-empty and stay inside the budget
        assert all(1 <= r.slice_len <= B for r in out)
        assert all(0 <= r.tok_offset and r.tok_offset + r.slice_len <= B
                   for r in out)
        # (4) tiling: every sequence except the last is exactly full,
        # and within a sequence the slices cover [0, fill) disjointly
        by_seq: dict[int, list] = {}
        for r in out:
            by_seq.setdefault(r.seq_id, []).append(r)
        if total:
            assert set(by_seq) == set(range((total + B - 1) // B))
            for sid, rs in by_seq.items():
                fill = sum(r.slice_len for r in rs)
                assert fill == (B if sid < total // B else total - B * (total // B) or B)
                spans = sorted((r.tok_offset, r.tok_offset + r.slice_len)
                               for r in rs)
                assert spans[0][0] == 0
                assert all(a2 == b1 for (_, b1), (a2, _) in zip(spans, spans[1:]))
        # (5) concat order is doc_id order: within a doc, earlier
        # sequences take earlier tokens, and doc slices appear in
        # consecutive seq_ids
        for i in range(len(toks)):
            sids = sorted(r.seq_id for r in out if r.doc_id == i)
            assert sids == list(range(min(sids), max(sids) + 1)) if sids else True

    check()


def _union_find(n_nodes: set[int], edges: list[tuple[int, int]]) -> dict:
    parent = {v: v for v in n_nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min label of each component
    out = {}
    for v in n_nodes:
        r = find(v)
        # find() roots at the min only if unions always attached the
        # larger root under the smaller one — they do (see above)
        out[v] = r
    return out


def test_connected_components_matches_union_find(spark):
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)),
            min_size=1,
            max_size=40,
        )
    )
    def check(edges):
        # drop self-loops (the callers' pair generators emit a < b)
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        nodes = {v for e in edges for v in e}
        df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
        got = {r.node: r.lbl for r in connected_components(df).collect()}
        assert got == _union_find(nodes, edges)

    check()
