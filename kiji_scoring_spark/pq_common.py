"""Shared PQ / IVF-PQ constants and DuckDB oracle fragments.

A LEAF module (imports nothing from this package) so both
``queries_pipeline`` (the batch PQ / IVF-PQ queries) and ``queries_ml``
(the streaming ANN-index ingest, whose oracle string is built at
decoration time) can use them regardless of which module a caller
imports first — the fragments living in ``queries_pipeline`` created a
circular import through ``queries``'s registration chain.
"""

from __future__ import annotations

_EMBED_DIM = 64
_PQ_SUB = 8      # subspaces
_PQ_SUBDIM = _EMBED_DIM // _PQ_SUB  # dims per subspace (8)

#: IVF coarse cells for the IVF-PQ composition: the 32 corpus vectors
#: with the SMALLEST md5(vec_id) — a FIXED cell count (inverted lists
#: stay O(N/32) rows, 32 hive dirs at any corpus size) whose members are
#: uniformly SPREAD over the id space. Spread matters: the replicated
#: scale tiers remap vec_id to base*1000+copy, so any "lowest ids" rule
#: (vec_id < K, probed r13) selects seeds that are all copies of one or
#: two distinct base embeddings — the seed set collapses and one cell
#: swallows half the corpus. md5 order is deterministic, SQL-replicable,
#: and a TakeOrdered (never a global sort) on the Spark side.
_IVFPQ_NCELLS = 32

# DuckDB fragments for the PQ oracle: integer quantization q = round(x*100)
# and a per-subspace squared distance between two quantized lists. All
# arithmetic is BIGINT, so both engines are bit-identical at any magnitude.
_PQ_Q_SQL = (
    "list_transform(range(1, 65), i -> "
    "CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 100) AS BIGINT))"
)

_PQ_FULLDIST_SQL = (
    "CAST(list_sum(list_transform(range(1, 65), i -> "
    "({l}[i] - {r}[i]) * ({l}[i] - {r}[i]))) AS BIGINT)"
)


def _pq_subdist_sql(left: str, right: str) -> str:
    """Σ over a subspace (columns ss*8+1 .. ss*8+8) of squared diffs."""
    return (
        "CAST(list_sum(list_transform(range(1, 9), i -> "
        f"({left}[sub.ss*8 + i] - {right}[sub.ss*8 + i]) * "
        f"({left}[sub.ss*8 + i] - {right}[sub.ss*8 + i]))) AS BIGINT)"
    )
