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


def pq_drift_sql(emb: str, codes: str, cbm: str) -> str:
    """``pq_drift_expr``'s 64-term sum as ONE Spark-SQL string, for
    callers whose three inputs are expressible as SQL text. The repeated
    codebook-lookup text per subspace parses to the same repeated
    subtree the Column build produced by reusing one ``cq`` object, so
    the analyzed plan is unchanged — only the ~600 py4j round-trips of
    driver-side tree construction (~0.6 s per call, profiled r15) are
    gone (the r14 parsed-string lesson applied to the drift policy)."""
    terms = []
    for s in range(_PQ_SUB):
        cq = f"try_element_at({cbm}, try_element_at({codes}, {s + 1}))"
        for i in range(s * _PQ_SUBDIM + 1, (s + 1) * _PQ_SUBDIM + 1):
            d = f"(try_element_at({emb}, {i}) - try_element_at({cq}, {i}))"
            terms.append(f"{d} * {d}")
    return " + ".join(terms)


def _sql_of(x):
    """SQL text for an input that is a string (a column name / SQL
    fragment) or a Column tagged with ``_kss_sql`` by the producing
    helper (model._col / fresh._versions_expr). Column.__getattr__
    fabricates field-access Columns for unknown single-underscore
    names, so the instance dict is consulted directly."""
    if isinstance(x, str):
        return x
    return vars(x).get("_kss_sql") if hasattr(x, "__dict__") else None


def pq_drift_expr(emb, codes, cbm):
    """Integer-exact PQ reconstruction distance between a CURRENT
    quantized embedding and a STORED codes cell: for each of the 8
    subspaces, the squared distance between the embedding's subvector
    and the codebook entry the stored code names — Σ over all 64 dims.

    `emb` is an array<long>(64) column, `codes` an array<long>(8) of
    code ids, `cbm` a map<long, array<long>(64)> broadcast-LUT column
    (code id → that codebook entry's quantized vector). All BIGINT, so
    Spark and a SQL oracle agree bit-for-bit at any magnitude. NULL
    anywhere (no codes yet, unknown code id) propagates to NULL — the
    caller decides the null policy (the drift freshness policy treats
    it as stale; the rescore producer's NULL keeps the old cell, A10).

    64 static projection terms (not HOF lambdas), so Catalyst CSEs the
    8 map lookups and the whole thing stays in codegen. When every
    input carries SQL text (plain string, or a Column tagged with
    ``_kss_sql``), the sum is built as one parsed string — same tree,
    one py4j call instead of ~600."""
    import functools
    import operator

    from pyspark.sql import functions as F

    sqls = [_sql_of(x) for x in (emb, codes, cbm)]
    if all(s is not None for s in sqls):
        return F.expr(pq_drift_sql(*sqls))

    def _c(x):
        return F.col(x) if isinstance(x, str) else x

    emb, codes, cbm = _c(emb), _c(codes), _c(cbm)
    terms = []
    for s in range(_PQ_SUB):
        cq = F.try_element_at(cbm, F.try_element_at(codes, F.lit(s + 1)))
        for i in range(s * _PQ_SUBDIM + 1, (s + 1) * _PQ_SUBDIM + 1):
            d = F.try_element_at(emb, F.lit(i)) - F.try_element_at(cq, F.lit(i))
            terms.append(d * d)
    return functools.reduce(operator.add, terms)
