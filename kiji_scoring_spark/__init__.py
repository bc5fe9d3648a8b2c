"""kiji_scoring_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the kiji-scoring reference framework.

The reference (see /root/reference, surveyed in SURVEY.md) is a real-time
lazy model-scoring layer over versioned wide-column tables: reads may
trigger freshness-policy evaluation and inline producer (model) runs with
write-back. This package re-expresses those semantics Spark-first:

- ``model``     — versioned-cell column helpers (SURVEY §1.2)
- ``registry``  — freshener metadata CRUD + validation (SURVEY §2.A A13-A15)
- ``policies``  — freshness predicates as Catalyst columns (A5a-d)
- ``producers`` — scoring functions: expression / pandas / MLlib (A7/A8)
- ``fresh``     — the batch freshen pass + get/bulkGet readers (A1/A2/A7/A10)
- ``operators`` — relational + LLM-data-pipeline operators (SURVEY §2.B-2.H)
- ``sources``   — table catalog over parquet/csv/json
- ``functions`` — scalar-function surface (SURVEY §2.D)
- ``streaming`` — structured-streaming freshening (SURVEY §2.F)

Everything is DataFrame/Catalyst-declarative; Python UDFs only where Spark
built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
