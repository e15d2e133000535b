"""SQL surface for embedding-vector math.

dot_product / cosine_sim / l2_dist / vec_norm as Spark SQL-defined scalar
functions over ARRAY<DOUBLE> (array<float> embedding columns implicitly
widen). Bodies are pure Catalyst higher-order-function expressions
(zip_with + aggregate), so they run JVM-side inside whole-stage codegen —
the SQL counterpart of the Arrow-batched numpy kernels in
:mod:`duckdb_routing_spark.operators.similarity`, for the ad-hoc SQL user
rather than the top-k pipeline (which keeps the batch kernels: one numpy
GEMV per Arrow batch beats per-row expression trees at corpus scale).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DOT = (
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"
)
_NORM_A = "sqrt(aggregate(a, cast(0.0 as double), (acc, x) -> acc + x * x))"
_NORM_B = "sqrt(aggregate(b, cast(0.0 as double), (acc, x) -> acc + x * x))"


def register_vector_functions(spark: SparkSession) -> None:
    defs = {
        "dot_product": f"(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN {_DOT}",
        "cosine_sim": (
            "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
            f"{_DOT} / ({_NORM_A} * {_NORM_B})"
        ),
        "l2_dist": (
            "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
            "sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), "
            "cast(0.0 as double), (acc, v) -> acc + v))"
        ),
        "vec_norm": (
            "(a ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
            "sqrt(aggregate(a, cast(0.0 as double), (acc, x) -> acc + x * x))"
        ),
    }
    for name, body in defs.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
