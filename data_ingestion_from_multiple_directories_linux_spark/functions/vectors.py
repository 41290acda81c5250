"""Vector expressions for embedding similarity search.

Embeddings are ``array<float>`` columns (TESTDATA embeddings.parquet,
64-dim). All arithmetic is JVM-side higher-order functions — zip_with /
aggregate — inside whole-stage codegen; no Python UDFs, no driver-side
numpy.

Determinism contract: dot products and squared norms are accumulated as
``sum(floor(x*y * 1e9))`` over BIGINT. The per-element double product is
bit-identical in any IEEE engine, ``floor`` is exact, and integer sums are
exact and order-independent — so Spark's fold, a map-side partial
aggregation, and DuckDB's list_sum all produce the same value, which is
what lets the correctness oracle compare float-derived results exactly.
(Plain double accumulation is order-dependent; DECIMAL casts round
half-up in Spark but half-even in DuckDB — both were rejected.) The final
cosine is one double division on the quantized integers — identical IEEE
semantics in both engines; quantization error is ~1e-9 per element,
irrelevant for ranking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: dot/norm quantization: 9 decimal digits survive the float32 inputs.
SCALE = 1e9


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_double_array(col: Column | str) -> Column:
    """array<float> → array<double> (all math happens in double)."""
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot_q(a: Column | str, b: Column | str) -> Column:
    """Quantized dot product as an exact BIGINT sum:
    ``sum(floor((a_i * b_i) * 1e9))``. Inputs must already be double."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: F.floor((x * y) * F.lit(SCALE)).cast("long")
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def norm_sq_q(a: Column | str) -> Column:
    """Quantized squared L2 norm (same integer quantization as dot_q)."""
    return dot_q(a, a)


def cosine_q(dot: Column, norm_sq_a: Column, norm_sq_b: Column) -> Column:
    """Cosine from quantized dot / squared norms. The 1e9 scales cancel:
    (dot/1e9) / sqrt(na/1e9 * nb/1e9) == dot / sqrt(na*nb); the product
    is computed in double (na*nb can reach ~1e18, near BIGINT's edge)."""
    return dot.cast("double") / F.sqrt(
        norm_sq_a.cast("double") * norm_sq_b.cast("double")
    )


# --- DuckDB oracle twins (SQL snippet builders) ---------------------------


def sql_dot_q(a_vec: str, b_vec: str) -> str:
    """DuckDB twin of :func:`dot_q` over two list expressions.

    NULL contract matches Spark EXACTLY (review finding): Spark's
    ``aggregate`` propagates NULL from any NULL element or from the
    NULL padding ``zip_with`` adds on a length mismatch, while DuckDB's
    ``list_sum`` silently SKIPS NULL terms — a malformed embedding
    would produce a partial sum on one engine and NULL on the other.
    The guard makes the twin return NULL for ragged/NULL-bearing
    inputs, and 0 (not list_sum's NULL) for empty lists, mirroring
    Spark's fold from the 0 initial value."""
    s = (
        f"list_sum(list_transform(range(len({a_vec})), "
        f"i -> CAST(floor(({a_vec}[i+1] * {b_vec}[i+1]) * 1e9) AS BIGINT)))"
    )
    return (
        f"CASE WHEN len({a_vec}) = len({b_vec}) "
        f"AND len(list_filter({a_vec}, x -> x IS NULL)) = 0 "
        f"AND len(list_filter({b_vec}, x -> x IS NULL)) = 0 "
        f"THEN CAST(COALESCE({s}, 0) AS BIGINT) END"
    )


def sql_norm_sq_q(a_vec: str) -> str:
    return sql_dot_q(a_vec, a_vec)


def sql_cosine_q(dot: str, norm_a: str, norm_b: str) -> str:
    return f"CAST({dot} AS DOUBLE) / sqrt(CAST({norm_a} AS DOUBLE) * CAST({norm_b} AS DOUBLE))"
