"""Vector math over array<float|double> columns.

Parity: mllib/src/main/scala/linalg/implicits.scala:21-102 (cosine,
similarityScore=(cos+1)/2, sum/minus/scale/norm over Dense/Sparse).

The reference uses BLAS on JVM vectors; here each kernel is a Column
expression over ``zip_with``/``aggregate`` so it runs inside codegen and
never crosses into Python. For batch-heavy kernels (e.g. top-k search)
see operators/similarity.py which also offers a numpy pandas-UDF path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _dsum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    return _dsum(F.zip_with(_as_col(a), _as_col(b), lambda x, y: x * y))


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(_dsum(F.transform(_as_col(a), lambda x: x * x)))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b); 0.0 when either side has zero norm (reference treats
    empty vectors as orthogonal)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def similarity_score(a: Column | str, b: Column | str) -> Column:
    """(cos+1)/2 ∈ [0,1] — linalg/implicits.scala similarityScore."""
    return (cosine_similarity(a, b) + 1.0) / 2.0


def vec_sum(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_as_col(a), _as_col(b), lambda x, y: x + y)


def vec_minus(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_as_col(a), _as_col(b), lambda x, y: x - y)


def vec_scale(a: Column | str, s: Column | float) -> Column:
    s = F.lit(s) if not isinstance(s, Column) else s
    return F.transform(_as_col(a), lambda x: x * s)


def vec_agg_sum(a: Column | str) -> Column:
    """Element-wise SUM aggregate over an array column (use inside
    ``groupBy().agg``): reduce(zip_with(+)). Parity with the reference's
    GroupBy vector reductions (feature/GroupBy.scala:38-56)."""
    return F.reduce(
        F.collect_list(_as_col(a)),
        F.lit(None).cast("array<double>"),
        lambda acc, x: F.when(acc.isNull(), x.cast("array<double>")).otherwise(
            F.zip_with(acc, x, lambda p, q: p + q)
        ),
    )


def vec_agg_mean(a: Column | str) -> Column:
    summed = vec_agg_sum(a)
    n = F.count(_as_col(a))
    return F.transform(summed, lambda x: x / n)


def sparse_merge(a: Column | str, b: Column | str) -> Column:
    """Union-of-indices sum of two sparse vectors held as map<k, v>
    columns — the reference's SemanticVector merge iterator
    (linalg/implicits.scala:105-152) as one codegen'd ``map_zip_with``:
    keys present on either side survive, overlapping keys add."""
    return F.map_zip_with(
        _as_col(a),
        _as_col(b),
        lambda k, v1, v2: F.coalesce(v1, F.lit(0)) + F.coalesce(v2, F.lit(0)),
    )


def sparse_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two sparse map<k, v> vectors: fold a's entries,
    looking each key up in b (missing → 0) — no densification."""
    bc = _as_col(b)
    return F.aggregate(
        F.map_entries(_as_col(a)),
        F.lit(0.0),
        lambda acc, e: acc
        + e["value"].cast("double")
        * F.coalesce(F.element_at(bc, e["key"]), F.lit(0)).cast("double"),
    )


def well_formed(a: Column | str) -> Column:
    """True iff the vector is usable by the vector-consuming operators:
    non-NULL and free of NULL elements. Real corpora carry embedding
    gaps (failed encoder batches, schema drift); every embedding-fed
    query applies this hygiene gate at ingestion — the vector twin of
    the text operators' decoded-utf-8 precondition. The oracle twin is
    ``_VEC_OK_SQL`` in queries.py (DuckDB's list kernels hard-error on
    NULL elements rather than returning NULL, so the gate is also what
    makes the two engines comparable). Degenerate-fuzz fixture rows
    200/201 pin it across the embedding suite (r8 fixture audit)."""
    c = _as_col(a)
    return c.isNotNull() & ~F.exists(c, lambda x: x.isNull())
