"""Native (JVM-side) vector math over array<float> columns.

All pure Catalyst expressions — `zip_with` + `aggregate` keep the math in
whole-stage codegen; no Python in the hot path. Used by entity-linking
scoring and the vector top-k query surface (SURVEY.md Q13/Q14 mapping).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    num = dot(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def cosine_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Cosine for a KNOWN dimension, unrolled to literal-index expressions.

    Catalyst higher-order functions (zip_with/aggregate) are interpreted
    per element — measurably slow at millions of rows. Unrolled index
    arithmetic stays inside whole-stage codegen and produces the exact
    same left-associated IEEE result as the HOF form.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b

    def _chain(terms):
        acc = F.lit(0.0) + terms[0]
        for t in terms[1:]:
            acc = acc + t
        return acc

    num = _chain([a[i] * b[i] for i in range(dim)])
    na = F.sqrt(_chain([a[i] * a[i] for i in range(dim)]))
    nb = F.sqrt(_chain([b[i] * b[i] for i in range(dim)]))
    den = na * nb
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))
