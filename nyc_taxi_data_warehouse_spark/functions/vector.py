"""Vector math over ``array<float>`` embedding columns — built-ins only.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side (no Python
per row). Floats are widened to double BEFORE any arithmetic so results
are bit-comparable with engines that compute in double (DuckDB's
list_dot_product), and so 64-dim accumulation error stays negligible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL similarity instead of an
    # ANSI DIVIDE_BY_ZERO that would fail the whole job (hypothesis-found).
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_hoisted(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """``cosine(a, b)`` with the per-row norms precomputed BEFORE the
    candidate join. Bit-identical to ``cosine``: ``norm`` over the same
    double array yields the same double wherever it is evaluated, and
    the denominator keeps the ``norm(a) * norm(b)`` operand order. The
    point is cost shape: per candidate PAIR this evaluates one
    interpreted fold (the dot) instead of three — the two self-dots
    move to once-per-ROW on each join side."""
    return F.try_divide(dot(a, b), a_norm * b_norm)


def indexable(vec: Column) -> Column:
    """True iff the vector can participate in cosine ranking: non-null,
    non-empty, finite positive norm. Zero vectors yield NULL cosine
    (try_divide) and NaN components sort FIRST under desc ordering —
    both pollute top-k candidate lists, so index writers filter on
    this predicate."""
    n2 = dot(as_double(vec), as_double(vec))
    return (
        vec.isNotNull()
        & (F.size(vec) > 0)
        & ~F.isnan(n2)
        & (n2 > 0.0)
        # ±Inf components give n2 = inf (not NaN, > 0) yet still yield
        # NaN/NULL cosine downstream — require a finite norm too.
        & (n2 < F.lit(float("inf")))
    )
