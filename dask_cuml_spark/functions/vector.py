"""Vector math over array<float> columns — pure Spark higher-order
functions (zip_with + aggregate), the JVM-codegen substitute for the
reference's per-GPU columnar kernels (cuML distance primitives,
SURVEY.md §2A A4 / §4.2).

All arithmetic is promoted to double and folded left-to-right, which is
bitwise-identical to DuckDB's list_zip + list_transform +
list_aggregate('sum') — verified empirically (round-trip exact) — so these
are oracle-safe without rounding.

No Python UDFs here: at 100 TB these expressions run inside whole-stage
codegen; an equivalent pandas_udf would pay Arrow serialization per batch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Double-precision dot product of two array columns."""
    prods = F.zip_with(
        _to_col(a), _to_col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Double-precision squared L2 distance."""
    diffs = F.zip_with(
        _to_col(a),
        _to_col(b),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def l2(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance."""
    return F.sqrt(l2_sq(a, b))


def cosine_unit(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity for unit-norm vectors (≡ dot product —
    fixtures are exactly unit-norm, FIXTURES.md)."""
    return dot(a, b)


def norm_sq(a: Column | str) -> Column:
    """Squared L2 norm of an array column."""
    return dot(a, a)


def matrix_lit(mat) -> Column:
    """array<array<double>> literal (e.g. a centroid table) in ONE call.

    PySpark's F.lit on a nested list expands client-side into one lit()
    py4j round trip PER ELEMENT (an 8×64 centroid table = ~2.8k socket
    round trips, measured 0.48 s of plan-construction latency per query
    call); F.array(*[F.lit(v) ...]) is the same cost. Emitting the whole
    table as one SQL array literal is a single py4j call + one JVM-side
    parse (measured 3 ms warm). repr(float) round-trips exactly through
    Spark's double-literal parser (verified incl. 5e-324), so values are
    bit-identical to the per-element form.

    Non-finite values would render as ``infD``/``nanD``, which Spark's
    SQL parser rejects with an opaque ParseException far from the cause
    (e.g. a degenerate k-means fit with an empty cluster) — validate up
    front and name the offending cell instead.
    """
    import math

    rows = []
    for i, r in enumerate(mat):
        vals = [float(v) for v in r]
        for j, v in enumerate(vals):
            if not math.isfinite(v):
                raise ValueError(
                    f"matrix_lit: non-finite value {v!r} at row {i}, "
                    f"col {j} — check for empty clusters / bad input "
                    "vectors upstream"
                )
        rows.append("array(" + ",".join(f"{v!r}D" for v in vals) + ")")
    return F.expr(f"array({','.join(rows)})")
