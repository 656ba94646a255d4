"""Vector primitives shared by similarity search and embedding dedup.

Two dot-product implementations with different cost models:

- :func:`cosine` / :func:`dot_fold` — pure Catalyst higher-order
  functions (``zip_with`` + ``aggregate``). Zero Python, strictly
  sequential summation (bit-reproducible), but HOF lambdas are
  *interpreted* per element (~µs/element) — right for per-vector,
  wrong for per-pair work.
- :func:`dot_f64` — Arrow-vectorized pandas UDF: embedding pairs cross
  to Python as columnar float batches, numpy contracts them at memory
  bandwidth (~ns/element). This is the hot-path choice once the number
  of (pair × dim) products is large — e.g. 800k blocked pairs × 64
  dims runs in seconds instead of minutes.

Numerically: numpy uses pairwise summation while SQL engines fold
sequentially, so results agree to ~1e-15 relative, not bitwise. All
consumers therefore either round (6 decimals) or compare against
thresholds that sit ≥0.28 away from any data value — sub-ulp drift can
never flip an output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def dot_fold(x: Column, y: Column) -> Column:
    """Sequential double-precision dot product via Catalyst HOFs.
    Per-vector use only (norms, projections) — interpreted per element."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity computed entirely in Catalyst (three folds).
    Reference implementation / small-cardinality use; pair-heavy plans
    should precompute norms and use :func:`dot_f64`."""
    return dot_fold(a, b) / (F.sqrt(dot_fold(a, a)) * F.sqrt(dot_fold(b, b)))


def norm(e: Column) -> Column:
    """L2 norm (sequential fold — one per vector, cheap)."""
    return F.sqrt(dot_fold(e, e))


@pandas_udf(DoubleType())
def dot_f64(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized float64 dot product of two array columns:
    batches arrive columnar, numpy contracts row-wise in one einsum."""
    A = np.stack(a.to_numpy()).astype("float64", copy=False)
    B = np.stack(b.to_numpy()).astype("float64", copy=False)
    return pd.Series(np.einsum("ij,ij->i", A, B))
