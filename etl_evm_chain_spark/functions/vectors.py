"""Vector kit: dot/norm/cosine over ``array<float>`` embedding columns.

Pure built-in expressions (fold in index order, elements cast to
double) so results are bit-identical to a sequential SQL fold — and
stay inside whole-stage codegen. For 100 TB-scale similarity search
the brute-force path below is the per-bucket kernel; the LSH/IVF
operators in operators/similarity.py bound how many pairs reach it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    sq = F.transform(ca, lambda x: x.cast("double") * x.cast("double"))
    return F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a| |b|); null on zero-norm inputs."""
    d = dot(a, b)
    na, nb = norm2(a), norm2(b)
    denom = F.sqrt(na) * F.sqrt(nb)
    return F.when(denom != 0, d / denom)
