"""Vector functions over array<float|double> embedding columns.

Higher-order array functions (zip_with / aggregate) — JVM-side, codegen'd,
no Python. The reference has no vector surface; these back the Tier C
similarity-search operators (SURVEY.md §2.C).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def srp_bucket(v: Column, num_planes: int = 8) -> Column:
    """Sign-random-projection LSH bucket: the sign pattern of ``v`` against
    ``num_planes`` hash-derived hyperplanes (deterministic, no RNG state).
    Vectors with high cosine similarity collide with high probability."""

    def plane_coef(p: int) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.size(v) - 1),
            lambda i: (
                F.pmod(
                    F.xxhash64(F.concat_ws(":", F.lit(str(p)), i.cast("string"))),
                    F.lit(10000),
                )
                / 10000.0
                - 0.5
            ),
        )

    return F.concat_ws(
        "",
        *[
            F.when(dot(v, plane_coef(p)) >= 0, "1").otherwise("0")
            for p in range(num_planes)
        ],
    )


def ivf_centroid_id(v: Column, num_centroids: int = 16) -> Column:
    """IVF-style coarse quantization without training: assign each vector
    to the hash-derived pseudo-centroid with the highest dot product.

    A real IVF trains centroids with k-means; at ingest scale a fixed
    hash-derived codebook gives the same *pruning structure* (each query
    probes its top cells only) with zero training passes — the tradeoff is
    recall, tuned by probing more cells."""

    def centroid(cid: int) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.size(v) - 1),
            lambda i: (
                F.pmod(
                    F.xxhash64(F.concat_ws("#", F.lit(str(cid)), i.cast("string"))),
                    F.lit(10000),
                )
                / 10000.0
                - 0.5
            ),
        )

    scores = F.array(*[dot(v, centroid(c)) for c in range(num_centroids)])
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
