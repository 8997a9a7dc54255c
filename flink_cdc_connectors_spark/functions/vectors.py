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


def _hash_coef(salt: str, idx: int) -> float:
    """Deterministic pseudo-random coefficient in [-0.5, 0.5) — stable
    across runs/processes (md5-derived, no RNG state)."""
    import hashlib

    h = hashlib.md5(f"{salt}:{idx}".encode()).digest()
    return int.from_bytes(h[:8], "big") % 10_000 / 10_000.0 - 0.5


def _coef_array(salt: str, dim: int) -> Column:
    """Hyperplane/centroid coefficients as a LITERAL array — computed once
    at plan time in Python, not re-hashed per row (the coefficients are
    data-independent; embedding them keeps the per-row work to one dot
    product per plane/centroid). A single array Literal, NOT F.array of
    ``dim`` scalar literals: 16 centroids x 64 element nodes made the
    expression tree large enough that analysis/codegen dominated small-SF
    wall-clock."""
    return F.lit([_hash_coef(salt, i) for i in range(dim)])


def srp_bucket(v: Column, num_planes: int = 8, dim: int = 64) -> Column:
    """Sign-random-projection LSH bucket: the sign pattern of ``v`` against
    ``num_planes`` deterministic hyperplanes. Vectors with high cosine
    similarity collide with high probability. ``dim`` must be >= the vector
    length; coefficients are sliced to the vector's size (zip_with would
    null-pad a length mismatch, poisoning the sum)."""
    return F.concat_ws(
        "",
        *[
            F.when(
                dot(v, F.slice(_coef_array(f"srp{p}", dim), F.lit(1), F.size(v))) >= 0,
                "1",
            ).otherwise("0")
            for p in range(num_planes)
        ],
    )


def srp_bucket_tables(
    v: Column, num_tables: int = 4, num_planes: int = 5, dim: int = 64
) -> Column:
    """Multi-TABLE SRP-LSH: ``num_tables`` independent bucket ids per
    vector (array<string> "t:bits"). Union-of-tables candidate generation
    is the standard LSH recall lever: recall rises with the number of
    tables and with FEWER planes per table (coarser buckets — higher
    collision probability, more candidates per bucket); cost is the probed
    corpus fraction. The defaults (4 tables x 5 planes = 32 buckets each)
    probe ~4/32 of the corpus."""
    return F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(t)),
                F.concat_ws(
                    "",
                    *[
                        F.when(
                            dot(
                                v,
                                F.slice(
                                    _coef_array(f"srp{t * num_planes + p}", dim),
                                    F.lit(1),
                                    F.size(v),
                                ),
                            )
                            >= 0,
                            "1",
                        ).otherwise("0")
                        for p in range(num_planes)
                    ],
                ),
            )
            for t in range(num_tables)
        ]
    )


def ivf_centroid_topk(
    v: Column, probes: int = 4, num_centroids: int = 16, dim: int = 64
) -> Column:
    """Multi-PROBE IVF: the ``probes`` closest pseudo-centroids for a query
    vector (array<int>), by dot-product score. Probing P cells raises the
    candidate fraction to P/num_centroids — the IVF nprobe knob (FAISS
    semantics): recall scales with the probed fraction, cost stays one
    broadcast join on cell id."""
    scored = F.array(
        *[
            F.struct(
                dot(v, F.slice(_coef_array(f"ivf{c}", dim), F.lit(1), F.size(v))).alias(
                    "s"
                ),
                F.lit(c).alias("c"),
            )
            for c in range(num_centroids)
        ]
    )
    top = F.slice(F.sort_array(scored, asc=False), 1, probes)
    return F.transform(top, lambda x: x["c"].cast("int"))


def ivf_centroid_id(v: Column, num_centroids: int = 16, dim: int = 64) -> Column:
    """IVF-style coarse quantization without training: assign each vector
    to the deterministic pseudo-centroid with the highest dot product.

    A real IVF trains centroids with k-means; at ingest scale a fixed
    hash-derived codebook gives the same *pruning structure* (each query
    probes its top cells only) with zero training passes — the tradeoff is
    recall, tuned by probing more cells. Centroid coefficients are literal
    arrays (plan-time constants), so the per-row cost is ``num_centroids``
    dot products."""
    scores = F.array(
        *[
            dot(v, F.slice(_coef_array(f"ivf{c}", dim), F.lit(1), F.size(v)))
            for c in range(num_centroids)
        ]
    )
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
