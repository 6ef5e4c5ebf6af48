"""Distributed clustering for embedding-space corpus work (r11):
deterministic integer-quantized Lloyd k-means — the sixth iterative
algorithm class next to connected components, PageRank, label
propagation, the triangle census, and the BPE trainer.

Why quantized: float k-means is not reproducible across engines (BLAS
summation order flips assignments on near-ties), so the pipeline
variant quantizes embeddings to integers once (round(x*scale)) and
runs every distance and argmin in EXACT integer arithmetic; centroid
updates floor-divide. Assignments are then bit-identical on any
engine and any partitioning — the property a 100 TB dedup/curation
run needs when clusters feed downstream sampling decisions (the same
rationale as the deterministic md5 sampler).

100 TB shape (Lloyd on a cluster, the MLlib shape): the quantized
vectors are barriered once; each round is one map-side distance pass
against BROADCAST centroid literals (k*d values — bytes), one
posexplode + partial-agg shuffle of (cluster, dim) keyed rows (k*d
groups), and a k*d-row driver collect to rebuild the literals —
bounded by model size, independent of row count, exactly like
MLlib's per-iteration collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lloyd(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iterations: int,
    scale: float,
) -> tuple[DataFrame, dict[int, list[int]]]:
    """Shared Lloyd loop: returns (last-round assignments carrying the
    quantized vectors, final post-update centroids). The assignment is
    against the PRE-update centroids of the last round — the same
    convention the unrolled SQL oracle encodes (a_i vs c_{i-1})."""
    from ..util import reliable_barrier

    q = reliable_barrier(
        df.select(
            id_col,
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast(
                    "long"
                ),
            ).alias("qv"),
        )
    )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iterations < 1:
        # with zero rounds there is no assignment frame to return and
        # callers would crash later on assigned=None — fail up front
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    seed_rows = q.orderBy(id_col).limit(k).collect()  # k rows — model-sized
    if len(seed_rows) < k:
        raise ValueError(
            f"k={k} clusters requested but the frame has only "
            f"{len(seed_rows)} rows; a silent fit of fewer clusters "
            "would misreport every downstream cluster id"
        )
    centroids: dict[int, list[int]] = {
        i: list(r["qv"]) for i, r in enumerate(seed_rows)
    }

    assigned = None
    for _ in range(iterations):
        assigned = _assign(q, id_col, centroids)
        sums = (
            assigned.select("cluster_id", F.posexplode("qv").alias("dim", "x"))
            .groupBy("cluster_id", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        new_rows = sums.select(
            "cluster_id",
            "dim",
            F.floor(F.col("s") / F.col("n")).cast("long").alias("x"),
        ).collect()  # k*d rows — model-sized, the MLlib per-round collect
        centroids = {}
        for r in new_rows:
            centroids.setdefault(r["cluster_id"], {})[r["dim"]] = r["x"]
        centroids = {
            cid: [dims[i] for i in sorted(dims)] for cid, dims in centroids.items()
        }
    return assigned, centroids


def _assign(
    q: DataFrame, id_col: str, centroids: dict[int, list[int]]
) -> DataFrame:
    """One exact-integer distance pass + argmin against centroid
    literals. Ties break toward the smaller cluster id."""
    cent_items = sorted(centroids.items())
    staged = q
    for cid, vec in cent_items:
        lit_arr = F.array(*[F.lit(int(v)) for v in vec])
        staged = staged.withColumn(
            f"_z{cid}", F.zip_with("qv", lit_arr, lambda a, b: (a - b) * (a - b))
        )
    # stage the squared-diff arrays before the fold sums index them
    # (HOF-inlining rule), then argmin via min-struct (d, c): exact
    # integer compare, ties to the smaller cluster id
    summed = staged.select(
        id_col,
        "qv",
        *[
            F.aggregate(
                f"_z{cid}", F.lit(0).cast("long"), lambda acc, v: acc + v
            ).alias(f"_d{cid}")
            for cid, _ in cent_items
        ],
    )
    return summed.select(
        id_col,
        "qv",
        *[F.col(f"_d{cid}") for cid, _ in cent_items],
        F.array_min(
            F.array(
                *[
                    F.struct(
                        F.col(f"_d{cid}").alias("d"),
                        F.lit(cid).cast("int").alias("c"),
                    )
                    for cid, _ in cent_items
                ]
            )
        )["c"].alias("cluster_id"),
    )


def kmeans_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iterations: int = 3,
    scale: float = 1000.0,
) -> DataFrame:
    """Deterministic Lloyd k-means over ``vec_col``. Returns one row
    per surviving cluster: (cluster_id, n_members, centroid_sum) where
    centroid_sum is the exact integer component sum of the final
    centroid (a compact, engine-portable checksum of the model).

    Seeds: the ``k`` rows with the smallest ``id_col``, labeled
    0..k-1 in id order. Ties in the argmin break toward the smaller
    cluster id. A cluster that loses all members is dropped (both
    this and the SQL oracle drop it — no silent respawn).
    """
    assigned, centroids = _lloyd(df, vec_col, id_col, k, iterations, scale)
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    spark = df.sparkSession
    checks = spark.createDataFrame(
        [(int(cid), int(sum(vec))) for cid, vec in sorted(centroids.items())],
        "cluster_id int, centroid_sum long",
    )
    return sizes.join(F.broadcast(checks), "cluster_id").orderBy("cluster_id")


def kmeans_quality(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iterations: int = 3,
    scale: float = 1000.0,
) -> DataFrame:
    """Cluster-quality report over the fitted model — the
    Davies-Bouldin-shaped eval that decides whether the clustering is
    usable before it feeds sampling decisions: per surviving cluster,
    member count, exact COHESION (sum of squared integer distances of
    the last-round members to the FINAL centroid) and SEPARATION (the
    squared distance to the nearest other final centroid). All in
    quantized-integer space, so both numbers are exact BIGINTs — no
    float ratio whose rounding could split engines; the DB-style
    ratio is left to the caller who has both terms.

    100 TB shape: one extra broadcast-literal distance pass for the
    cohesion sums (same shape as an assignment round); separation is
    a k*k driver-side computation over the model-sized centroid dict.
    """
    assigned, centroids = _lloyd(df, vec_col, id_col, k, iterations, scale)
    cent_items = sorted(centroids.items())
    staged = assigned.select(id_col, "qv", "cluster_id")
    for cid, vec in cent_items:
        lit_arr = F.array(*[F.lit(int(v)) for v in vec])
        staged = staged.withColumn(
            f"_f{cid}", F.zip_with("qv", lit_arr, lambda a, b: (a - b) * (a - b))
        )
    own = staged.select(
        "cluster_id",
        *[
            F.aggregate(
                f"_f{cid}", F.lit(0).cast("long"), lambda acc, v: acc + v
            ).alias(f"_d{cid}")
            for cid, _ in cent_items
        ],
    )
    pick = None
    for cid, _ in cent_items:
        cond = F.col("cluster_id") == cid
        pick = F.when(cond, F.col(f"_d{cid}")) if pick is None else pick.when(
            cond, F.col(f"_d{cid}")
        )
    per = own.select("cluster_id", pick.alias("_down")).groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("_down").cast("long").alias("sum_sq_dist"),
    )
    sep_rows = []
    for ca, va in cent_items:
        best = None
        for cb, vb in cent_items:
            if ca == cb:
                continue
            d = sum((x - y) * (x - y) for x, y in zip(va, vb))
            best = d if best is None or d < best else best
        sep_rows.append((int(ca), int(best)))
    spark = df.sparkSession
    sep = spark.createDataFrame(
        sep_rows, "cluster_id int, min_intercentroid_sq long"
    )
    return per.join(F.broadcast(sep), "cluster_id").orderBy("cluster_id")
