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
    seed_rows = q.orderBy(id_col).limit(k).collect()  # k rows — model-sized
    centroids: dict[int, list[int]] = {
        i: list(r["qv"]) for i, r in enumerate(seed_rows)
    }

    assigned = None
    for _ in range(iterations):
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
        assigned = summed.select(
            id_col,
            "qv",
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

    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    spark = df.sparkSession
    checks = spark.createDataFrame(
        [(int(cid), int(sum(vec))) for cid, vec in sorted(centroids.items())],
        "cluster_id int, centroid_sum long",
    )
    return sizes.join(F.broadcast(checks), "cluster_id").orderBy("cluster_id")
