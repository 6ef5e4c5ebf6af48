"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan with JVM-side
zip_with/aggregate arithmetic, broadcast query vector, no shuffle
until the final top-k. Scale path: SRP-LSH bucketed k-NN join that
turns the O(N·M) cross join into per-bucket joins, plus an
Arrow-batched pandas matmul variant for wide batches of queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import cosine


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k against one query vector.

    The query is a literal array folded into the plan (broadcast to
    every task); orderBy+limit compiles to TakeOrderedAndProject —
    each partition keeps only k rows, no global sort at 100 TB.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(_as_double(F.col(embedding_col)), q).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def cosine_topk_pandas(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Arrow-batched variant: per-partition numpy matmul, then the
    same TakeOrderedAndProject top-k. Faster for high dims / many
    rows because the dot product is one BLAS call per batch.
    """
    import numpy as np

    schema = f"{id_col} long, score double"
    q = None

    def score(batches):
        nonlocal q
        for pdf in batches:
            if q is None:
                q_arr = np.asarray(query_vec, dtype=np.float64)
                q = q_arr / np.linalg.norm(q_arr)
            mat = np.stack(pdf[embedding_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ q) / np.where(norms == 0, 1.0, norms)
            yield __import__("pandas").DataFrame({id_col: pdf[id_col], "score": sims})

    from ..util import spread_for_cpu

    scored = spread_for_cpu(df.select(id_col, embedding_col), id_col).mapInPandas(score, schema)
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def srp_bucket(embedding_col: Column, dim: int, num_planes: int = 8, seed: int = 42) -> Column:
    """Signed-random-projection bucket id (int) for an embedding."""
    import random

    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]
    planes_lit = F.array(*[F.array(*[F.lit(float(x)) for x in p]) for p in planes])
    emb = _as_double(embedding_col)
    return F.aggregate(
        F.zip_with(
            planes_lit,
            F.sequence(F.lit(0), F.lit(num_planes - 1)),
            lambda p, i: F.when(
                F.aggregate(F.zip_with(p, emb, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x) > 0,
                F.call_function("shiftleft", F.lit(1), i.cast("int")),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc.bitwiseOR(x),
    )


def knn_join_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 6,
    seed: int = 42,
    probes: int = 1,
) -> DataFrame:
    """Approximate k-NN join: SRP-bucket both sides, equi-join on the
    bucket, exact cosine within, row_number top-k per query.

    The bucket equi-join replaces the cross join; with p planes the
    expected candidate set shrinks ~2^p-fold. ``probes``: multi-probe
    radius on the query side — probes=1 additionally explodes each
    query into its num_planes Hamming-1 neighbor buckets, trading a
    (p+1)x larger candidate set for much higher recall (neighbors that
    straddle one hyperplane still meet).
    """
    from pyspark.sql import Window

    dim = corpus.select(F.size(F.col(embedding_col)).alias("d")).first()["d"]
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(embedding_col).alias("_qv"),
        srp_bucket(F.col(embedding_col), dim, num_planes, seed).alias("_b0"),
    )
    if probes >= 1:
        neighbor_buckets = F.array_union(
            F.array(F.col("_b0")),
            F.transform(
                F.sequence(F.lit(0), F.lit(num_planes - 1)),
                lambda i: F.col("_b0").bitwiseXOR(F.call_function("shiftleft", F.lit(1), i.cast("int"))),
            ),
        )
        qb = qb.select(
            "query_id", "_qv", F.explode(neighbor_buckets).alias("_bucket")
        )
    else:
        qb = qb.withColumnRenamed("_b0", "_bucket")
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(embedding_col).alias("_cv"),
        srp_bucket(F.col(embedding_col), dim, num_planes, seed).alias("_bucket"),
    )
    scored = (
        qb.join(cb, "_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # multi-probe can meet the same pair through several buckets
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("score", cosine(_as_double(F.col("_qv")), _as_double(F.col("_cv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("_rank").alias("rank"))
    )


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int = 64,
    embedding_col: str = "embedding",
    sample_rows: int = 100_000,
    iters: int = 10,
    seed: int = 42,
):
    """Spherical k-means coarse quantizer for an IVF index.

    Training runs on a BOUNDED driver-side sample (``sample_rows``
    rows regardless of table size — at 100 TB the sample is still
    ~100k × dim floats), then the centroid matrix is broadcast for
    distributed assignment. Returns a unit-normalized ndarray of
    shape (n_cells, dim).
    """
    import numpy as np

    total = df.count()
    fraction = min(1.0, (sample_rows * 1.1) / max(total, 1))
    sample = (
        df.select(embedding_col).sample(fraction=fraction, seed=seed).limit(sample_rows).collect()
    )
    mat = np.stack([np.asarray(r[0], dtype=np.float64) for r in sample])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(norms == 0, 1.0, norms)

    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


class IvfIndex:
    """Train-once / persist IVF index: centroids to a small .npy file,
    assignments to a parquet table partitioned by cell.

    The per-query registry entry retrains on every call (fine for a
    correctness fixture); the production path is::

        idx = IvfIndex.train(df, n_cells=256)
        idx.save("/models/ivf")            # centroids + partitioned table
        ...
        idx = IvfIndex.load(spark, "/models/ivf")
        idx.topk(query_vec, k=10, nprobe=8)

    Probe-time cell filters hit the parquet PARTITION level
    (``ivf_cell=N/`` directories), so a 100 TB table scans only
    ~nprobe/n_cells of its files — see test_plan_quality's
    partition-pruning assertion.
    """

    def __init__(self, centroids, indexed: DataFrame | None = None):
        self.centroids = centroids
        self.indexed = indexed

    @classmethod
    def train(cls, df: DataFrame, n_cells: int = 64, **kw) -> "IvfIndex":
        centroids = train_ivf_centroids(df, n_cells=n_cells, **kw)
        return cls(centroids, ivf_assign(df, centroids))

    def save(self, path: str) -> None:
        import numpy as np

        if self.indexed is None:
            raise ValueError("nothing to save: train() first")
        self.indexed.write.mode("overwrite").partitionBy("ivf_cell").parquet(f"{path}/table")
        # centroid matrix is tiny (n_cells x dim); keep it beside the
        # table. Serialize in-memory then write in one call so
        # concurrent saves never race on a shared scratch path.
        import io

        buf = io.BytesIO()
        np.save(buf, np.asarray(self.centroids))
        with open(f"{path}/centroids.npy", "wb") as f:
            f.write(buf.getvalue())

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        import numpy as np

        centroids = np.load(f"{path}/centroids.npy")
        return cls(centroids, spark.read.parquet(f"{path}/table"))

    def topk(self, query_vec, k: int = 10, nprobe: int = 8, **kw) -> DataFrame:
        return ivf_topk(self.indexed, self.centroids, query_vec, k=k, nprobe=nprobe, **kw)


def ivf_assign(
    df: DataFrame,
    centroids,
    embedding_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Assign every row to its nearest centroid (max cosine). One
    Arrow-batched matmul per batch; the centroid matrix rides the
    closure broadcast. Persisting the result partitioned/bucketed by
    ``cell_col`` turns probe-time cell filters into partition pruning.
    """
    import numpy as np
    from pyspark.sql.types import IntegerType

    cent = np.asarray(centroids, dtype=np.float64)

    def assign(s):
        def one(vec):
            v = np.asarray(vec, dtype=np.float64)
            n = np.linalg.norm(v)
            if n > 0:
                v = v / n
            return int(np.argmax(cent @ v))

        return s.map(one)

    udf = F.pandas_udf(assign, IntegerType())
    return df.withColumn(cell_col, udf(F.col(embedding_col)))


def ivf_topk(
    indexed: DataFrame,
    centroids,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 8,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """IVF probe search: rank cells by centroid·query on the driver
    (n_cells floats — trivial), scan only the ``nprobe`` best cells,
    exact cosine within. With nprobe = n_cells this degrades to exact
    brute force; with nprobe « n_cells it scans ~nprobe/n_cells of the
    data — the 100 TB scale path alongside the SRP-LSH join.
    """
    import numpy as np

    cent = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    probe_cells = [int(c) for c in np.argsort(-(cent @ q))[:nprobe]]
    return cosine_topk(
        indexed.filter(F.col(cell_col).isin(probe_cells)),
        query_vec,
        k=k,
        embedding_col=embedding_col,
        id_col=id_col,
    )


def knn_join_exact(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact k-NN join (broadcast the query side): ground truth for
    recall measurement; only for small query sets.
    """
    from pyspark.sql import Window

    qb = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(embedding_col).alias("_qv"))
    )
    cb = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(embedding_col).alias("_cv"))
    scored = (
        qb.crossJoin(cb)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", cosine(_as_double(F.col("_qv")), _as_double(F.col("_cv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("_rank").alias("rank"))
    )


def quantize_embeddings_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    return_scales: bool = False,
) -> DataFrame:
    """Per-dimension symmetric int8 quantization (the standard
    vector-index compression: FAISS SQ8 / Milvus-style): one corpus
    pass finds ``scale_j = max(|v_j|) / 127`` per dimension, then each
    vector maps to ``round(v_j / scale_j)`` clamped to [-127, 127].
    Returns (id, qvec array<tinyint>, norm double) — norm kept so
    cosine search can rescale without touching the floats again.

    100 TB shape: the scale pass posexplodes to slim (pos, |v|) pairs
    that PARTIAL-AGGREGATE map-side (each partition contributes at most
    ``dim`` rows to the shuffle — the corpus never moves); the scales
    collapse to a ONE-ROW array that broadcast-joins back, and
    quantization itself is a per-row zip_with. No full-data shuffle
    anywhere. All arithmetic is IEEE +,*,/ and half-away-from-zero
    rounding, so any engine reproduces the bytes exactly."""
    vecs = df.select(F.col(id_col), _as_double(F.col(embedding_col)).alias("_v"))
    scales = (
        vecs.select(F.posexplode("_v").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("val"))).alias("mx"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("mx")))
                ),
                # guard all-zero dimensions: scale 1.0 quantizes them to 0
                lambda s: F.when(s.getField("mx") > 0, s.getField("mx") / 127.0).otherwise(
                    F.lit(1.0)
                ),
            ).alias("_scales")
        )
    )
    joined = vecs.crossJoin(F.broadcast(scales))
    qvec = F.zip_with(
        F.col("_v"),
        F.col("_scales"),
        lambda v, s: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.round(v / s).cast("int"))
        ).cast("tinyint"),
    )
    norm = F.sqrt(
        F.aggregate("_v", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cols = [F.col(id_col), qvec.alias("qvec"), norm.alias("norm")]
    if return_scales:
        # the per-dimension scale array (one broadcast row already in
        # the plan) — callers that dequantize (recall eval, rescaled
        # search) need it next to the codes
        cols.append(F.col("_scales").alias("scales"))
    return joined.select(*cols)


def matryoshka_energy_report(
    df: DataFrame,
    dims: list[int] | None = None,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al. 2022): per vector
    and candidate prefix length, the prefix norm and the retained-
    energy fraction ``|v[:d]|^2 / |v|^2`` — the quantity that decides
    how far an MRL-trained embedding column can be truncated for a
    cheaper ANN index. Returns (id, dim, prefix_norm, energy).

    100 TB shape: pure per-row HOF arithmetic (sliced left-fold sums,
    one row out per candidate dim) — no shuffle at all; exact IEEE
    left-fold so any engine reproduces the doubles."""
    dims = dims or [16, 32, 64]
    # stage the squared array in its own projection (HOF-inlining
    # rule): 1 + len(dims) consumers reference it
    sqd = df.select(
        F.col(id_col),
        F.transform(_as_double(F.col(embedding_col)), lambda x: x * x).alias("_sq"),
    )
    staged = sqd.select(
        id_col,
        F.aggregate("_sq", F.lit(0.0), lambda a, x: a + x).alias("_tot"),
        *[
            F.aggregate(F.slice("_sq", 1, d), F.lit(0.0), lambda a, x: a + x).alias(f"_p{d}")
            for d in dims
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("dim"),
                F.sqrt(F.col(f"_p{d}")).alias("prefix_norm"),
                F.when(F.col("_tot") > 0, F.col(f"_p{d}") / F.col("_tot"))
                .otherwise(F.lit(0.0))
                .alias("energy"),
            )
            for d in dims
        ]
    )
    return staged.select(id_col, F.explode(rows).alias("_r")).select(
        id_col, "_r.dim", "_r.prefix_norm", "_r.energy"
    )


def gram_matrix_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    scale: int = 1000,
) -> DataFrame:
    """Exact distributed Gram matrix X^T X over a quantized copy of the
    embedding column — the one-pass sufficient statistic behind PCA /
    whitening / ridge regression at corpus scale (the covariance is an
    affine function of it). Returns the upper triangle as
    (i, j, gram) with i <= j, d*(d+1)/2 rows.

    Quantization makes the result ENGINE-EXACT: q = floor(v*scale+0.5)
    per component (round-half-up, identical in every engine — numpy's
    round() is banker's and float sums are order-dependent, so the
    unquantized float Gram can differ in the last ulp between engines);
    all sums are then int64 arithmetic with no float path at all.

    100 TB shape: the map side computes ONE d x d partial Gram per
    partition with a single Arrow-batched numpy matmul (the classic
    tree-aggregated gramian: shuffle volume is partitions * d^2 slim
    (i, j, partial) rows, independent of row count); the reduce is a
    plain groupBy sum. With d=1024 and 10k partitions that is ~5 GB of
    partials — trivial next to the 100 TB scan it summarizes."""
    import numpy as np
    import pandas as pd

    from ..util import spread_for_cpu

    def partial_gram(batches):
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy())
            Q = np.floor(V.astype(np.float64) * scale + 0.5).astype(np.int64)
            G = Q.T @ Q
            acc = G if acc is None else acc + G
        if acc is not None:
            iu, ju = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {"i": iu.astype("int32"), "j": ju.astype("int32"), "partial": acc[iu, ju]}
            )

    partials = spread_for_cpu(df.select(vec_col)).mapInPandas(
        partial_gram, "i int, j int, partial long"
    )
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("partial").cast("long").alias("gram"))
    )
