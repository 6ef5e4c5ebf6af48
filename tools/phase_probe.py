"""Phase-level timing probe for the optimization round (guide §1):
times the building blocks of the heavy query families in ONE warm
session so per-family costs (edge build vs iteration rounds vs
barriers vs fixture boot) are attributable. Read-only: no repo state
is touched; results print to stdout.

Usage: python tools/phase_probe.py [sf_dir] [probe,...]
Probes: graph, bpe, kmeans, pg, stream, dedup
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nifi_minifi_cpp_spark.session import get_spark, load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PROBES = (sys.argv[2].split(",") if len(sys.argv) > 2 else ["graph", "bpe", "kmeans", "pg", "dedup"])


def t(label, fn):
    start = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - start
    print(f"  {label:55s} {dt:7.3f}s")
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("phase-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen/Arrow paths like bench.py does
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(128).repartition(32).mapInPandas(lambda it: it, "id long").count()
    spark.read.parquet(f"{SF_DIR}/region.parquet").selectExpr("md5(r_name)").collect()

    li = load_table(spark, "lineitem", SF_DIR)

    if "graph" in PROBES:
        print("== graph: pagerank_supplier_parts phases ==")
        from nifi_minifi_cpp_spark.entry_queries._shared import _supplier_part_edges
        from nifi_minifi_cpp_spark.util import reliable_barrier

        edges = _supplier_part_edges(li)
        t("edges noop (scan+union)", lambda: noop(edges))
        e = t("e barrier (distinct + localCheckpoint)", lambda: reliable_barrier(
            edges.select(F.col("src").alias("_s"), F.col("dst").alias("_d")).distinct()
        ))
        deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
        nodes = t("nodes barrier", lambda: reliable_barrier(
            e.select(F.col("_s").alias("node"))
            .unionByName(e.select(F.col("_d").alias("node")))
            .distinct()
        ))
        n_total = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("_n")))
        ranks = nodes.crossJoin(n_total).select("node", (F.lit(1.0) / F.col("_n")).alias("rank"))
        weighted = e.join(deg, "_s")
        def one_round(r):
            contribs = (
                weighted.join(r.withColumnRenamed("node", "_s"), "_s")
                .select(F.col("_d").alias("node"), (F.col("rank") / F.col("_deg")).alias("_c"))
                .groupBy("node")
                .agg(F.sum("_c").alias("_in"))
            )
            return (
                nodes.join(contribs, "node", "left")
                .crossJoin(n_total)
                .select("node", ((1.0 - 0.85) * (F.lit(1.0) / F.col("_n")) + 0.85 * F.coalesce(F.col("_in"), F.lit(0.0))).alias("rank"))
            )
        r1 = one_round(ranks)
        t("1 iteration noop", lambda: noop(r1))
        r3 = one_round(one_round(r1))
        t("3 chained iterations noop", lambda: noop(r3))
        print("== graph: full entry queries (warm, 2nd run of each) ==")
        from nifi_minifi_cpp_spark.entry_queries import queries as reg
        qs = reg()
        for name in ("pagerank_supplier_parts", "hits_hub_authority", "bfs_hop_histogram",
                     "kcore_supplier_parts", "label_propagation_communities",
                     "triangle_count_coorder_parts"):
            t(f"{name} run1", lambda n=name: noop(qs[n](spark, SF_DIR)))
            t(f"{name} run2", lambda n=name: noop(qs[n](spark, SF_DIR)))

    if "bpe" in PROBES:
        print("== bpe phases ==")
        from nifi_minifi_cpp_spark.analytics.text_analysis import bpe_train
        from nifi_minifi_cpp_spark.util import reliable_barrier

        docs = load_table(spark, "documents", SF_DIR)
        words = (
            docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
            .filter((F.col("word") != "") & (~F.col("word").contains("\x1f")))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
        t("vocab barrier", lambda: reliable_barrier(
            words.select("freq", F.concat(F.split(F.col("word"), ""), F.array(F.lit("</w>"))).alias("syms"))
        ))
        t("bpe_train(8) full", lambda: noop(bpe_train(docs, num_merges=8)))

    if "kmeans" in PROBES:
        print("== kmeans phases ==")
        from nifi_minifi_cpp_spark.analytics.clustering import kmeans_quality, kmeans_quantized

        emb = load_table(spark, "embeddings", SF_DIR)
        t("kmeans_quantized(3 it) full", lambda: noop(kmeans_quantized(emb, k=4, iterations=3)))
        t("kmeans_quality(3 it) full", lambda: noop(kmeans_quality(emb, k=4, iterations=3)))

    if "pg" in PROBES:
        print("== pg fixture phases ==")
        from nifi_minifi_cpp_spark.sources.pg_wire import EphemeralPostgres

        t0 = time.perf_counter()
        with EphemeralPostgres() as pg:
            t_boot = time.perf_counter() - t0
            print(f"  boot (initdb+pg_ctl+connect){'':26s} {t_boot:7.3f}s")
            c = pg.client()
            c.execute("CREATE TABLE probe_t (a bigint)")
            c.close()
        print(f"  total with teardown{'':36s} {time.perf_counter() - t0:7.3f}s")

    if "midband" in PROBES:
        # r17 VERDICT #7: the never-examined mid-band entries, warm
        # run1/run2 — run2 isolates the per-query plan/job floor from
        # first-run codegen/analysis warmup
        print("== mid-band entries (warm, run1+run2) ==")
        from nifi_minifi_cpp_spark.entry_queries import queries as reg
        qs = reg()
        for name in ("split_merge_roundtrip", "stream_interval_join_pairs",
                     "fd_profile_candidates", "quantile_sketch_merge",
                     "join_size_estimate_cm", "countmin_user_frequencies",
                     "bpe_trained_merges", "bpe_tokenized_counts"):
            t(f"{name} run1", lambda n=name: noop(qs[n](spark, SF_DIR)))
            t(f"{name} run2", lambda n=name: noop(qs[n](spark, SF_DIR)))

    if "stream" in PROBES:
        # r17 VERDICT #6: where does the ~1.5-2 s Python-datasource
        # stream start go? Phase-split a minimal tailfile lifecycle:
        # plan (schema negotiation), start() return, first-batch
        # availability, stop. Repeated twice — run2 shows the floor
        # once the session's Python worker pool is warm.
        print("== python-datasource stream start phases (tailfile) ==")
        import tempfile

        from nifi_minifi_cpp_spark.sources.datasource import register_tailfile

        register_tailfile(spark)
        for attempt in (1, 2):
            d = tempfile.mkdtemp(prefix="ppstream")
            path = os.path.join(d, "t.log")
            with open(path, "w") as fh:
                fh.write("hello\nworld\n")
            reader = t(f"run{attempt}: readStream plan (.load())", lambda: (
                spark.readStream.format("tailfile").option("pattern", path).load()
            ))
            q = t(f"run{attempt}: writeStream.start() returns", lambda: (
                reader.writeStream.format("memory")
                .queryName(f"pp_stream_{attempt}")
                .trigger(availableNow=True)
                .start()
            ))
            t(f"run{attempt}: awaitTermination (all batches)", lambda: q.awaitTermination(60))
            t(f"run{attempt}: stop()", q.stop)

    if "dedup" in PROBES:
        print("== dedup heavy entries (warm, run1+run2) ==")
        from nifi_minifi_cpp_spark.entry_queries import queries as reg
        qs = reg()
        for name in ("containment_dedup_ids", "allpairs_jaccard_pairs",
                     "ngram_jaccard_dedup_kept", "winnowing_dedup_kept",
                     "poisson_bootstrap_ci", "item_similarity_topk"):
            t(f"{name} run1", lambda n=name: noop(qs[n](spark, SF_DIR)))
            t(f"{name} run2", lambda n=name: noop(qs[n](spark, SF_DIR)))


if __name__ == "__main__":
    main()
