"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced with the noop writer — count() would let Catalyst
prune the computed columns and measure nothing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nifi_minifi_cpp_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entry

    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so the first query isn't charged session
    # startup (touches no benchmark data)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Arrow/Python-worker pool warmup: without this the first
    # mapInPandas query is charged ~2-4s of worker spawn across all
    # cores — a per-session cost, not that query's cost
    spark.range(cpus * 4).repartition(cpus).mapInPandas(lambda it: it, "id long").count()
    # Parquet-reader + codegen warmup on the smallest table (8 rows):
    # vectorized-reader class loading and whole-stage-codegen compiler
    # startup otherwise land on whichever query runs first (observed
    # as a one-off ~7s spike on the first complex expression)
    spark.read.parquet(f"{sf_dir}/region.parquet").selectExpr("md5(r_name)").collect()

    qs = entry.queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name, fn in qs.items():
        # Fault-isolate each query: one regression must not destroy the
        # round's entire bench artifact (round 3 lost every timing to a
        # single AnalysisException).
        start = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: FAILED {type(exc).__name__}", file=sys.stderr)
            continue
        elapsed = round(time.perf_counter() - start, 3)
        timings[name] = elapsed
        total += elapsed
        print(f"# {name}: {elapsed}s", file=sys.stderr)

    detail = {
        "metric": "engine_queries_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "sf": sf,
    }
    # Per-query timings go to a file — the driver keeps only a ~2KB
    # stdout tail, and round 1's single 2.3KB JSON line was truncated
    # (BENCH_r01 "parsed": null). The LAST stdout line is a minimal
    # summary so any tail-capture parser wins.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(detail), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "engine_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "n_failed": len(errors),
            }
        )
    )


if __name__ == "__main__":
    main()
