

def test_exact_dedup_incremental_ledger(spark, tmp_path):
    """r9: ledger-backed incremental dedup — in-batch collapse, cross-
    batch anti-join, idempotent re-run, dry-run leaves no trace."""
    from nifi_minifi_cpp_spark.analytics.dedup import exact_dedup_incremental

    ledger = str(tmp_path / "fps")
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha"), (3, "beta")], "doc_id long, text string"
    )
    got1 = sorted(r["doc_id"] for r in exact_dedup_incremental(b1, ledger).collect())
    assert got1 == [1, 3]  # in-batch dup collapsed to min id
    b2 = spark.createDataFrame(
        [(4, "alpha"), (5, "gamma"), (6, "gamma")], "doc_id long, text string"
    )
    got2 = sorted(r["doc_id"] for r in exact_dedup_incremental(b2, ledger).collect())
    assert got2 == [5]  # alpha already in the ledger; gamma collapses to 5
    # idempotence: replaying batch 2 admits nothing
    assert exact_dedup_incremental(b2, ledger).count() == 0
    # dry-run (commit=False) reports without mutating the ledger
    b3 = spark.createDataFrame([(7, "delta")], "doc_id long, text string")
    assert exact_dedup_incremental(b3, ledger, commit=False).count() == 1
    assert exact_dedup_incremental(b3, ledger, commit=False).count() == 1


def test_incremental_ledger_writer_lock(spark, tmp_path):
    """r10 (VERDICT r9 wrong #3): commit runs are serialized by a
    sibling lock file — a held lock raises LedgerLockError immediately,
    a clean run releases it, and dry-runs ignore it (read-only)."""
    import os

    import pytest

    from nifi_minifi_cpp_spark.analytics.dedup import (
        LedgerLockError,
        exact_dedup_incremental,
    )

    ledger = str(tmp_path / "fps")
    df = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    # a crashed writer left a stale lock: commit refuses, dry-run works
    open(ledger + ".lock", "w").close()
    with pytest.raises(LedgerLockError):
        exact_dedup_incremental(df, ledger)
    assert exact_dedup_incremental(df, ledger, commit=False).count() == 1
    os.unlink(ledger + ".lock")
    # a clean commit releases the lock on exit (second commit proceeds)
    assert exact_dedup_incremental(df, ledger).count() == 1
    assert not os.path.exists(ledger + ".lock")
    assert exact_dedup_incremental(df, ledger).count() == 0


def test_incremental_ledger_first_batch_no_listener_errors(spark, tmp_path, capfd):
    """r10 (VERDICT r9 wrong #2): the first-batch missing-ledger case is
    probed via the Hadoop FS API, not a failing read — no ERROR stack
    trace reaches the log via ExecutionListenerBus."""
    from nifi_minifi_cpp_spark.analytics.dedup import exact_dedup_incremental

    ledger = str(tmp_path / "fresh-ledger" / "fps")
    df = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    capfd.readouterr()
    assert exact_dedup_incremental(df, ledger).count() == 1
    err = capfd.readouterr().err
    assert "dataPathNotExistError" not in err
    assert "PATH_NOT_FOUND" not in err


def test_incremental_ledger_bucketed_join_shape(spark, tmp_path):
    """r9 scale lock: with the ledger persisted as a table BUCKETED by
    fingerprint, the per-batch anti-join needs NO Exchange on the
    ledger side — the repeated-ingest path stops re-shuffling history
    (the 100 TB claim in exact_dedup_incremental's docstring)."""
    from pyspark.sql import functions as F

    from nifi_minifi_cpp_spark.plans.bucketing import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.range(1000).select(
            F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
        )
        fps = docs.select(F.xxhash64("text").alias("_fp"), "doc_id")
        spark.sql("DROP TABLE IF EXISTS dedup_ledger_bk")
        write_bucketed(fps, "dedup_ledger_bk", "_fp", n_buckets=8)
        batch = docs.select(F.xxhash64("text").alias("_fp"), "doc_id").repartition(8, "_fp")
        fresh = batch.join(spark.table("dedup_ledger_bk").select("_fp"), "_fp", "left_anti")
        plan = fresh._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # exactly ONE Exchange: the batch side's explicit repartition —
        # the ledger side contributes none (co-located bucket reads)
        assert plan.count("Exchange") == 1, plan
        assert fresh.count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS dedup_ledger_bk")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_source_overlap_matrix(spark):
    """r9: exact mode counts distinct shared contents per source pair;
    prefix mode fires on shared openings."""
    from nifi_minifi_cpp_spark.analytics.dedup import source_overlap_matrix

    df = spark.createDataFrame(
        [
            (1, "shared text one", "A"),
            (2, "shared text one", "B"),   # exact dup across A/B
            (3, "shared text two", "A"),
            (4, "shared text two", "B"),   # second exact dup A/B
            (5, "shared text two", "C"),   # and A/C + B/C
            (6, "unique to c", "C"),
            (7, "shared text one", "A"),   # same content, same source: distinct-collapsed
        ],
        "doc_id long, text string, source string",
    )
    rows = [
        (r["source_a"], r["source_b"], r["n_shared"])
        for r in source_overlap_matrix(df).collect()
    ]
    assert rows == [("A", "B", 2), ("A", "C", 1), ("B", "C", 1)]
    pre = [
        (r["source_a"], r["source_b"], r["n_shared"])
        for r in source_overlap_matrix(df, prefix_tokens=2).collect()
    ]
    # 2-token prefix 'shared text' is one distinct fingerprint per source
    assert pre == [("A", "B", 1), ("A", "C", 1), ("B", "C", 1)]


def test_containment_dedup_finds_wrapped_and_short_docs(spark):
    """r10: substring-containment dedup — wrapped full-text copies,
    short-doc (< k chars) fallback, and no false positives."""
    from nifi_minifi_cpp_spark.analytics.dedup import containment_dedup

    body = "the quick brown fox jumps over the lazy dog again and again tonight"
    df = spark.createDataFrame(
        [
            (1, body),
            (2, "HEADER :: " + body + " :: FOOTER"),          # contains 1
            (3, "totally unrelated content that stands completely alone here"),
            (4, "quick brown fox"),                             # short: inside 1 and 2
            (5, body),                                          # exact dup of 1: one side flagged
        ],
        "doc_id long, text string",
    )
    got = sorted(r["doc_id"] for r in containment_dedup(df).collect())
    # 1 and 5 (both copies of body) are inside 2; 4 is inside 1/2/5.
    # Only the containers (2) and the unrelated doc (3) survive.
    assert got == [1, 4, 5]


def test_allpairs_jaccard_exact_no_false_negatives(spark):
    """r10 continuation: prefix-filtered AllPairs must equal the full
    quadratic truth join — including a pair sitting EXACTLY at the
    threshold and one just below it."""
    from nifi_minifi_cpp_spark.analytics.dedup import allpairs_jaccard_join

    docs = [
        (1, "alpha beta gamma delta epsilon"),          # tokens {a..e}
        (2, "alpha beta gamma delta zeta"),              # J(1,2)=4/6=0.667
        (3, "alpha beta gamma"),                         # J(1,3)=3/5=0.6 exact
        (4, "omega psi chi phi"),                        # disjoint
        (5, "alpha beta gamma delta epsilon"),           # exact dup of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in allpairs_jaccard_join(df, threshold=0.6, ngram=1).collect()
    }
    # quadratic truth at t=0.6 over token sets
    sets = {i: set(t.split()) for i, t in docs}
    want = {}
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if i < j:
                inter = len(sets[i] & sets[j])
                un = len(sets[i] | sets[j])
                jac = inter / un
                if jac >= 0.6:
                    want[(i, j)] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12
    assert (1, 3) in got  # the exactly-at-threshold pair survived
    assert (1, 5) in got and got[(1, 5)] == 1.0
    # shingle mode: exact dup pair is found with 3-gram shingles too
    got3 = {
        (r["id_a"], r["id_b"])
        for r in allpairs_jaccard_join(df, threshold=0.9, ngram=3).collect()
    }
    assert (1, 5) in got3
