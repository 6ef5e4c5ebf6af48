

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
