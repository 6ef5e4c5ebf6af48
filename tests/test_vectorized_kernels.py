"""Equivalence tests for the r16 Arrow/numpy kernel rewrites.

Two per-row kernels moved from Catalyst HOF expressions to vectorized
numpy inside mapInPandas (optimization r16, guide §4.2): the
containment-dedup winnowing window-min and the char-entropy histogram.
Both rewrites claim BYTE-IDENTICAL (winnow) / ulps-below-rounding
(entropy) outputs; these tests pin that claim against independent
reference models on randomized corpora so a future kernel edit cannot
silently drift.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _random_texts(seed: int, n: int, alphabet: str, lo: int, hi: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        ln = rng.randint(lo, hi)
        out.append("".join(rng.choice(alphabet) for _ in range(ln)))
    return out


def test_containment_winnow_kernel_matches_catalyst_reference(spark):
    """The numpy sliding-window-min + first-occurrence-distinct kernel
    inside containment_dedup must reproduce the former Catalyst
    expression exactly (same xxhash64 inputs, min of longs, distinct
    order). Reference = the literal Catalyst form, run side by side on
    the same frame."""
    k, w = 20, 16
    # low-alphabet strings maximize repeated k-grams (duplicate mins,
    # the distinct-order edge); include one string at the exact
    # min-length boundary (k + w - 1) and repetitive/periodic bodies
    texts = _random_texts(716, 40, "abcd ", k + w - 1, 400)
    texts += ["x" * (k + w - 1), ("ab" * 200), ("tick tock " * 30)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, _t string"
    ).withColumn("_len", F.length("_t"))

    kg = df.select(
        "doc_id",
        "_len",
        F.transform(
            F.sequence(F.lit(0), F.col("_len") - k),
            lambda i: F.xxhash64(F.substring(F.col("_t"), i + 1, F.lit(k))),
        ).alias("_kg"),
    )
    reference = {
        r["doc_id"]: list(r["_g"])
        for r in kg.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("_kg") - w),
                    lambda i: F.array_min(F.slice(F.col("_kg"), i + 1, w)),
                )
            ).alias("_g"),
        ).collect()
    }

    # the SHIPPED kernel (ADVICE r16: pin the module-level function
    # containment_dedup itself calls, so a future edit to the shipped
    # code cannot drift without failing this exact-equality assertion)
    from nifi_minifi_cpp_spark.analytics import dedup as dedup_mod
    from nifi_minifi_cpp_spark.analytics.dedup import _winnow_window_mins

    import numpy as np
    import pandas as pd

    def _winnow(batches):
        for pdf in batches:
            out = []
            for arr in pdf["_kg"]:
                out.append(_winnow_window_mins(np.asarray(arr, dtype=np.int64), w))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "_len": pdf["_len"], "_g": out}
            )

    got = {
        r["doc_id"]: list(r["_g"])
        for r in kg.mapInPandas(_winnow, "doc_id long, _len int, _g array<long>").collect()
    }
    assert got == reference  # values AND first-occurrence order

    # and the public operator end-to-end still finds the planted
    # containments on this adversarial corpus
    wrapped = spark.createDataFrame(
        [(1000 + i, f"PRE {t} POST") for i, t in enumerate(texts[:5])],
        "doc_id long, text string",
    )
    base = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    flagged = {
        r["doc_id"]
        for r in dedup_mod.containment_dedup(base.unionAll(wrapped)).collect()
    }
    assert set(range(5)) <= flagged  # every wrapped original is caught


def test_char_entropy_matches_explode_groupby_model(spark):
    """char_entropy_scores (numpy histogram) vs an independent
    explode+groupBy SQL model of H = log2(n) - sum(c*log2(c))/n, on
    randomized unicode text (ascii + accents + CJK + emoji). Agreement
    to the operator's round(4) contract."""
    from nifi_minifi_cpp_spark.analytics.text_analysis import char_entropy_scores

    alphabet = "abcdefgh 0123éü中文\U0001f600"
    texts = _random_texts(42, 60, alphabet, 1, 300) + ["a", "\U0001f600" * 7]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["char_entropy"] for r in char_entropy_scores(df).collect()}

    for i, t in enumerate(texts):
        n = len(t)
        counts: dict[str, int] = {}
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
        h = math.log2(n) - sum(c * math.log2(c) for c in counts.values()) / n
        assert got[i] == pytest.approx(h, abs=1.1e-4), (i, t[:40])
    assert len(got) == len(texts)
