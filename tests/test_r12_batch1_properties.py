"""Property-based suites for the r12 batch-1 operators (LTTB, CDC
chunking, Kneser-Ney) against pure-Python models — the same
discipline as test_sequential_properties: few examples, one Spark
job each, deadline off."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _spark():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from nifi_minifi_cpp_spark.session import get_spark

    return get_spark("r12-props", cpus=8)


def _hour_ts(i: int, minute: int = 15) -> str:
    return f"2024-01-{1 + i // 24:02d} {i % 24:02d}:{minute:02d}:00"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ys=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=5, max_size=20)
)
def test_lttb_matches_python_model(ys):
    """The Catalyst-fold LTTB must equal the textbook sequential pick
    loop (largest cross-product area against the previous pick and the
    next bucket's centroid, ties to the earlier point)."""
    from nifi_minifi_cpp_spark.operators.window import lttb_downsample

    n_out = 4
    k = n_out - 2
    spark = _spark()
    rows = [("x", _hour_ts(i), y / 100.0) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "event_type string, ts_s string, value double")
    df = df.selectExpr("event_type", "CAST(ts_s AS timestamp) AS ts", "value")
    got = {
        r["pick_order"]: (r["t_hour"], r["y_cents"])
        for r in lttb_downsample(df, n_out=n_out).collect()
    }

    L = len(ys)
    base = min(got.values())[0] if got else 0
    arr = [(base + i, y) for i, y in enumerate(ys)]
    bounds = [1 + (i * (L - 2)) // k for i in range(k + 1)] + [L]
    picks = [arr[0]]
    for i in range(k):
        lo, hi, hi2 = bounds[i], bounds[i + 1], bounds[i + 2]
        cur, nxt = arr[lo:hi], arr[hi:hi2]
        c = len(nxt)
        nts, nys = sum(t for t, _ in nxt), sum(y for _, y in nxt)
        pt, py = picks[-1]
        best = max(
            cur,
            key=lambda p: (
                abs(pt * (p[1] * c - nys) + p[0] * (nys - py * c) + nts * (py - p[1])),
                -p[0],
            ),
        )
        picks.append(best)
    picks.append(arr[L - 1])
    want = {i: p for i, p in enumerate(picks)}
    if L >= n_out:
        assert got == want
    else:
        assert got == {}


source_word = st.text(alphabet="abcd", min_size=1, max_size=3)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(source_word, min_size=1, max_size=40), min_size=1, max_size=6
    )
)
def test_cdc_chunk_stats_matches_python_model(docs):
    """Chunk boundaries, counts, and dup-savings must equal the
    pure-Python rolling-md5 construction."""
    from nifi_minifi_cpp_spark.analytics.dedup import cdc_chunk_stats

    spark = _spark()
    rows = [("s", i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    r = cdc_chunk_stats(df).collect()[0]

    from collections import Counter

    chunks: Counter = Counter()
    for _, _, text in rows:
        w = text.split(" ")
        n = len(w)
        bnd = [
            i
            for i in range(n)
            if i == n - 1
            or (
                i >= 2
                and int(
                    hashlib.md5(" ".join(w[i - 2 : i + 1]).encode()).hexdigest()[:6],
                    16,
                )
                % 8
                == 0
            )
        ]
        s = 0
        for e in bnd:
            chunks[" ".join(w[s : e + 1])] += 1
            s = e + 1
    assert r["n_docs"] == len(docs)
    assert r["n_chunks"] == sum(chunks.values())
    assert r["n_distinct_chunks"] == len(chunks)
    assert r["dup_chars_saved"] == sum((c - 1) * len(t) for t, c in chunks.items())


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "ab", "ba", "bb"]), min_size=2, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_kn_bigram_matches_python_model(docs):
    """Per-doc interpolated Kneser-Ney average NLL must equal the
    pure-Python formula with the identical left-assoc float
    expression, rounded to 4 decimals."""
    from collections import Counter

    from nifi_minifi_cpp_spark.analytics.text_analysis import kn_bigram_scores

    spark = _spark()
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in kn_bigram_scores(df).collect()
    }

    pairs = [(i, (a, b)) for i, ws in enumerate(docs) for a, b in zip(ws, ws[1:])]
    cb: Counter = Counter(p for _, p in pairs)
    cw: Counter = Counter()
    n1w1: Counter = Counter()
    n1w2: Counter = Counter()
    for (w1, w2), c in cb.items():
        cw[w1] += c
        n1w1[w1] += 1
        n1w2[w2] += 1
    B = len(cb)
    D = 0.75
    want = {}
    for i, ws in enumerate(docs):
        ps = [
            (cb[(a, b)] - D + D * n1w1[a] * n1w2[b] / B) / cw[a]
            for a, b in zip(ws, ws[1:])
        ]
        s = 0.0
        for p in ps:
            s += math.log2(p)
        want[i] = (len(ps), round(-s / len(ps), 4))
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) <= 1e-4, (i, got[i], want[i])
