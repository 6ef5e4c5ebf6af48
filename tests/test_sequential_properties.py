"""Property-based suites for the r12 sequential operators (CUSUM,
Holt, Kaplan-Meier) against pure-Python recursion models — the
engines run the prefix-min identity / Catalyst fold, the model runs
the textbook sequential recursion; they must agree exactly (all three
operators are integer-exact by construction). Same batching
discipline as test_corpus_properties: few examples, deadline off."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _spark():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from nifi_minifi_cpp_spark.session import get_spark

    return get_spark("seq-props", cpus=8)


def _hour_ts(i: int, minute: int = 15) -> str:
    return f"2024-01-{1 + i // 24:02d} {i % 24:02d}:{minute:02d}:00"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    cents=st.lists(st.integers(min_value=-500, max_value=5000), min_size=2, max_size=30)
)
def test_cusum_matches_sequential_recursion(cents):
    """The prefix-min identity S_t = P_t - min(0, min P_j) must equal
    the textbook recursion S_t = max(0, S_{t-1} + d_t) hour by hour —
    including negative values and negative series means (the floor-
    division alignment)."""
    from nifi_minifi_cpp_spark.operators.temporal import cusum_changepoints

    spark = _spark()
    rows = [("x", _hour_ts(i), c / 100.0) for i, c in enumerate(cents)]
    df = spark.createDataFrame(rows, "event_type string, ts_s string, value double")
    df = df.selectExpr("event_type", "CAST(ts_s AS timestamp) AS ts", "value")
    got = cusum_changepoints(df).collect()[0]

    n = len(cents)
    tgt = sum(cents) // n  # python // floors, matching both engines
    k = tgt // 4
    h = 4 * tgt

    def run(d_seq):
        s = 0
        out = []
        for d in d_seq:
            s = max(0, s + d)
            out.append(s)
        return out

    s_up = run([c - tgt - k for c in cents])
    s_dn = run([tgt - c - k for c in cents])
    up_flags = [i for i, s in enumerate(s_up) if s > h]
    dn_flags = [i for i, s in enumerate(s_dn) if s > h]
    assert got["n_hours"] == n
    assert got["n_up_flags"] == len(up_flags)
    assert got["n_dn_flags"] == len(dn_flags)
    assert got["max_s_up"] == max(s_up)
    assert got["max_s_dn"] == max(s_dn)
    if up_flags and dn_flags:
        # hour ids are a shared offset; compare the gap between the
        # first flags instead of absolute epoch hours
        assert got["first_up_hour"] - got["first_dn_hour"] == up_flags[0] - dn_flags[0]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    cents=st.lists(st.integers(min_value=-2000, max_value=5000), min_size=5, max_size=24)
)
def test_holt_matches_sequential_recursion(cents):
    """The Catalyst fold must equal the textbook Holt recursion with
    alpha = beta = 1/2 and explicit floors, including negative levels
    and trends."""
    from nifi_minifi_cpp_spark.operators.temporal import holt_forecast_errors

    spark = _spark()
    rows = [("x", _hour_ts(i), c / 100.0) for i, c in enumerate(cents)]
    df = spark.createDataFrame(rows, "event_type string, ts_s string, value double")
    df = df.selectExpr("event_type", "CAST(ts_s AS timestamp) AS ts", "value")
    horizon = 2
    got = {r["step"]: (r["forecast_cents"], r["actual_cents"]) for r in
           holt_forecast_errors(df, horizon=horizon).collect()}

    t = len(cents) - horizon
    lvl, tr = cents[0], cents[1] - cents[0]
    for i in range(1, t):
        l2 = (cents[i] + lvl + tr) // 2  # python // floors, like both engines
        tr = (l2 - lvl + tr) // 2
        lvl = l2
    want = {s: (lvl + s * tr, cents[t + s - 1]) for s in range(1, horizon + 1)}
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    subjects=st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=48)),
        min_size=1,
        max_size=12,
    )
)
def test_kaplan_meier_matches_product_limit(subjects):
    """The fold must equal the textbook product-limit recursion over
    the death-time table: None = never converts (censored at the end
    of observation), an int = converts that many hours after
    enrollment."""
    from nifi_minifi_cpp_spark.operators.temporal import kaplan_meier_survival

    spark = _spark()
    rows = []
    for u, delay in enumerate(subjects):
        rows.append((u, "signup", _hour_ts(0, minute=0)))
        if delay is not None:
            rows.append((u, "purchase", _hour_ts(delay, minute=30)))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_s string")
    df = df.selectExpr("user_id", "event_type", "CAST(ts_s AS timestamp) AS ts")
    got = {
        r["t_hours"]: (r["n_at_risk"], r["d_deaths"], r["survival_ppm"])
        for r in kaplan_meier_survival(df).collect()
    }

    hmax = max([d for d in subjects if d is not None], default=0)
    durs = [(d, True) if d is not None else (hmax, False) for d in subjects]
    death_times = sorted({d for d, died in durs if died})
    s, want = 1_000_000, {}
    for t in death_times:
        n = sum(1 for d, _ in durs if d >= t)
        dd = sum(1 for d, died in durs if died and d == t)
        s = (s * (n - dd)) // n
        want[t] = (n, dd, s)
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a=st.lists(st.integers(min_value=-500, max_value=5000), min_size=3, max_size=40),
    b=st.lists(st.integers(min_value=-500, max_value=5000), min_size=3, max_size=40),
)
def test_welch_ttest_matches_textbook_formula(a, b):
    """The sufficient-sums Welch t must equal the textbook two-sample
    formula computed from per-variant sample means and n-1 variances
    (r13) — including negative values and unequal group sizes."""
    from nifi_minifi_cpp_spark.analytics.sketches import welch_ttest_ab

    spark = _spark()
    rows = [("x", 2 * i, c / 100.0) for i, c in enumerate(a)]
    rows += [("x", 2 * i + 1, c / 100.0) for i, c in enumerate(b)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    got = welch_ttest_ab(df).collect()[0]

    def mean(xs):
        return sum(xs) / len(xs)

    def var(xs):
        m = mean(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    ma, mb, va, vb = mean(a), mean(b), var(a), var(b)
    na, nb = len(a), len(b)
    assert got["n_a"] == na and got["n_b"] == nb
    if va == 0 and vb == 0:
        return  # zero-variance groups: t is inf/NaN territory, skip
    se2 = va / na + vb / nb
    t = (ma - mb) / se2**0.5
    dfree = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert got["t_stat"] is not None and abs(got["t_stat"] - t) < 1e-4
    assert abs(got["welch_df"] - dfree) < 1e-2
    assert got["significant"] == (abs(t) > 1.96)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    cents=st.lists(st.integers(min_value=0, max_value=5000), min_size=4, max_size=60),
    gap_at=st.integers(min_value=1, max_value=50),
)
def test_acf_matches_textbook_pearson(cents, gap_at):
    """acf_by_key must equal the plain Pearson correlation of the
    dense zero-filled hourly series with its L-shift — including a
    silent hour injected mid-series (the dense-grid semantics)."""
    from nifi_minifi_cpp_spark.operators.temporal import acf_by_key

    spark = _spark()
    # drop one hour to create a gap the dense grid must re-fill with 0
    hours = [i for i in range(len(cents) + 1) if i != min(gap_at, len(cents) - 1)][
        : len(cents)
    ]
    rows = [("x", _hour_ts(h), c / 100.0) for h, c in zip(hours, cents)]
    df = spark.createDataFrame(rows, "event_type string, ts_s string, value double")
    df = df.selectExpr("event_type", "CAST(ts_s AS timestamp) AS ts", "value")
    got = {r["lag"]: r for r in acf_by_key(df, lags=(1, 2, 3)).collect()}

    series = {h: c for h, c in zip(hours, cents)}
    lo, hi = min(hours), max(hours)
    y = [series.get(t, 0) for t in range(lo, hi + 1)]
    for lag in (1, 2, 3):
        if len(y) <= lag:
            assert lag not in got or got[lag]["n_pairs"] == 0
            continue
        xs, ys = y[:-lag], y[lag:]
        n = len(xs)
        assert got[lag]["n_pairs"] == n
        num = n * sum(p * q for p, q in zip(xs, ys)) - sum(xs) * sum(ys)
        den = (
            (n * sum(p * p for p in xs) - sum(xs) ** 2) ** 0.5
            * (n * sum(q * q for q in ys) - sum(ys) ** 2) ** 0.5
        )
        if den == 0:
            assert got[lag]["acf_r"] is None
        else:
            assert abs(got[lag]["acf_r"] - num / den) < 1e-4
