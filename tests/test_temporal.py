"""As-of and interval joins (operators/temporal.py) vs brute-force
references."""

from __future__ import annotations

import datetime as dt

import pytest

from json_ld_spark.operators.temporal import asof_join, interval_join


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


EVENTS = [  # (event_id, user, t_minutes)
    (0, "u1", 5), (1, "u1", 10), (2, "u1", 20),
    (3, "u2", 7), (4, "u2", 30),
    (5, "u3", 1),          # user with no snapshots
]
SNAPS = [  # (user, t_minutes, price)
    ("u1", 3, 100.0), ("u1", 10, 110.0), ("u1", 15, 120.0),
    ("u2", 8, 200.0),
]


@pytest.fixture(scope="module")
def frames(spark):
    ev = spark.createDataFrame(
        [(i, u, _ts(m)) for i, u, m in EVENTS],
        "event_id long, user string, ts timestamp",
    )
    sn = spark.createDataFrame(
        [(u, _ts(m), p) for u, m, p in SNAPS],
        "user string, ts timestamp, price double",
    )
    return ev, sn


def _ref_backward(i, u, m):
    cand = [(sm, p) for su, sm, p in SNAPS if su == u and sm <= m]
    return max(cand)[1] if cand else None


def _ref_forward(i, u, m):
    cand = [(sm, p) for su, sm, p in SNAPS if su == u and sm >= m]
    return min(cand)[1] if cand else None


def test_asof_backward_matches_reference(frames):
    ev, sn = frames
    out = asof_join(ev, sn, on="user", right_cols=["price"])
    got = {r["event_id"]: r["asof_price"] for r in out.collect()}
    assert got == {i: _ref_backward(i, u, m) for i, u, m in EVENTS}
    assert out.count() == len(EVENTS)  # every left row survives


def test_asof_backward_tie_is_inclusive(frames):
    ev, sn = frames
    out = asof_join(ev, sn, on="user", right_cols=["price"])
    # event 1 at t=10 matches the snapshot AT t=10, not the earlier one
    assert {r["event_id"]: r["asof_price"] for r in out.collect()}[1] == 110.0


def test_asof_forward(frames):
    ev, sn = frames
    out = asof_join(ev, sn, on="user", right_cols=["price"],
                    direction="forward")
    got = {r["event_id"]: r["asof_price"] for r in out.collect()}
    assert got == {i: _ref_forward(i, u, m) for i, u, m in EVENTS}


def test_asof_partition_invariant(frames):
    ev, sn = frames
    a = asof_join(ev, sn, on="user", right_cols=["price"])
    b = asof_join(ev.repartition(7), sn.repartition(3), on="user",
                  right_cols=["price"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_interval_join_matches_bruteforce(spark):
    pts = spark.createDataFrame(
        [(i, "k", _ts(i * 3)) for i in range(20)],
        "pid long, k string, t timestamp",
    )
    ivs = spark.createDataFrame(
        [(100, "k", _ts(5), _ts(20)), (101, "k", _ts(18), _ts(40)),
         (102, "k", _ts(55), _ts(58))],
        "iid long, k string, s timestamp, e timestamp",
    )
    out = interval_join(pts, ivs, on="k", point_time="t",
                        start_col="s", end_col="e", bucket_seconds=600)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    exp = sorted(
        (i, iid)
        for i in range(20)
        for iid, s, e in ((100, 5, 20), (101, 18, 40), (102, 55, 58))
        if s <= i * 3 <= e
    )
    assert got == exp


def test_interval_join_bucket_width_invariant(spark):
    pts = spark.createDataFrame(
        [(i, "k", _ts(i)) for i in range(30)], "pid long, k string, t timestamp")
    ivs = spark.createDataFrame(
        [(1, "k", _ts(4), _ts(11))], "iid long, k string, s timestamp, e timestamp")
    for width in (60, 300, 3600):
        out = interval_join(pts, ivs, on="k", point_time="t",
                            start_col="s", end_col="e", bucket_seconds=width)
        assert sorted(r["pid"] for r in out.collect()) == list(range(4, 12))


# ---------------------------------------------------------------------------
# randomized fuzz vs brute force (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_events = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
    min_size=1, max_size=25,
)
_snaps = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50),
              st.integers(0, 999)),
    min_size=0, max_size=25,
    unique_by=lambda r: (r[0], r[1]),  # unique per (key, ts), per contract
)


@given(_events, _snaps)
@settings(max_examples=25, deadline=None)
def test_asof_fuzz_matches_bruteforce(spark, evs, sns):
    ev = spark.createDataFrame(
        [(i, k, _ts(m)) for i, (k, m) in enumerate(evs)],
        "event_id long, user string, ts timestamp",
    )
    sn_rows = [(k, _ts(m), float(p)) for k, m, p in sns]
    sn = spark.createDataFrame(
        sn_rows or [("zzz", _ts(0), 0.0)],
        "user string, ts timestamp, price double",
    )
    out = {r["event_id"]: r["asof_price"]
           for r in asof_join(ev, sn, on="user",
                              right_cols=["price"]).collect()}
    for i, (k, m) in enumerate(evs):
        cand = [(sm, p) for sk, sm, p in sns if sk == k and sm <= m]
        exp = float(max(cand)[1]) if cand else None
        assert out[i] == exp, (i, k, m)


@given(_events, st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 40),
              st.integers(0, 15)),
    min_size=1, max_size=10))
@settings(max_examples=20, deadline=None)
def test_interval_fuzz_matches_bruteforce(spark, evs, ivs):
    pts = spark.createDataFrame(
        [(i, k, _ts(m)) for i, (k, m) in enumerate(evs)],
        "pid long, k string, t timestamp",
    )
    iv = spark.createDataFrame(
        [(j, k, _ts(s), _ts(s + w)) for j, (k, s, w) in enumerate(ivs)],
        "iid long, k string, s timestamp, e timestamp",
    )
    out = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, iv, on="k", point_time="t",
                               start_col="s", end_col="e",
                               bucket_seconds=240).collect()
    )
    exp = sorted(
        (i, j)
        for i, (k, m) in enumerate(evs)
        for j, (ik, s, w) in enumerate(ivs)
        if ik == k and s <= m <= s + w
    )
    assert out == exp


def test_interval_join_left_semi(spark):
    pts = spark.createDataFrame(
        [(i, "k", _ts(i)) for i in range(10)], "pid long, k string, t timestamp")
    ivs = spark.createDataFrame(
        [(1, "k", _ts(2), _ts(4)), (2, "k", _ts(3), _ts(6))],
        "iid long, k string, s timestamp, e timestamp")
    out = interval_join(pts, ivs, on="k", point_time="t",
                        start_col="s", end_col="e", bucket_seconds=60,
                        how="left_semi")
    # semi: each point at most once even when two intervals cover it
    assert sorted(r["pid"] for r in out.collect()) == [2, 3, 4, 5, 6]
    assert out.columns == ["pid", "k", "t"]


def test_interval_join_rejects_other_how(spark):
    df = spark.createDataFrame([(1, "k", _ts(0))], "i long, k string, t timestamp")
    with pytest.raises(ValueError, match="how"):
        interval_join(df, df.selectExpr("i", "k", "t as s", "t as e"),
                      on="k", point_time="t", start_col="s", end_col="e",
                      bucket_seconds=60, how="left")


def test_decayed_counts_matches_python(spark):
    import datetime as dt

    rows = []
    base = dt.datetime(2026, 1, 1)
    for i in range(40):
        rows.append((f"u{i % 5}", base + dt.timedelta(hours=3 * i)))
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    ref = "2026-01-10 00:00:00"
    hl = 86_400.0
    from json_ld_spark.operators.temporal import decayed_counts

    got = {r.user_id: (r.n_events, r.decayed_r)
           for r in decayed_counts(df, ["user_id"], "ts", ref, hl).collect()}
    ref_dt = dt.datetime(2026, 1, 10)
    want = {}
    for (u, ts) in rows:
        age = (ref_dt - ts).total_seconds()
        n, s = want.get(u, (0, 0.0))
        want[u] = (n + 1, s + 2.0 ** (-age / hl))
    assert set(got) == set(want)
    for u, (n, s) in want.items():
        assert got[u][0] == n
        assert abs(got[u][1] - round(s, 6)) < 2e-6


def test_sessionize_matches_brute_force(spark):
    """Session assignment equals a driver-side replay, including
    equal-timestamp tiebreaks and a NULL-ts drop."""
    import datetime as dt

    from json_ld_spark.operators.temporal import session_stats, sessionize

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # user 1: gaps 10s, 2000s (boundary), 5s; user 2: equal-ts pair
    for i, off in enumerate([0, 10, 2010, 2015]):
        rows.append((i, 1, t0 + dt.timedelta(seconds=off)))
    rows += [(10, 2, t0), (11, 2, t0), (12, 2, t0 + dt.timedelta(seconds=1801))]
    rows.append((99, 1, None))
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r.event_id: (r.session_idx, r.session_id)
        for r in sessionize(df, gap_seconds=1800,
                            order_cols=["event_id"]).collect()
    }
    assert got == {
        0: (1, "1#1"), 1: (1, "1#1"), 2: (2, "1#2"), 3: (2, "1#2"),
        10: (1, "2#1"), 11: (1, "2#1"), 12: (2, "2#2"),
    }  # NULL-ts row dropped
    stats = {
        (r.user_id, r.session_id): (r.n_events, r.duration_us)
        for r in session_stats(
            sessionize(df, gap_seconds=1800, order_cols=["event_id"])
        ).collect()
    }
    assert stats[(1, "1#1")] == (2, 10_000_000)
    assert stats[(2, "2#1")] == (2, 0)


def test_sessionize_boundary_is_strict_greater(spark):
    """A gap of exactly gap_seconds does NOT split (strict >) and
    sub-second gaps count in integer microseconds."""
    import datetime as dt

    from json_ld_spark.operators.temporal import sessionize

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (0, 7, t0),
        (1, 7, t0 + dt.timedelta(seconds=1800)),            # == gap: same
        (2, 7, t0 + dt.timedelta(seconds=3600, microseconds=1)),  # >: split
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r.event_id: r.session_idx
           for r in sessionize(df, gap_seconds=1800,
                               order_cols=["event_id"]).collect()}
    assert got == {0: 1, 1: 1, 2: 2}


def test_sessionize_fuzz_vs_python_replay(spark):
    """Hypothesis: random event sets (duplicate timestamps, boundary
    gaps, many keys) sessionize exactly like a driver-side replay of
    the documented strict-> rule over integer microseconds."""
    from hypothesis import given, settings, strategies as st

    from json_ld_spark.operators.temporal import sessionize

    GAP = 10  # seconds

    @given(st.lists(
        st.tuples(st.integers(0, 3),                      # user
                  st.integers(0, 40_000_000)),            # micros offset
        min_size=1, max_size=40))
    @settings(max_examples=12, deadline=None)
    def prop(rows):
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        data = [(i, u, t0 + dt.timedelta(microseconds=us))
                for i, (u, us) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "event_id long, user_id long, ts timestamp")
        got = {r.event_id: (r.user_id, r.session_idx)
               for r in sessionize(df, gap_seconds=GAP,
                                   order_cols=["event_id"]).collect()}
        expect = {}
        by_user: dict = {}
        for i, (u, us) in enumerate(rows):
            by_user.setdefault(u, []).append((us, i))
        for u, evs in by_user.items():
            evs.sort()
            sid, prev = 0, None
            for us, i in evs:
                if prev is None or us - prev > GAP * 1_000_000:
                    sid += 1
                prev = us
                expect[i] = (u, sid)
        assert got == expect

    prop()


def test_funnel_semantics(spark):
    """Strict-order funnel: steps only count after the previous step's
    earliest match; partial converters keep NULL tails; keys without
    step 1 are absent."""
    import datetime as dt

    from json_ld_spark.operators.temporal import funnel

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, T(0), "view"), (1, T(1), "click"), (1, T(2), "purchase"),
        (2, T(5), "click"), (2, T(6), "view"), (2, T(7), "purchase"),
        (3, T(1), "view"), (3, T(0), "purchase"), (3, T(2), "click"),
        (4, T(3), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["user_id"]: (r["steps_completed"], r["t2_us"] is None, r["t3_us"] is None)
        for r in funnel(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: (3, False, False), 2: (1, True, True), 3: (2, False, True)}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel(df, ["view"])


def test_funnel_earliest_greedy_is_exact(spark):
    """The early step-2 match at t=1 does not block the later
    purchase: earliest-next-match still finds the full path."""
    import datetime as dt

    from json_ld_spark.operators.temporal import funnel

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [(1, T(0), "view"), (1, T(1), "click"), (1, T(9), "click"),
            (1, T(5), "purchase")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = funnel(df, ["view", "click", "purchase"]).first()
    assert r["steps_completed"] == 3


# ------------------------------------------------- retention cohorts


def test_retention_cohorts_hand_computed(spark):
    from json_ld_spark.operators.temporal import retention_cohorts

    rows = [
        # users 1,2 first in period 0 (days 0..6); user 3 first in period 1
        (1, "1970-01-02 00:00:00"),
        (2, "1970-01-03 00:00:00"),
        (1, "1970-01-09 00:00:00"),   # period 1 — user 1 retained
        (3, "1970-01-10 00:00:00"),   # cohort period 1
        (3, "1970-01-20 00:00:00"),   # period 2 — offset 1 for cohort 1
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (r["cohort_start"].isoformat(), r["offset"]): (r["n_active"], r["n_cohort"], r["retention_r"])
        for r in retention_cohorts(ev, "user_id", "ts", 7).collect()
    }
    assert out == {
        ("1970-01-01", 0): (2, 2, 1.0),
        ("1970-01-01", 1): (1, 2, 0.5),
        ("1970-01-08", 0): (1, 1, 1.0),
        ("1970-01-08", 1): (1, 1, 1.0),
    }


def test_retention_cohorts_duplicate_events_count_once(spark):
    from json_ld_spark.operators.temporal import retention_cohorts

    rows = [(1, "1970-01-02 00:00:00"), (1, "1970-01-02 05:00:00")]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = retention_cohorts(ev, "user_id", "ts", 7).collect()
    assert len(out) == 1 and out[0]["n_active"] == 1
