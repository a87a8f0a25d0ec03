"""Backward as-of join (operators/asof.py): semantics on hand-built
frames + agreement with DuckDB's native ASOF JOIN on the events table
(covered by the oracle gate for the catalog entry)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.operators.asof import asof_join_backward


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2020-01-02"), "l1"), (1, _ts("2020-01-05"), "l2"), (2, _ts("2020-01-01"), "l3")],
        "k long, lts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2020-01-01"), "a"), (1, _ts("2020-01-03"), "b"), (2, _ts("2020-01-02"), "c")],
        "k long, rts timestamp, rv string",
    )
    got = {
        (r["k"], r["lv"]): r["rv"]
        for r in asof_join_backward(
            left, right, on_left="k", on_right="k",
            left_ts="lts", right_ts="rts", right_cols=["rv"],
        ).collect()
    }
    # l1@01-02 → a (01-01); l2@01-05 → b (01-03); l3@01-01 → none (right is 01-02)
    assert got == {(1, "l1"): "a", (1, "l2"): "b", (2, "l3"): None}


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame([(1, _ts("2020-01-03"), "x")], "k long, lts timestamp, lv string")
    right = spark.createDataFrame([(1, _ts("2020-01-03"), "same")], "k long, rts timestamp, rv string")
    row = asof_join_backward(
        left, right, on_left="k", on_right="k",
        left_ts="lts", right_ts="rts", right_cols=["rv"],
    ).head()
    assert row["rv"] == "same"  # backward as-of is inclusive (≤)


def test_asof_multiple_right_cols_and_volume(spark, sf_dir):
    """Every left row appears exactly once (as-of never duplicates the
    left side, unlike a range join)."""
    from secure_agent_api_vector_search_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30).select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").alias("ots")
    )
    e = load_table(spark, sf_dir, "events").groupBy("user_id", "ts").agg(
        F.max("event_id").alias("event_id"), F.max("value").alias("value")
    )
    out = asof_join_backward(
        o, e, on_left="o_custkey", on_right="user_id",
        left_ts="ots", right_ts="ts", right_cols=["event_id", "value"],
    )
    assert out.count() == o.count()
    assert set(out.columns) == {"o_orderkey", "o_custkey", "ots", "event_id", "value"}
    # monotonicity spot-check: a later order of the same customer never
    # has an earlier matched event
    rows = out.filter(F.col("event_id").isNotNull()).orderBy("o_custkey", "ots").collect()
    by_cust: dict = {}
    for r in rows:
        prev = by_cust.get(r["o_custkey"])
        if prev is not None:
            assert r["event_id"] >= 0  # matched
        by_cust[r["o_custkey"]] = r


def test_events_funnel_hand_values(spark):
    """Controlled funnel: completion, window expiry, and out-of-order
    steps each behave per the first-touch contract."""
    from secure_agent_api_vector_search_spark.operators.analytics import funnel_frame

    rows = [
        # user 1: clean completion
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        # user 2: purchase BEFORE click -> not counted (order matters)
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 02:00:00", "purchase"),
        (2, "2024-01-01 03:00:00", "click"),
        # user 3: click outside the 4h window
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-01 05:00:00", "click"),
        # user 4: never enters (no view)
        (4, "2024-01-01 00:00:00", "click"),
    ]
    e = spark.createDataFrame(
        [(i, u, ts, t) for i, (u, ts, t) in enumerate(rows)],
        "event_id long, user_id long, ts string, event_type string",
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    out = {r["user_id"]: r for r in funnel_frame(e, window_sec=4 * 3600).collect()}
    assert set(out) == {1, 2, 3}  # user 4 never entered
    assert out[1]["completed"] is True and out[1]["stage"] == 3
    assert out[2]["stage"] == 2  # click found (in window), purchase not after click in window? 
    assert out[3]["stage"] == 1 and out[3]["t_click_us"] is None


def test_events_retention_hand_values(spark):
    """Controlled cohorts: day-0 always present, offsets count distinct
    users, retention is the fraction of the cohort's day-0 size."""
    import pytest

    from secure_agent_api_vector_search_spark.operators.analytics import retention_frame

    rows = [
        # cohort 2024-01-01: users 1,2. user 1 returns d+1 and d+3
        # (twice on d+1 — must count once); user 2 never returns.
        (1, "2024-01-01 08:00:00"),
        (1, "2024-01-02 09:00:00"),
        (1, "2024-01-02 21:00:00"),
        (1, "2024-01-04 10:00:00"),
        (2, "2024-01-01 23:59:59"),
        # cohort 2024-01-03: user 3, returns beyond max_offset -> dropped
        (3, "2024-01-03 00:00:00"),
        (3, "2024-01-20 00:00:00"),
    ]
    e = spark.createDataFrame(
        [(i, u, ts) for i, (u, ts) in enumerate(rows)],
        "event_id long, user_id long, ts string",
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
    out = {(str(r["cohort"]), r["day_offset"]): r
           for r in retention_frame(e, max_offset_days=7).collect()}
    assert set(out) == {
        ("2024-01-01", 0), ("2024-01-01", 1), ("2024-01-01", 3),
        ("2024-01-03", 0),
    }
    assert out[("2024-01-01", 0)]["n_users"] == 2
    assert out[("2024-01-01", 1)]["n_users"] == 1  # two events, one user-day
    assert out[("2024-01-01", 1)]["retention"] == pytest.approx(0.5)
    assert out[("2024-01-01", 3)]["cohort_size"] == 2
    assert out[("2024-01-03", 0)]["retention"] == pytest.approx(1.0)


def test_events_engagement_window_boundary(spark):
    """The trailing window is half-open (day-27 .. day]: a visit
    exactly window_days before is OUT, day-(window-1) is IN; DAU counts
    distinct users per day and stickiness is dau/mau."""
    import pytest

    from secure_agent_api_vector_search_spark.operators.analytics import engagement_frame

    rows = [
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 11:00:00"),
        (1, "2024-01-29 09:00:00"),  # 28 days after Jan 1 -> Jan 1 out of window
        (2, "2024-01-28 09:00:00"),  # 27 days after Jan 1 -> Jan 1 in window
    ]
    e = spark.createDataFrame(
        [(i, u, ts) for i, (u, ts) in enumerate(rows)],
        "event_id long, user_id long, ts string",
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
    out = {str(r["day"]): r for r in engagement_frame(e, window_days=28).collect()}
    assert set(out) == {"2024-01-01", "2024-01-28", "2024-01-29"}
    assert (out["2024-01-01"]["dau"], out["2024-01-01"]["mau"]) == (2, 2)
    # Jan 28 sees Jan 1 (27 days back): both users in the window
    assert (out["2024-01-28"]["dau"], out["2024-01-28"]["mau"]) == (1, 2)
    # Jan 29: Jan 1 aged out; window holds user 1 (Jan 29) + user 2 (Jan 28)
    assert (out["2024-01-29"]["dau"], out["2024-01-29"]["mau"]) == (1, 2)
    assert out["2024-01-28"]["stickiness"] == pytest.approx(0.5)


def test_events_hourly_anomaly_planted_spike(spark, tmp_path):
    """A planted 10x traffic spike in one hour must be the ONLY
    anomalous cell for its type, and constant-traffic types must get
    z=0 (never NaN)."""
    import datetime as dt

    from secure_agent_api_vector_search_spark.operators.analytics import (
        events_hourly_anomaly,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    uid = 0
    for h in range(24):
        # 'click': 5/hour steady, except hour 12 carries 50
        for i in range(50 if h == 12 else 5):
            rows.append((uid, "click", base + dt.timedelta(hours=h, seconds=i), 1.0, "{}"))
            uid += 1
        # 'view': perfectly constant 3/hour -> zero variance
        for i in range(3):
            rows.append((uid, "view", base + dt.timedelta(hours=h, seconds=i), 1.0, "{}"))
            uid += 1
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts", "value", "props"])
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    out = events_hourly_anomaly(spark, str(tmp_path))
    got = {(r.hour, r.event_type): r for r in out.collect()}
    anomalies = [k for k, r in got.items() if r.is_anomaly]
    assert anomalies == [("2026-01-01 12", "click")]
    assert got[("2026-01-01 12", "click")].z > 4.0
    # constant type: z exactly 0, no NaN
    assert all(r.z == 0.0 for k, r in got.items() if k[1] == "view")
