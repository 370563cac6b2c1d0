"""Unit laws for the statistics family (w_ols_daily_trend /
w_pearson_daily / w_decayed_counts) on synthesized event frames.

The oracle gate certifies the queries on the driver corpus; these tests
pin the edge cases the corpus never produces (zero-variance groups →
NULL, single-day types) and the mergeability law the 100 TB shape relies
on (decay numerators add across any partition split).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from pagopa_ecommerce_cdc_service_spark.plans import events_queries as eq


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def _ts(day, hour=0):
    return dt.datetime(2026, 1, day, hour)


def test_ols_exact_fit_and_zero_variance_null(spark, tmp_path):
    # 'lin' counts follow y = 2x + 3 exactly over days 1..4 → slope 2.0,
    # intercept 3.0 with day 1 as x=0; 'one' has a single day → den = 0.
    rows = []
    eid = 0
    for d in range(1, 5):
        for _ in range(2 * (d - 1) + 3):
            rows.append((eid, _ts(d), 1, "lin", 1.0, "{}"))
            eid += 1
    rows.append((eid, _ts(1), 2, "one", 1.0, "{}"))
    sf = _write_events(spark, tmp_path, rows)

    got = {
        r["event_type"]: r
        for r in eq.QUERIES["w_ols_daily_trend"](spark, sf).collect()
    }
    lin = got["lin"]
    assert lin["n_days"] == 4
    assert lin["slope_den"] > 0
    assert lin["slope_per_day"] == pytest.approx(2.0)
    assert lin["intercept"] == pytest.approx(3.0)
    # exact rational form agrees with the double form
    assert lin["slope_num"] / lin["slope_den"] == lin["slope_per_day"]
    one = got["one"]
    assert one["slope_den"] == 0
    assert one["slope_per_day"] is None and one["intercept"] is None


def test_pearson_perfect_and_zero_variance(spark, tmp_path):
    # 'up': users/day == events/day (distinct users each event) → r = 1.
    # 'flat': constant 2 events by the SAME user each day → den_x = 0.
    rows = []
    eid = 0
    for d in range(1, 4):
        for u in range(d + 1):
            rows.append((eid, _ts(d), 100 + eid, "up", 1.0, "{}"))
            eid += 1
    for d in range(1, 4):
        for _ in range(2):
            rows.append((eid, _ts(d), 7, "flat", 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)

    got = {
        r["event_type"]: r
        for r in eq.QUERIES["w_pearson_daily"](spark, sf).collect()
    }
    up = got["up"]
    assert up["pearson_r"] == pytest.approx(1.0)
    # exact components satisfy r = num / sqrt(den_x * den_y) bit-for-bit
    assert up["pearson_r"] == up["r_num"] / math.sqrt(
        float(up["den_x"]) * float(up["den_y"])
    )
    flat = got["flat"]
    assert flat["den_x"] == 0 and flat["pearson_r"] is None


def test_decay_weights_and_merge_law(spark, tmp_path):
    # days 1, 8, 15 → k = 2, 1, 0 weeks old → weights 1, 2, 4 over 2^2.
    rows = []
    eid = 0
    for day, n in ((1, 5), (8, 3), (15, 2)):
        for _ in range(n):
            rows.append((eid, _ts(day), 1, "a", 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = eq.QUERIES["w_decayed_counts"](spark, sf).collect()[0]
    assert row["weeks_span"] == 2
    assert int(row["decayed_num"]) == 5 * 1 + 3 * 2 + 2 * 4
    assert row["decayed_score"] == int(row["decayed_num"]) / 4.0

    # merge law: numerators computed on any day-split of the grid add up
    # to the whole-log numerator (the property a streaming/rollup path
    # relies on when it merges partial grids under one common 2^big_k).
    ev = eq.read(spark, sf, "events")
    halves = []
    for pred in (F.dayofmonth("ts") <= 7, F.dayofmonth("ts") > 7):
        daily = (
            ev.filter(pred)
            .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        part = 0
        for r in daily:
            k = (dt.date(2026, 1, 15) - r["day"].date()).days // 7
            part += r["cnt"] * 2 ** (row["weeks_span"] - k)
        halves.append(part)
    assert sum(halves) == int(row["decayed_num"])


def test_decay_cap_survives_wide_grids(spark, tmp_path):
    # The round-7 ADVICE overflow: a grid spanning >= 63 weeks made the
    # weight 2^(big_k-k) overflow BIGINT. The cap truncates the decay
    # window at 50 half-lives — a day 80 weeks old contributes 0, a day
    # 10 weeks old contributes cnt * 2^(50-10), the newest day cnt * 2^50,
    # and the numerator stays exact (DECIMAL, emitted as a string).
    base = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for weeks_old, n in ((80, 7), (10, 1), (0, 3)):
        for _ in range(n):
            rows.append(
                (eid, base - dt.timedelta(weeks=weeks_old), 1, "a", 1.0, "{}")
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    row = eq.QUERIES["w_decayed_counts"](spark, sf).collect()[0]
    assert row["weeks_span"] == 80
    assert int(row["decayed_num"]) == 3 * 2**50 + 1 * 2**40
    assert row["decayed_score"] == (3 * 2**50 + 2**40) / 2.0**50

    # the DuckDB oracle survives (and agrees on) the same wide grid —
    # the pre-fix CAST(POWER(2, 80) AS BIGINT) would have errored here
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet/*.parquet')"
    )
    o = con.execute(eq.ORACLES["w_decayed_counts"]).fetchone()
    assert o[1] == 80
    assert int(o[2]) == int(row["decayed_num"])
    assert o[3] == row["decayed_score"]


def test_cusum_telescoped_equals_recursive(spark):
    # The query computes S_t = P_t - min(0, min_{s<=t} P_s) with
    # P_t = n*prefix_t - t*total; the textbook recursive form is
    # S_t = max(0, S_{t-1} + n*x_t - total). Verify equality (and peak
    # placement) on a series with an injected level shift.
    import datetime

    from pyspark.sql import functions as F

    from pagopa_ecommerce_cdc_service_spark.plans.events_queries import (
        w_cusum_changepoint,
    )

    counts = [10, 11, 9, 10, 10, 30, 31, 29, 30, 30]  # shift at index 5
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(days=d), 1, "shift", 0.0, None))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        got = {
            r["day"].day: (r["cusum_num"], r["is_peak"])
            for r in w_cusum_changepoint(spark, tmp).collect()
        }
    n, total = len(counts), sum(counts)
    s_rec, expect = 0, {}
    for d, c in enumerate(counts):
        s_rec = max(0, s_rec + n * c - total)
        expect[d + 1] = s_rec
    assert {d: v[0] for d, v in got.items()} == expect
    # the peak lands at the END of the shifted regime (cumulative drift
    # keeps growing after the changepoint under k = global mean)
    peak_days = [d for d, v in got.items() if v[1]]
    assert peak_days == [max(expect, key=expect.get)]
