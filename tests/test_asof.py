"""asof_join semantics on a hand-built tape: backward/forward direction,
equal-timestamp visibility, tolerance, and no-match NULLs."""

from __future__ import annotations

from datetime import datetime

from duckdb_fastlanes_spark.functions.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_forward_and_tolerance(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:05:00"), 101.0),
            ("B", _ts("2024-01-01 10:02:00"), 50.0),
        ],
        "sym string, qts timestamp, price double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:03:00")),  # -> 100.0 (backward)
            ("A", _ts("2024-01-01 10:05:00")),  # -> 101.0 (tick at t visible)
            ("B", _ts("2024-01-01 10:01:00")),  # -> None backward, 50.0 forward
            ("C", _ts("2024-01-01 10:00:00")),  # -> no quotes at all
        ],
        "sym string, tts timestamp",
    )

    back = {
        (r.sym, r.tts): r.price_asof
        for r in asof_join(
            trades, quotes, by=["sym"], left_ts="tts", right_ts="qts",
            value_cols=["price"],
        ).collect()
    }
    assert back[("A", _ts("2024-01-01 10:03:00"))] == 100.0
    assert back[("A", _ts("2024-01-01 10:05:00"))] == 101.0
    assert back[("B", _ts("2024-01-01 10:01:00"))] is None
    assert back[("C", _ts("2024-01-01 10:00:00"))] is None

    fwd = {
        (r.sym, r.tts): r.price_asof
        for r in asof_join(
            trades, quotes, by=["sym"], left_ts="tts", right_ts="qts",
            value_cols=["price"], direction="forward",
        ).collect()
    }
    assert fwd[("A", _ts("2024-01-01 10:03:00"))] == 101.0
    assert fwd[("B", _ts("2024-01-01 10:01:00"))] == 50.0

    # tolerance: backward match at 10:03 is 180s stale; 60s tolerance nulls it
    tol = {
        (r.sym, r.tts): r.price_asof
        for r in asof_join(
            trades, quotes, by=["sym"], left_ts="tts", right_ts="qts",
            value_cols=["price"], tolerance_seconds=60,
        ).collect()
    }
    assert tol[("A", _ts("2024-01-01 10:03:00"))] is None
    assert tol[("A", _ts("2024-01-01 10:05:00"))] == 101.0
