"""Tests for the temporal join operators (as-of, interval) and the
custom stateful streaming operator."""

import datetime

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import joins


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute, 0)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, 100, _ts(5)),
            (1, 101, _ts(10)),
            (2, 200, _ts(3)),
            (3, 300, _ts(1)),  # no quote yet
        ],
        "sym long, trade_id long, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (1, 9.0, _ts(4)),
            (1, 9.5, _ts(10)),  # same instant as trade 101 -> matches
            (2, 20.0, _ts(2)),
            (2, 21.0, _ts(4)),  # after trade 200 -> must not match
        ],
        "sym long, px double, ts timestamp",
    )
    return trades, quotes


def test_as_of_join_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade_id"]: r["asof_px"]
        for r in joins.as_of_join(
            trades, quotes, key="sym", right_cols=["px"]
        ).collect()
    }
    assert out[100] == 9.0  # latest quote at/before 00:05 is 00:04
    assert out[101] == 9.5  # same-instant quote matches (>= semantics)
    assert out[200] == 20.0  # 00:04 quote is in the future
    assert out[300] is None  # no preceding quote -> NULL


def test_as_of_join_keeps_left_rowcount(spark, trades_quotes):
    trades, quotes = trades_quotes
    assert joins.as_of_join(trades, quotes, key="sym", right_cols=["px"]).count() == 4


def test_interval_join_and_bucketized_agree(spark):
    events = spark.createDataFrame(
        [(i, _ts(i)) for i in range(0, 50)], "event_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (1, _ts(5), _ts(10)),  # events 5..9
            (2, _ts(8), _ts(12)),  # events 8..11 (overlaps window 1)
            (3, _ts(40), _ts(41)),  # event 40
        ],
        "window_id long, start timestamp, end timestamp",
    )
    got = {
        (r["window_id"], r["event_id"])
        for r in joins.interval_join(events, intervals).collect()
    }
    expected = (
        {(1, i) for i in range(5, 10)}
        | {(2, i) for i in range(8, 12)}
        | {(3, 40)}
    )
    assert got == expected
    got_bucketized = {
        (r["window_id"], r["event_id"])
        for r in joins.bucketized_interval_join(events, intervals).collect()
    }
    assert got_bucketized == expected


def test_stateful_running_totals_equals_batch(spark, sf_dir):
    from lineage_store_database_management_system_spark.streaming import (
        read_events_stream,
        run_stream_once,
    )
    from lineage_store_database_management_system_spark.streaming.stateful import (
        running_user_totals,
    )

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in run_stream_once(
            running_user_totals(stream), output_mode="update"
        ).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exp = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias("s"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for uid, (n, s) in exp.items():
        assert got[uid][0] == n
        assert got[uid][1] == pytest.approx(s, abs=0.02)


def test_bpe_token_count(spark):
    from lineage_store_database_management_system_spark.functions.text import (
        bpe_token_count,
    )

    df = spark.createDataFrame(
        [(1, "hello world 42 !?"), (2, ""), (3, "a1b2")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count(F.col("text")).alias("n")
        ).collect()
    }
    # hello|world|42|!|? = 5 ; '' = 0 ; a|1|b|2 = 4
    assert got == {1: 5, 2: 0, 3: 4}


def test_cosine_pairs_exact_symmetric_threshold(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.01]),  # ~parallel to 1
            (3, [0.0, 1.0]),  # orthogonal
        ],
        "vec_id long, embedding array<float>",
    )
    from lineage_store_database_management_system_spark.operators.similarity import (
        cosine_pairs_exact,
    )

    pairs = {(r["id_a"], r["id_b"]) for r in cosine_pairs_exact(emb, 0.9).collect()}
    assert pairs == {(1, 2)}


def test_bucketized_interval_join_coarse_buckets(spark):
    """Buckets coarser (and finer) than one day must not drop matches:
    both sides floor to the same arithmetic bucket width (regression:
    the event side was truncated to calendar days regardless of the
    configured bucket)."""
    import datetime

    def day(d, h=0):
        return datetime.datetime(2024, 3, d, h, 0, 0)

    events = spark.createDataFrame(
        [(i, day(i % 27 + 1, i % 24)) for i in range(200)],
        "event_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (1, day(2, 6), day(5, 18)),
            (2, day(10, 0), day(10, 23)),
            (3, day(20, 12), day(26, 3)),
        ],
        "window_id long, start timestamp, end timestamp",
    )
    expected = {
        (r["window_id"], r["event_id"])
        for r in joins.interval_join(events, intervals).collect()
    }
    for bucket in ["6 hours", "1 day", "2 days", "1 week"]:
        got = {
            (r["window_id"], r["event_id"])
            for r in joins.bucketized_interval_join(
                events, intervals, bucket=bucket
            ).collect()
        }
        assert got == expected, f"bucket={bucket}"
    with pytest.raises(ValueError):
        joins.bucketized_interval_join(events, intervals, bucket="1 fortnight")


def test_as_of_join_right_tiebreak_deterministic(spark):
    """Several right rows at one instant: right_tiebreak makes the
    carried value the max-tiebreak row, stable under repartitioning."""
    trades = spark.createDataFrame(
        [(1, 100, _ts(5))], "sym long, trade_id long, ts timestamp"
    )
    quotes = spark.createDataFrame(
        [(1, 9.0, 1, _ts(5)), (1, 9.5, 2, _ts(5)), (1, 8.0, 3, _ts(5))],
        "sym long, px double, qid long, ts timestamp",
    )
    for n in (1, 7):
        out = joins.as_of_join(
            trades,
            quotes.repartition(n),
            key="sym",
            right_cols=["px"],
            right_tiebreak="qid",
        ).collect()
        assert out[0]["asof_px"] == 8.0  # qid=3 wins every time
