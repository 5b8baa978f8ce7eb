"""Mergeable log-histogram quantile sketch (operators/quantile.py)
and its rollup integration (rollup_quantiles / patch_rollup)."""

import math
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import (
    quantile,
    rollup,
)

ALPHA = 0.01


@pytest.fixture(scope="module")
def values_df(spark):
    # deterministic mix: negatives, zero, sub-unity, wide magnitudes
    vals = []
    for i in range(1, 2001):
        vals.append(("a", ((i * 2654435761) % 100000) / 7.0))
    for i in range(1, 301):
        vals.append(("b", -((i * 40503) % 5000) / 11.0))
    vals += [("b", 0.0), ("b", 0.0), ("b", 1e-6), ("b", 4.2e7)]
    return spark.createDataFrame(vals, "g string, v double")


def _exact_discrete(rows, q):
    """rank = max(1, ceil(q*N)) -th smallest — the sketch's contract."""
    s = sorted(rows)
    r = max(1, math.ceil(q * len(s)))
    return s[r - 1]


def test_relative_error_guarantee(spark, values_df):
    sk = quantile.quantile_sketch(values_df, ["g"], "v", ALPHA)
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 1.0]
    got = {
        (r.g, r.q): r.quantile_est
        for r in quantile.sketch_quantiles(sk, ["g"], qs, ALPHA).collect()
    }
    data = {
        g: [r.v for r in values_df.where(F.col("g") == g).collect()]
        for g in ("a", "b")
    }
    assert len(got) == 2 * len(qs)
    for (g, q), est in got.items():
        exact = _exact_discrete(data[g], q)
        assert abs(est - exact) <= ALPHA * abs(exact) + 1e-12, (g, q, est, exact)


def test_zero_and_sign_buckets(spark):
    df = spark.createDataFrame(
        [("k", -10.0), ("k", 0.0), ("k", 0.0), ("k", 10.0)], "g string, v double"
    )
    sk = quantile.quantile_sketch(df, ["g"], "v", ALPHA)
    got = {
        r.q: r.quantile_est
        for r in quantile.sketch_quantiles(
            sk, ["g"], [0.25, 0.5, 0.75, 1.0], ALPHA
        ).collect()
    }
    assert abs(got[0.25] + 10.0) <= ALPHA * 10 + 1e-12
    assert got[0.5] == 0.0 and got[0.75] == 0.0
    assert abs(got[1.0] - 10.0) <= ALPHA * 10 + 1e-12


def test_merge_equals_whole(spark, values_df):
    whole = quantile.quantile_sketch(values_df, ["g"], "v", ALPHA)
    parts = [
        quantile.quantile_sketch(
            values_df.where(F.pmod(F.xxhash64("v"), F.lit(3)) == i),
            ["g"],
            "v",
            ALPHA,
        )
        for i in range(3)
    ]
    merged = quantile.merge_quantile_sketches(parts, ["g"])
    a = {(r.g, r._qtag, r._qidx): r._qcnt for r in whole.collect()}
    b = {(r.g, r._qtag, r._qidx): r._qcnt for r in merged.collect()}
    assert a == b


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def test_rollup_quantiles_realtime(spark, events):
    rdir = os.path.join(tempfile.mkdtemp(prefix="lss_rollup_q_"), "hourly")
    try:
        rollup.create_rollup(
            events, rdir, "2024-01-10 00:00:00", quantile_col="value"
        )
        rollup.refresh_rollup(events, rdir, "2024-01-20 00:00:00")
        got = {
            (r.bucket, r.q): r.quantile_est
            for r in rollup.rollup_quantiles(
                spark, rdir, events, [0.5, 0.95]
            ).collect()
        }
        # oracle: sketch the raw events directly (no rollup) — the
        # sealed+tail merge must be IDENTICAL state, hence identical
        # estimates
        direct = quantile.quantile_sketch(
            events.withColumn("bucket", F.date_trunc("hour", "ts")),
            ["bucket"],
            "value",
            ALPHA,
        )
        want = {
            (r.bucket, r.q): r.quantile_est
            for r in quantile.sketch_quantiles(
                direct, ["bucket"], [0.5, 0.95], ALPHA
            ).collect()
        }
        assert got == want
        # and within alpha of the exact per-bucket order statistic
        sample = sorted(want)[::7][:20]
        raw = {
            b: [r.value for r in events.where(F.date_trunc("hour", "ts") == b).collect()]
            for b in {b for b, _ in sample}
        }
        for b, q in sample:
            exact = _exact_discrete(raw[b], q)
            assert abs(want[(b, q)] - exact) <= ALPHA * abs(exact) + 1e-12
    finally:
        shutil.rmtree(os.path.dirname(rdir), ignore_errors=True)


def test_rollup_quantiles_regroup_and_patch(spark, events):
    rdir = os.path.join(tempfile.mkdtemp(prefix="lss_rollup_qp_"), "hourly")
    try:
        late_cut = "2024-01-12 00:00:00"
        seal = "2024-01-15 00:00:00"
        head = events.where(F.col("ts") >= F.lit(late_cut))
        rollup.create_rollup(head, rdir, seal, quantile_col="value")
        # daily regroup from hourly state: merge the hourly histograms
        # under a day key — no raw-data access for sealed history
        state = rollup.rollup_quantile_state(spark, rdir, head).withColumn(
            "day", F.to_date("bucket")
        )
        daily_sk = quantile.merge_quantile_sketches([state.drop("bucket")], ["day"])
        got_daily = {
            (r.day, r.q): r.quantile_est
            for r in quantile.sketch_quantiles(
                daily_sk, ["day"], [0.5], ALPHA
            ).collect()
        }
        want_daily_sk = quantile.quantile_sketch(
            head.withColumn("day", F.to_date("ts")), ["day"], "value", ALPHA
        )
        want_daily = {
            (r.day, r.q): r.quantile_est
            for r in quantile.sketch_quantiles(
                want_daily_sk, ["day"], [0.5], ALPHA
            ).collect()
        }
        assert got_daily == want_daily and len(got_daily) > 0
        # late data arrives behind the seal: patch the hole
        rng = rollup.late_arrival_range(
            events.where(F.col("ts") < F.lit(late_cut)), rdir
        )
        assert rng is not None and rng[1] == seal
        rollup.patch_rollup(events, rdir, rng[0], rng[1])
        got = {
            (r.bucket, r.q): r.quantile_est
            for r in rollup.rollup_quantiles(
                spark, rdir, events, [0.5, 0.9]
            ).collect()
        }
        direct = quantile.quantile_sketch(
            events.withColumn("bucket", F.date_trunc("hour", "ts")),
            ["bucket"],
            "value",
            ALPHA,
        )
        want = {
            (r.bucket, r.q): r.quantile_est
            for r in quantile.sketch_quantiles(
                direct, ["bucket"], [0.5, 0.9], ALPHA
            ).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(os.path.dirname(rdir), ignore_errors=True)


def test_stream_maintained_quantiles(spark, sf_dir, events, tmp_path):
    from lineage_store_database_management_system_spark.streaming import (
        read_events_stream,
    )

    path = os.path.join(sf_dir, "events.parquet")
    rdir = os.path.join(str(tmp_path), "r")
    stream = read_events_stream(spark, path, max_files_per_trigger=1)
    n = rollup.stream_maintain_rollup(stream, rdir, quantile_col="value")
    assert n >= 1
    got = {
        (r.bucket, r.q): r.quantile_est
        for r in rollup.streaming_rollup_quantiles(
            spark, rdir, [0.5, 0.95]
        ).collect()
    }
    direct = quantile.quantile_sketch(
        events.withColumn("bucket", F.date_trunc("hour", "ts")),
        ["bucket"],
        "value",
        ALPHA,
    )
    want = {
        (r.bucket, r.q): r.quantile_est
        for r in quantile.sketch_quantiles(
            direct, ["bucket"], [0.5, 0.95], ALPHA
        ).collect()
    }
    # micro-batch partial sketches merge to EXACTLY the whole-data
    # sketch — histogram counts are associative
    assert got == want


def test_randomized_guarantee_sweep(spark):
    """Seeded randomized sweep across magnitudes, signs, zeros, and
    duplicates: the alpha relative-error bound must hold for every
    (distribution, q) pair — the sketch's whole contract."""
    import random

    qs = [0.0, 0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99, 1.0]
    for seed in (7, 23, 99):
        rng = random.Random(seed)
        vals = []
        for _ in range(800):
            mag = 10 ** rng.uniform(-6, 8)
            vals.append(rng.choice([1, -1]) * mag)
        vals += [0.0] * rng.randint(1, 20)
        vals += [vals[0]] * rng.randint(1, 30)  # heavy duplicate
        df = spark.createDataFrame([(v,) for v in vals], "v double").withColumn(
            "g", F.lit("x")
        )
        sk = quantile.quantile_sketch(df, ["g"], "v", ALPHA)
        got = {
            r.q: r.quantile_est
            for r in quantile.sketch_quantiles(sk, ["g"], qs, ALPHA).collect()
        }
        assert len(got) == len(qs)
        for q in qs:
            exact = _exact_discrete(vals, q)
            assert abs(got[q] - exact) <= ALPHA * abs(exact) + 1e-12, (
                seed, q, got[q], exact,
            )
