"""Unit tests for operators.statistics (bootstrap, per-group OLS)."""

from __future__ import annotations

import datetime as dt

from pagerank_hadoop_spark.operators.statistics import (
    group_ols_trend,
    poisson_bootstrap_mean,
)


def test_bootstrap_replicas_bracket_the_mean(spark):
    df = spark.createDataFrame(
        [(i, float(100 + (i % 7))) for i in range(400)], "k long, v double"
    )
    reps = poisson_bootstrap_mean(df, "k", "v", n_replicas=50).collect()
    assert len(reps) == 50
    means = [r.mean for r in reps]
    # all replica means stay inside the data range and vary
    assert all(100.0 <= m <= 106.0 for m in means)
    assert max(means) > min(means)


def test_bootstrap_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, v double"
    )
    a = sorted(
        (r.b, r.mean)
        for r in poisson_bootstrap_mean(df, "k", "v", n_replicas=20)
        .repartition(7)
        .collect()
    )
    b = sorted(
        (r.b, r.mean)
        for r in poisson_bootstrap_mean(df, "k", "v", n_replicas=20).collect()
    )
    assert a == b  # partitioning must not perturb replica means


def test_group_ols_recovers_planted_line(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(hours=h), 2.0 + 3.0 * h) for h in range(10)
    ] + [(2, t0 + dt.timedelta(hours=h), 5.0 - 0.5 * h) for h in range(4)]
    df = spark.createDataFrame(rows, "key long, ts timestamp, value double")
    got = {r.key: r for r in group_ols_trend(df, "key", "ts", "value").collect()}
    assert abs(got[1].slope - 3.0) < 1e-6 and abs(got[1].intercept - 2.0) < 1e-6
    assert abs(got[2].slope + 0.5) < 1e-6 and abs(got[2].intercept - 5.0) < 1e-6
    assert got[1].n == 10 and got[2].n == 4


def test_group_ols_drops_degenerate_groups(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, 1.0), (1, t0, 2.0), (2, t0, 1.0), (2, t0 + dt.timedelta(hours=1), 3.0)],
        "key long, ts timestamp, value double",
    )
    got = {r.key for r in group_ols_trend(df, "key", "ts", "value").collect()}
    assert got == {2}  # key 1 has zero time spread -> singular fit
