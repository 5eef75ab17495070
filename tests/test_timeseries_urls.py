"""Unit tests for operators.timeseries and functions.urls."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pagerank_hadoop_spark.functions.urls import canonical
from pagerank_hadoop_spark.operators.timeseries import resample_linear


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), v, i)
            for i, (k, s, v) in enumerate(rows)
        ],
        "key long, ts timestamp, value double, event_id long",
    )


def test_resample_linear_midpoint(spark):
    # obs at t=0s (v=0) and t=20s (v=10); 10s grid -> midpoint v=5
    ev = _ev(spark, [(1, 0, 0.0), (1, 20, 10.0)])
    out = {
        r.grid_us: r.value
        for r in resample_linear(
            ev, "key", "ts", "value", "event_id", bucket_us=10_000_000
        ).collect()
    }
    base = int(dt.datetime(2024, 1, 1).timestamp() * 1e6)
    assert out[base] == 0.0
    assert out[base + 10_000_000] == 5.0
    assert out[base + 20_000_000] == 10.0


def test_resample_linear_exact_observation_passes_through(spark):
    ev = _ev(spark, [(1, 0, 3.0), (1, 10, 7.0), (1, 25, 1.0)])
    out = {
        r.grid_us: r.value
        for r in resample_linear(
            ev, "key", "ts", "value", "event_id", bucket_us=10_000_000
        ).collect()
    }
    base = int(dt.datetime(2024, 1, 1).timestamp() * 1e6)
    assert out[base + 10_000_000] == 7.0  # exact obs, no interpolation
    # t=20s sits between (10s, 7.0) and (25s, 1.0): 7 + (1-7)*(10/15)
    assert abs(out[base + 20_000_000] - 3.0) < 1e-9


def test_resample_linear_dup_ts_takes_min_tiebreak(spark):
    # two values at t=0: event_id 0 wins (v=2.0)
    ev = _ev(spark, [(1, 0, 2.0), (1, 0, 9.0), (1, 10, 2.0)])
    out = resample_linear(
        ev, "key", "ts", "value", "event_id", bucket_us=10_000_000
    ).collect()
    assert all(r.value == 2.0 for r in out)


def test_resample_no_extrapolation_and_short_series(spark):
    # single obs not on a grid point -> empty grid, no rows
    ev = _ev(spark, [(1, 5, 4.0)])
    assert (
        resample_linear(
            ev, "key", "ts", "value", "event_id", bucket_us=10_000_000
        ).count()
        == 0
    )


def test_url_canonical_folds_variants(spark):
    urls = [
        "HTTPS://WWW.News.Example.COM:443/a/b/?b=2&utm_source=x&a=1#top",
        "https://news.example.com/a/b?a=1&b=2&gclid=zz",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.c for r in df.select(canonical(F.col("url")).alias("c")).collect()]
    assert got[0] == got[1] == "https://news.example.com/a/b?a=1&b=2"


def test_url_canonical_keeps_non_default_port_and_root_path(spark):
    df = spark.createDataFrame(
        [("http://Example.com:8080",), ("http://example.com:80/",)],
        "url string",
    )
    got = [r.c for r in df.select(canonical(F.col("url")).alias("c")).collect()]
    assert got[0] == "http://example.com:8080/"
    assert got[1] == "http://example.com/"
