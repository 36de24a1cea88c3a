import datetime as dt

import numpy as np

from rust_timeseries_spark.operators import gapfill


def _mk(spark):
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        ("a", t0, 10.0),
        ("a", t0 + dt.timedelta(minutes=1), 20.0),
        # gap at minutes 2,3
        ("a", t0 + dt.timedelta(minutes=4), 50.0),
        ("b", t0 + dt.timedelta(minutes=10), 7.0),
        ("b", t0 + dt.timedelta(minutes=13), 1.0),
    ]
    return spark.createDataFrame(rows, "source string, bucket_ts timestamp, tok_sum double")


def test_spine_densifies_every_minute(spark):
    df = _mk(spark)
    dense = gapfill.densify(df, "1m").orderBy("source", "bucket_ts").collect()
    assert len(dense) == 5 + 4  # a: minutes 0..4, b: minutes 10..13
    nulls = [r for r in dense if r["tok_sum"] is None]
    assert len(nulls) == 4


def test_locf(spark):
    dense = gapfill.densify(_mk(spark), "1m")
    filled = gapfill.locf(dense, ["tok_sum"]).orderBy("source", "bucket_ts").collect()
    a_vals = [r["tok_sum"] for r in filled if r["source"] == "a"]
    assert a_vals == [10.0, 20.0, 20.0, 20.0, 50.0]
    b_vals = [r["tok_sum"] for r in filled if r["source"] == "b"]
    assert b_vals == [7.0, 7.0, 7.0, 1.0]


def test_linear_interpolation(spark):
    dense = gapfill.densify(_mk(spark), "1m")
    filled = gapfill.interpolate_linear(dense, ["tok_sum"]).orderBy("source", "bucket_ts").collect()
    a_vals = [r["tok_sum"] for r in filled if r["source"] == "a"]
    np.testing.assert_allclose(a_vals, [10.0, 20.0, 30.0, 40.0, 50.0], rtol=1e-12)
    b_vals = [r["tok_sum"] for r in filled if r["source"] == "b"]
    np.testing.assert_allclose(b_vals, [7.0, 5.0, 3.0, 1.0], rtol=1e-12)
