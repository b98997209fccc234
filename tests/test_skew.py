from __future__ import annotations

from pyspark.sql import functions as F

from polars_trading_spark.plans.skew import salted_two_phase_agg, with_salt


def test_salted_two_phase_agg_equals_direct(spark):
    rows = [("HOT", i, float(i % 97)) for i in range(5000)] + [
        ("COLD", i, float(i)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "sym string, seq long, v double")
    direct = {
        (r["sym"]): (r["s"], r["n"], r["mx"])
        for r in df.groupBy("sym")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["sym"]): (r["s"], r["n"], r["mx"])
        for r in salted_two_phase_agg(
            df,
            ["sym"],
            [F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pn"), F.max("v").alias("pmx")],
            [F.sum("ps").alias("s"), F.sum("pn").alias("n"), F.max("pmx").alias("mx")],
            buckets=8,
        ).collect()
    }
    assert salted.keys() == direct.keys()
    for k in direct:
        assert salted[k][1] == direct[k][1]
        assert salted[k][2] == direct[k][2]
        assert abs(salted[k][0] - direct[k][0]) < 1e-6


def test_salt_spreads_rows(spark):
    df = spark.createDataFrame([("HOT", i) for i in range(1000)], "sym string, seq long")
    n_buckets = with_salt(df, buckets=8).select("__pts_salt").distinct().count()
    assert n_buckets > 1
