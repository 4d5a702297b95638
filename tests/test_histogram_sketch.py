"""Histogram sketch (operators/sketch.histogram_by +
quantiles_from_histogram): bin containment vs an exact quantile,
mergeability (finer sketches re-aggregate to the direct coarser one),
and negative-value floor binning."""

import math

from pyspark.sql import functions as F

from biocypher_metta_spark.operators.sketch import (
    histogram_by, quantiles_from_histogram)


def _quantile_rows(spark, values, width, qs):
    df = spark.createDataFrame([(v,) for v in values], "v long")
    hist = histogram_by(df, [], "v", width)  # no group: global sketch
    out = quantiles_from_histogram(hist.withColumn("g", F.lit(1)),
                                   ["g"], qs, width)
    return {r.q_permille: (r.q_lo, r.n_rows) for r in out.collect()}


def test_quantile_bin_contains_exact_quantile(spark):
    values = list(range(0, 1000, 7))      # 143 values
    width = 50
    got = _quantile_rows(spark, values, width, [500, 900, 990])
    s = sorted(values)
    for qp, (q_lo, n_rows) in got.items():
        assert n_rows == len(values)
        exact = s[math.ceil(qp * len(s) / 1000) - 1]
        assert q_lo <= exact < q_lo + width   # containment guarantee


def test_negative_values_floor_binning(spark):
    # -1 must land in bin -1 (floor), not bin 0 (truncation)
    got = _quantile_rows(spark, [-100, -1, 1, 100], 50, [500])
    (q_lo, n) = got[500]
    assert n == 4
    assert q_lo == -50                      # 2nd of 4 values is -1 -> bin -1

def test_histogram_merges_like_rollup(spark):
    rows = [("d1", v) for v in range(100)] + [("d2", v) for v in range(50, 150)]
    df = spark.createDataFrame(rows, "day string, v long")
    fine = histogram_by(df, ["day"], "v", 10)
    merged = (fine.groupBy("bin").agg(F.sum("n").cast("long").alias("n")))
    direct = histogram_by(df, [], "v", 10)
    assert (sorted((r.bin, r.n) for r in merged.collect())
            == sorted((r.bin, r.n) for r in direct.collect()))
