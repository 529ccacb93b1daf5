"""Rolling z-score anomalies: planted spike detected, self-masking
prevented (trailing frame excludes the current bucket), warm-up rows
abstain."""

from pyspark.sql import functions as F

from hiero_spark.operators.anomaly import rolling_zscore


def _series(spark, values):
    rows = [("k", i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, ["key", "bucket", "v"])


def test_planted_spike_flagged_and_warmup_abstains(spark):
    # stable baseline of 10±1, then a 100 spike at the end
    vals = [10, 11, 9, 10, 11, 9, 10, 11, 9, 10, 100]
    out = rolling_zscore(
        _series(spark, vals), "key", "bucket", "v", trailing=24, min_points=6
    ).orderBy("bucket").collect()
    # first min_points rows have no verdict
    assert all(r["zscore"] is None for r in out[:6])
    # the spike's z-score is huge and its baseline is uncontaminated
    spike = out[-1]
    assert spike["zscore"] > 3.0
    assert spike["baseline_mean"] < 11  # current bucket excluded from baseline
    # the stable rows in between are not flagged
    assert all(abs(r["zscore"]) < 3.0 for r in out[6:-1])


def test_zero_variance_abstains(spark):
    out = rolling_zscore(
        _series(spark, [5] * 10), "key", "bucket", "v", trailing=24, min_points=3
    ).collect()
    assert all(r["zscore"] is None for r in out)  # std 0 -> no verdict
