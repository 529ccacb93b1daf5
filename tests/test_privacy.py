"""DP count release: mechanism shape, determinism, and the seed seam."""

import duckdb

from hiero_spark.functions.privacy import (
    discrete_laplace_cdf,
    dp_noisy_counts,
    dp_oracle_sql,
    truncated_mass,
)


def test_cdf_shape():
    cdf = discrete_laplace_cdf(0.5, 20)
    assert len(cdf) == 40
    assert all(0 < a < 1 for a in cdf)
    assert cdf == sorted(cdf)  # monotone
    # symmetric mechanism: CDF(-1) + CDF(0 exclusive-side) mirror around 1
    assert abs((1 - cdf[-1]) - cdf[0]) < 1e-12


def test_truncated_mass_is_small():
    assert truncated_mass(0.5, 20) < 1e-4
    assert truncated_mass(0.5, 5) > truncated_mass(0.5, 20)


def test_noise_bounded_and_deterministic(spark):
    rows = [(k, i) for k in range(50) for i in range(10 + k)]
    df = spark.createDataFrame(rows, ["g", "x"])
    a = {r["g"]: r["released"] for r in
         dp_noisy_counts(df, ["g"], "g").collect()}
    b = {r["g"]: r["released"] for r in
         dp_noisy_counts(df, ["g"], "g").collect()}
    assert a == b  # seeded: reproducible
    for k, rel in a.items():
        true = 10 + k
        assert abs(rel - true) <= 20  # truncation bound
    # the draw is not degenerate: several distinct noise values appear
    noises = {a[k] - (10 + k) for k in a}
    assert len(noises) >= 5
    # mean noise roughly centered (|mean| well under the bound)
    assert abs(sum(a[k] - (10 + k) for k in a) / len(a)) < 5


def test_seed_changes_the_draw(spark):
    df = spark.createDataFrame([(k, 0) for k in range(30)], ["g", "x"])
    a = {r["g"]: r["released"] for r in
         dp_noisy_counts(df, ["g"], "g", seed=0).collect()}
    b = {r["g"]: r["released"] for r in
         dp_noisy_counts(df, ["g"], "g", seed=7777).collect()}
    assert a != b  # the production secret-randomness seam is live


def test_oracle_sql_matches_spark(spark, tmp_path):
    """The generated DuckDB mirror computes the identical release —
    the bit-exactness claim the driver's hash compare relies on."""
    rows = [(k, i) for k in range(25) for i in range(3 * k + 1)]
    df = spark.createDataFrame(rows, ["g", "x"])
    p = str(tmp_path / "t.parquet")
    df.write.parquet(p)
    got = {r["g"]: r["released"] for r in
           dp_noisy_counts(spark.read.parquet(p), ["g"], "g").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}/*.parquet')")
    exp = dict(con.execute(dp_oracle_sql("t", ["g"], "g")).fetchall())
    assert got == {k: int(v) for k, v in exp.items()}


def test_negative_keys_draw_real_noise_and_match_oracle(spark, tmp_path):
    """Round-8 ADVICE: truncated % sent negative keys to u in (-1, 0),
    degenerating their noise to the constant -trunc while both engines
    agreed. pmod restores a real draw AND cross-engine equality."""
    rows = [(k, i) for k in range(-40, 0) for i in range(25)]
    df = spark.createDataFrame(rows, ["g", "x"])
    a = {r["g"]: r["released"] for r in
         dp_noisy_counts(df, ["g"], "g").collect()}
    noises = {a[k] - 25 for k in a}
    assert len(noises) >= 5, "negative keys still degenerate"
    assert noises != {-20}
    p = str(tmp_path / "neg.parquet")
    df.write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}/*.parquet')")
    exp = dict(con.execute(dp_oracle_sql("t", ["g"], "g")).fetchall())
    assert a == {k: int(v) for k, v in exp.items()}


def test_histogram_completes_the_domain(spark):
    """Empty domain buckets must appear and release 0+noise — absence
    is the leak the completion step closes."""
    from hiero_spark.functions.privacy import dp_noisy_histogram

    df = spark.createDataFrame([(1, 0)] * 4 + [(3, 0)], ["g", "x"])
    dom = spark.createDataFrame([(k,) for k in range(5)], ["g"])
    got = {r["g"]: r["released"] for r in
           dp_noisy_histogram(df, dom, "g").collect()}
    assert set(got) == {0, 1, 2, 3, 4}       # every domain value released
    for k in (0, 2, 4):                      # empty buckets: 0 + noise
        assert abs(got[k]) <= 20
    assert abs(got[1] - 4) <= 20 and abs(got[3] - 1) <= 20
