"""Top-k user journeys: path assembly order, the first-8 bound, and
deterministic tie-breaks."""

import datetime

from hiero_spark.queries.retrieval import ext_top_journeys

BASE = datetime.datetime(2024, 3, 1, tzinfo=datetime.timezone.utc)


def _events(spark, rows):
    """rows: (user_id, minute_offset, event_type)."""
    data = [
        (u, i, BASE + datetime.timedelta(minutes=m), et, 1.0)
        for i, (u, m, et) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "user_id long, event_id long, ts timestamp, event_type string,"
        " value double",
    )


def _run(spark, df, tmp_path):
    path = str(tmp_path / "ev")
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")
    # ext_top_journeys only reads events, so a dir with just events works
    return ext_top_journeys(spark, path)


def test_paths_ordered_by_time_and_bounded(spark, tmp_path):
    rows = (
        # user 1: 10 events; only the first 8 may appear in the path
        [(1, m, f"e{m}") for m in range(10)]
        # users 2-4: the same short journey
        + [(u, m, et) for u in (2, 3, 4) for m, et in [(0, "a"), (1, "b")]]
    )
    out = _run(spark, _events(spark, rows), tmp_path).collect()
    got = {r.path: r.n_users for r in out}
    assert got["a>b"] == 3
    assert got["e0>e1>e2>e3>e4>e5>e6>e7"] == 1  # e8, e9 cut off


def test_tie_break_is_path_ascending(spark, tmp_path):
    rows = [(1, 0, "x"), (2, 0, "y"), (3, 0, "z")]
    out = _run(spark, _events(spark, rows), tmp_path).collect()
    assert [r.path for r in out] == ["x", "y", "z"]  # equal counts -> path asc
