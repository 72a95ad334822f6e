"""Temporal join operators: as-of join tie-breaks, range-join bucket
boundaries, and the no-nested-loop plan contracts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pushkind_crawlers_spark.operators.temporal import asof_join, range_self_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_semantics_and_tiebreak(spark):
    left = spark.createDataFrame(
        [(10, 1, _ts(100), "a"), (11, 1, _ts(50), "b"),
         (12, 2, _ts(100), "c"), (13, 3, _ts(10), "d")],
        "event_id long, user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(100), 90),   # same-instant match counts (<=)
         (1, _ts(100), 91),   # tie on ts -> larger event_id wins
         (1, _ts(40), 80),
         (2, _ts(101), 95),   # after left -> never matches
         (2, _ts(90), 94)],
        "user_id long, ts timestamp, event_id long",
    )
    out = {r["event_id"]: r["event_id_asof"]
           for r in asof_join(left, right, "user_id", "ts", ["event_id"]).collect()}
    assert out == {10: 91, 11: 80, 12: 94, 13: None}


def test_asof_join_python_twin(spark):
    """Randomized parity vs a brute-force python twin."""
    import random

    rng = random.Random(7)
    lrows = [(i, rng.randint(1, 5), _ts(rng.randint(0, 500)), float(i))
             for i in range(80)]
    rrows = [(rng.randint(1, 5), _ts(rng.randint(0, 500)), 1000 + i)
             for i in range(120)]
    left = spark.createDataFrame(
        lrows, "event_id long, user_id long, ts timestamp, value double")
    right = spark.createDataFrame(
        rrows, "user_id long, ts timestamp, event_id long")
    got = {r["event_id"]: r["event_id_asof"]
           for r in asof_join(left, right, "user_id", "ts", ["event_id"]).collect()}
    for eid, uid, ts, _ in lrows:
        cands = [(rts, rid) for ruid, rts, rid in rrows
                 if ruid == uid and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[eid] == want, (eid, uid, ts)


def test_asof_join_multi_right_cols_one_coherent_row(spark):
    """All suffixed columns must come from the SAME winning right row —
    a per-column carry would fill a NULL secondary column from an
    earlier row (the r3 ADVICE hazard)."""
    left = spark.createDataFrame(
        [(10, 1, _ts(100))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(40), 80, "early"),          # older row, non-null note
         (1, _ts(90), 94, None)],            # winning row, NULL note
        "user_id long, ts timestamp, event_id long, note string",
    )
    row = asof_join(left, right, "user_id", "ts",
                    ["event_id", "note"]).collect()[0]
    assert row["event_id_asof"] == 94
    assert row["note_asof"] is None  # NOT "early" — no cross-row mixing


def test_asof_join_equal_time_multi_col_deterministic(spark):
    """Ties on (ts, right_cols[0]) resolve by the NEXT right col
    (lexicographic struct max), matching the SQL twin's full DESC
    ordering."""
    left = spark.createDataFrame(
        [(10, 1, _ts(100))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(90), 94, "a"), (1, _ts(90), 94, "b")],
        "user_id long, ts timestamp, event_id long, note string",
    )
    row = asof_join(left, right, "user_id", "ts",
                    ["event_id", "note"]).collect()[0]
    assert (row["event_id_asof"], row["note_asof"]) == (94, "b")


def test_range_self_join_negative_epoch_floor(spark):
    """Pre-1970 timestamps bucket by floor, not truncate-toward-zero:
    a pair straddling a negative bucket boundary must still be found."""
    rows = [(1, 1, dt.datetime(1969, 12, 31, 23, 59, 59)),
            (1, 2, dt.datetime(1970, 1, 1, 0, 0, 1))]  # gap 2s across epoch 0
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = sorted((r["id_a"], r["id_b"], r["gap_s"]) for r in
                 range_self_join(df, "user_id", "ts", "event_id",
                                 band_s=3600).collect())
    assert got == [(1, 2, 2)]


def test_range_self_join_bucket_boundary(spark):
    """Pairs that straddle a bucket boundary are found exactly once."""
    rows = [(1, 1, _ts(3599)), (1, 2, _ts(3601)),   # gap 2, crosses bucket
            (1, 3, _ts(7300)),                      # gap 3699 from id 2 -> out
            (2, 4, _ts(0)), (2, 5, _ts(3600))]      # gap exactly band_s -> in
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = sorted((r["id_a"], r["id_b"], r["gap_s"]) for r in
                 range_self_join(df, "user_id", "ts", "event_id",
                                 band_s=3600).collect())
    assert got == [(1, 2, 2), (4, 5, 3600)]


def test_temporal_plans_no_nested_loop(spark):
    """Both temporal queries keep key/bucket-joined shapes — a naive
    non-equi formulation would plan BroadcastNestedLoopJoin."""
    from pushkind_crawlers_spark.queries import QUERIES

    for name in ("asof_join_attribution", "range_join_events",
                 "sample_by_hash", "tfidf_top_terms"):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
