"""CheckpointHandle lifecycle: the backing RDD is captured at handle
creation (when the plan is a bare LogicalRDD) and released by that
reference — a release-time plan walk silently no-ops on plan-shape or
Spark-version changes (r3 ADVICE low)."""

from __future__ import annotations

from pushkind_crawlers_spark import caching


def _n_persistent(spark):
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_checkpoint_handle_releases_storage(spark):
    base = _n_persistent(spark)
    df = spark.range(100).localCheckpoint(eager=True)
    assert _n_persistent(spark) == base + 1
    h = caching.CheckpointHandle(df)
    assert h._jrdd is not None  # captured eagerly at creation
    h.unpersist()
    assert _n_persistent(spark) == base
    assert caching.FAILED_RELEASES == 0


def test_checkpoint_handle_capture_failure_is_observable(spark):
    """A frame whose RDD cannot be resolved must COUNT the failure (and
    warn), not silently leak."""
    import warnings

    before = caching.FAILED_RELEASES

    class Broken:
        @property
        def _jdf(self):
            raise RuntimeError("no jdf")

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        h = caching.CheckpointHandle(Broken())
    assert caching.FAILED_RELEASES == before + 1
    assert any("could not capture" in str(x.message) for x in w)
    h.unpersist()  # no-op, must not raise or double-count
    assert caching.FAILED_RELEASES == before + 1
    caching.FAILED_RELEASES = before  # restore for other assertions


def test_carry_checkpoint_release_drops_storage(spark):
    base = _n_persistent(spark)
    ckpt = spark.range(50).localCheckpoint(eager=True)
    child = ckpt.selectExpr("id * 2 AS x")
    child = caching.carry_checkpoint(child, ckpt)
    child.count()
    caching.release(child)
    assert _n_persistent(spark) == base
