"""Incremental DAG tests — the reference's dirty-detection contract
(etl/steps/__init__.py:419-466; tests/test_steps.py:56-131):
topological order, skip-clean, dirty-propagation on code/version/data
change, exactly-once rerun after mid-step failure."""

import pytest
from pyspark.sql import functions as F

from etl_spark.dag import Pipeline, Step


def build(spark, root, bump="1", fail_garden=False):
    p = Pipeline(spark, str(root))

    @p.step("meadow", version="1", keys=["k"])
    def meadow(s, load):
        return s.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))

    @p.step("garden", deps=["meadow"], version=bump, keys=["k"])
    def garden(s, load):
        if fail_garden:
            raise RuntimeError("boom")
        return load("meadow").withColumn("v", F.col("v") + 1)

    @p.step("grapher", deps=["garden"], version="1", keys=["k"])
    def grapher(s, load):
        return load("garden").filter(F.col("v") % 2 == 1)

    return p


def test_first_run_runs_all_then_skips(spark, tmp_path):
    p = build(spark, tmp_path)
    assert p.run() == {"meadow": "ran", "garden": "ran", "grapher": "ran"}
    # clean rerun is a complete no-op
    assert p.run() == {"meadow": "skipped", "garden": "skipped", "grapher": "skipped"}
    assert p.load("grapher").count() == 10


def test_version_bump_with_early_cutoff(spark, tmp_path):
    """A version bump reruns the step itself; dependents rerun ONLY if
    the output content actually changed (early cutoff — stronger than
    the reference, whose input-checksum chaining reruns the whole
    downstream subgraph even for byte-identical outputs)."""
    p = build(spark, tmp_path)
    p.run()
    p2 = build(spark, tmp_path, bump="2")
    assert p2.run() == {"meadow": "skipped", "garden": "ran", "grapher": "skipped"}

    # now a change that DOES alter garden's output -> grapher reruns
    p3 = build_changed_garden(spark, tmp_path)
    assert p3.run() == {"meadow": "skipped", "garden": "ran", "grapher": "ran"}


def build_changed_garden(spark, root):
    """Same meadow/grapher SOURCE TEXT as build() (code checksums match
    -> clean); garden computes different values."""
    p = Pipeline(spark, str(root))

    @p.step("meadow", version="1", keys=["k"])
    def meadow(s, load):
        return s.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))

    @p.step("garden", deps=["meadow"], version="3", keys=["k"])
    def garden(s, load):
        return load("meadow").withColumn("v", F.col("v") + 2)

    @p.step("grapher", deps=["garden"], version="1", keys=["k"])
    def grapher(s, load):
        return load("garden").filter(F.col("v") % 2 == 1)

    return p


def test_output_checksum_stable_under_copy(spark, tmp_path):
    """Re-running a step that produces identical data leaves
    dependents clean (checksum is content-based, not run-based)."""
    p = build(spark, tmp_path)
    p.run()
    before = p.output_checksum("meadow")
    p.run(force=True, only=["meadow"])
    assert p.output_checksum("meadow") == before
    # dependents stay clean because the OUTPUT checksum didn't change
    assert p.run() == {"meadow": "skipped", "garden": "skipped", "grapher": "skipped"}


def test_failure_leaves_step_dirty(spark, tmp_path):
    p = build(spark, tmp_path)
    p.run(only=["meadow"])
    bad = build(spark, tmp_path, fail_garden=True)
    with pytest.raises(RuntimeError):
        bad.run()
    # garden never committed its checksum -> still dirty -> reruns
    good = build(spark, tmp_path)
    out = good.run()
    assert out["garden"] == "ran" and out["meadow"] == "skipped"


def test_only_selection_pulls_transitive_deps(spark, tmp_path):
    p = build(spark, tmp_path)
    out = p.run(only=["garden"])
    assert set(out) == {"meadow", "garden"}


def test_add_step_object(spark, tmp_path):
    p = Pipeline(spark, str(tmp_path))
    p.add(Step("a", lambda s, load: s.range(3).select(F.col("id").alias("k")), keys=["k"]))
    assert p.run() == {"a": "ran"}
    assert p.load("a").count() == 3


def test_downstream_selection(spark, tmp_path):
    """--downstream semantics (etl/steps/__init__.py:87-110): selecting
    a step with downstream=True also runs its dependents (and their
    transitive deps), but not unrelated steps."""
    p = Pipeline(spark, str(tmp_path / "dag"))

    @p.step("a")
    def a(spark, load):
        return spark.createDataFrame([(1,)], "x long")

    @p.step("b", deps=["a"])
    def b(spark, load):
        return load("a")

    @p.step("c", deps=["b"])
    def c(spark, load):
        return load("b")

    @p.step("z")
    def z(spark, load):
        return spark.createDataFrame([(9,)], "x long")

    assert p.topological_order(["a"], downstream=True) == ["a", "b", "c"]
    assert p.topological_order(["b"]) == ["a", "b"]
    got = p.run(only=["a"], downstream=True)
    assert set(got) == {"a", "b", "c"}


def test_epoch_salt_forces_full_rebuild(spark, tmp_path):
    """Bumping the pipeline epoch (the reference's ETL_EPOCH,
    etl/config.py:106) dirties every step without code changes."""
    p = Pipeline(spark, str(tmp_path / "dag"), epoch="1")

    @p.step("a")
    def a(spark, load):
        return spark.createDataFrame([(1,)], "x long")

    assert p.run() == {"a": "ran"}
    assert p.run() == {"a": "skipped"}
    p.epoch = "2"
    assert p.run() == {"a": "ran"}


def test_watch_mode_reruns_on_mtime_change(spark, tmp_path):
    """--watch (etl/command.py:137-138): the loop reruns when a watched
    file's mtime changes; a changed-but-irrelevant file still triggers
    a DAG pass but every step skips clean."""
    import os
    import threading
    import time

    p = Pipeline(spark, str(tmp_path / "dag"))

    runs_log = []

    @p.step("a")
    def a(spark, load):
        return spark.createDataFrame([(1,)], "x long")

    watched = tmp_path / "watched.txt"
    watched.write_text("v1")

    def mutate():
        time.sleep(1.5)
        watched.write_text("v2")
        os.utime(watched, (time.time() + 5, time.time() + 5))

    t = threading.Thread(target=mutate)
    t.start()
    runs = p.watch([str(watched)], interval_s=0.5, max_iterations=6,
                   on_run=lambda n: runs_log.append(n))
    t.join()
    assert runs >= 2  # initial pass + at least one change-triggered pass
    # the change-triggered pass skipped the clean step
    assert p.run() == {"a": "skipped"}


def test_private_steps_validated_and_filtered(spark, tmp_path):
    """Private-dataset semantics (etl/command.py:326-338): a public
    step depending on a private one is rejected before anything runs;
    private steps may depend on anything; private=False excludes
    private steps from the run; is_public lands in the sidecar."""
    from etl_spark.sources.files import read_meta

    p = Pipeline(spark, str(tmp_path))

    @p.step("open_src")
    def open_src(s, load):
        return s.range(3).select(F.col("id").alias("k"))

    @p.step("secret", deps=["open_src"], is_public=False)
    def secret(s, load):
        return load("open_src").withColumn("v", F.col("k") * 10)

    @p.step("secret_derived", deps=["secret"], is_public=False)
    def secret_derived(s, load):
        return load("secret").filter(F.col("v") > 0)

    # valid DAG: private->private and private->public edges only
    out = p.run()
    assert out == {"open_src": "ran", "secret": "ran", "secret_derived": "ran"}
    assert read_meta(p._path("secret"))["is_public"] is False
    assert read_meta(p._path("open_src"))["is_public"] is True

    # private=False runs only the public subgraph
    p2 = Pipeline(spark, str(tmp_path / "pub_only"))
    p2.add(p.steps["open_src"])
    p2.add(p.steps["secret"])
    assert p2.run(private=False) == {"open_src": "ran"}

    # a public step leaning on a private dependency is rejected loudly
    @p.step("leak", deps=["secret"])
    def leak(s, load):
        return load("secret")

    with pytest.raises(ValueError, match="public step 'leak' depends on private 'secret'"):
        p.run()
    with pytest.raises(ValueError):
        p.validate_private()
