"""Property-based test: for ANY event stream (random ops, keys, seq
order, batch splits), CDC replay through the lake table equals the
trivial pandas latest-wins reduction.

Hypothesis drives the stream shapes the deterministic generator can't:
adversarial seq orders, multi-delete chains, re-inserts, single-key
floods, empty batches, duplicated deliveries.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_spark.lake.table import LakeTable

KEYS = ["k0", "k1", "k2", "k3"]

event = st.tuples(
    st.sampled_from(KEYS),                       # path (repo fixed)
    st.sampled_from(["insert", "update", "delete"]),
    st.text(alphabet="abc", min_size=0, max_size=5),  # content seed
)
streams = st.lists(event, min_size=1, max_size=25)
splits = st.integers(min_value=1, max_value=4)


def pandas_oracle(rows):
    pdf = pd.DataFrame(rows, columns=["path", "op", "content", "seq"])
    last = pdf.sort_values("seq").drop_duplicates("path", keep="last")
    live = last[last["op"] != "delete"]
    return {r.path: r.content for r in live.itertuples()}


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(stream=streams, n_batches=splits, dup_last_batch=st.booleans())
def test_replay_equals_pandas_oracle(spark, tmp_path_factory, stream, n_batches, dup_last_batch):
    rows = [
        (path, op, None if op == "delete" else f"c:{seed}:{i}", i)
        for i, (path, op, seed) in enumerate(stream)
    ]
    root = str(tmp_path_factory.mktemp("prop") / "t")
    t = LakeTable.create(
        spark, root,
        spark.createDataFrame([], "repo string, path string, content string").schema,
        ["repo", "path"], n_buckets=2,
    )
    step = max(len(rows) // n_batches, 1)
    batches = [rows[i:i + step] for i in range(0, len(rows), step)]
    if dup_last_batch:
        batches.append(batches[-1])  # at-least-once delivery of the tail
    for ep, chunk in enumerate(batches):
        src = spark.createDataFrame(
            [("r", p, c, o, s) for (p, o, c, s) in chunk],
            "repo string, path string, content string, op string, seq long",
        )
        # NOTE: duplicate batch gets a NEW epoch id on purpose — the
        # merge itself must be idempotent on content, not only fenced
        t.merge_cdc(src, epoch=ep)
    got = {r["path"]: r["content"] for r in t.read().collect()}
    assert got == pandas_oracle(rows)


# ---------------------------------------------------------------------------
# adversarial OPERATION sequences: interleave merges with schema adds,
# renames, compaction, rebucketing and maintenance — the final state
# must always equal the pandas shadow model regardless of the order or
# combination of lifecycle operations.
# ---------------------------------------------------------------------------

ops_stream = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), st.lists(event, min_size=1, max_size=6)),
        st.tuples(st.just("merge_evolved"), st.lists(event, min_size=1, max_size=6)),
        st.just(("rename",)),
        st.just(("compact",)),
        st.just(("rebucket",)),
        st.just(("purge",)),
    ),
    min_size=2,
    max_size=8,
)


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(plan=ops_stream, mor=st.booleans())
def test_lifecycle_ops_never_change_state(spark, tmp_path_factory, plan, mor):
    """Any interleaving of merges (with mid-stream column adds),
    renames, compaction, rebucketing and tombstone purges yields
    exactly the shadow model's latest-wins state, in COW and MOR."""
    root = str(tmp_path_factory.mktemp("prop2") / "t")
    t = LakeTable.create(
        spark, root,
        spark.createDataFrame([], "repo string, path string, content string").schema,
        ["repo", "path"], n_buckets=2, write_mode="mor" if mor else "cow",
    )
    rows = []
    seq = 0
    content_col = "content"  # tracks renames
    renamed = False
    epoch = 0
    for step_op in plan:
        kind = step_op[0]
        if kind in ("merge", "merge_evolved"):
            chunk = []
            for path, op, seed in step_op[1]:
                chunk.append((path, op, None if op == "delete" else f"c:{seed}:{seq}", seq))
                seq += 1
            rows.extend(chunk)
            src = spark.createDataFrame(
                [("r", p, c, o, s) for (p, o, c, s) in chunk],
                f"repo string, path string, {content_col} string, op string, seq long",
            )
            if kind == "merge_evolved":
                from pyspark.sql import functions as F

                src = src.withColumn("extra", F.length(F.coalesce(F.col(content_col), F.lit(""))))
            t.merge_cdc(src, epoch=epoch)
            epoch += 1
        elif kind == "rename" and not renamed:
            t.rename_column(content_col, "body")
            content_col, renamed = "body", True
        elif kind == "compact":
            t.compact()
        elif kind == "rebucket":
            t.rebucket(4)
        elif kind == "purge":
            t.purge_tombstones(seq)
    expect = pandas_oracle(rows)
    got = {r["path"]: r[content_col] for r in t.read().collect()}
    assert got == expect


# ---------------------------------------------------------------------------
# publish/restore property: for ANY pair of divergent states reachable
# from a shared base (prod keeps merging, a clone takes a different
# batch), merge_from(clone) must land prod EXACTLY on the clone's
# pandas-oracle state — whatever keys were changed, deleted, created
# or left alone on either side.
# ---------------------------------------------------------------------------


@pytest.mark.filterwarnings("ignore")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(base=streams, cur_extra=streams, target_extra=streams)
def test_merge_from_reaches_any_target_state(
    spark, tmp_path_factory, base, cur_extra, target_extra
):
    def rows_of(stream, seq0):
        return [
            (path, op, None if op == "delete" else f"c:{seed}:{seq0 + i}", seq0 + i)
            for i, (path, op, seed) in enumerate(stream)
        ]

    def merge(tbl, chunk, epoch):
        tbl.merge_cdc(
            spark.createDataFrame(
                [("r", p, c, o, s) for (p, o, c, s) in chunk],
                "repo string, path string, content string, op string, seq long",
            ),
            epoch=epoch,
        )

    root = tmp_path_factory.mktemp("wapprop")
    t = LakeTable.create(
        spark, str(root / "prod"),
        spark.createDataFrame([], "repo string, path string, content string").schema,
        ["repo", "path"], n_buckets=2,
    )
    b_rows = rows_of(base, 0)
    merge(t, b_rows, epoch=0)
    stage = t.clone(str(root / "stage"))
    merge(t, rows_of(cur_extra, len(b_rows)), epoch=1)
    tgt_rows = rows_of(target_extra, len(b_rows))
    merge(stage, tgt_rows, epoch=2)

    t.merge_from(stage)
    got = {r["path"]: r["content"] for r in t.read().collect()}
    assert got == pandas_oracle(b_rows + tgt_rows)
    # republish is a no-op
    assert t.merge_from(stage)["skipped"] is True
