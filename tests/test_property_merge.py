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
