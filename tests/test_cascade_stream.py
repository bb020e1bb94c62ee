"""Streaming continuous-aggregate maintenance
(streaming/cascade_stream.py): draining the micro-batch store must
equal the batch full rebuild bit-for-bit, each epoch must leave a
manifest snapshot record, and a second drain over the same checkpoint
must be a no-op."""

from __future__ import annotations

import pandas as pd
import pytest

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.rollup import rollup_tiers_cascade_exact
from streamevmon_spark.plans.cascade_store import read_cascade
from streamevmon_spark.plans.manifest import load_manifest
from streamevmon_spark.streaming.cascade_stream import (
    stream_cascade_store,
)
from streamevmon_spark.streaming.rollup_stream import (
    materialize_transcripts,
    stream_transcripts,
)


def _sorted(df):
    return df.toPandas().sort_values(
        ["conv_id", "tool", "role", "window_start"], ignore_index=True
    )


@pytest.fixture(scope="module")
def stream_store(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("casc_stream")
    inp = materialize_transcripts(
        spark, sf_dir, str(base / "input"), n_files=4
    )
    out = str(base / "store")
    stream_cascade_store(
        spark,
        stream_transcripts(spark, inp, max_files_per_trigger=1),
        out,
    )
    return inp, out


def test_stream_drain_equals_full_rebuild(spark, sf_dir, stream_store):
    _, out = stream_store
    full = rollup_tiers_cascade_exact(load_transcripts(spark, sf_dir))
    try:
        for tier in ("1h", "1d"):
            got = _sorted(read_cascade(spark, out, tier))
            exp = _sorted(full[tier])
            pd.testing.assert_frame_equal(got, exp)
    finally:
        for state in full["_state"]:
            state.unpersist()


def test_stream_manifest_snapshots(stream_store):
    _, out = stream_store
    m = load_manifest(out)
    # one snapshot per micro-batch (maxFilesPerTrigger=1 over 4 files)
    assert len(m.partitions) == 4
    assert [p.seq for p in m.partitions] == [1, 2, 3, 4]
    for p in m.partitions:
        assert p.status == "done"
        assert p.rows_in > 0 and p.turns_per_sec > 0
        assert p.rows_out.get("state_1m", 0) > 0
    # event-time ranges arrive in order (the staggered-mtime contract)
    starts = [p.start_us for p in m.partitions]
    assert starts == sorted(starts)
    # every epoch refreshed the coarse tiers up to its own snapshot
    for tier in ("1h", "1d"):
        assert m.cascade[tier]["last_seq"] == 4
        assert len(m.cascade[tier]["log"]) == 4


def test_stream_second_drain_noop(spark, stream_store):
    inp, out = stream_store
    m_before = load_manifest(out)
    stream_cascade_store(
        spark,
        stream_transcripts(spark, inp, max_files_per_trigger=1),
        out,
    )
    m_after = load_manifest(out)
    assert len(m_after.partitions) == len(m_before.partitions)
    assert [p.seq for p in m_after.partitions] == [
        p.seq for p in m_before.partitions
    ]
