"""End-to-end live pipeline (scripts/run_flows.py --live): real TCP
pushes of transcript-wire lines -> SubscriptionListener landing ->
checkpointed streaming cascade-store maintenance -> tier-routed reads,
with a process "crash" (drain loop halted and restarted against the
same checkpoint + manifest) in the middle — the final store must be
byte-equal to the batch full rebuild over the same rows. Mirrors the
reference's catch-up + subscribe production lifecycle
(flink/sources/InfluxAmpSourceFunction.scala:130-159 driven by
runners/unified/YamlDagRunner.scala)."""

from __future__ import annotations

import os
import socket
import sys
import time

import pandas as pd
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.rollup import rollup_tiers_cascade_exact
from streamevmon_spark.plans.cascade_store import read_cascade
from streamevmon_spark.plans.manifest import load_manifest
from streamevmon_spark.streaming.live_sources import (
    SubscriptionListener,
    transcript_wire_lines,
)


def _push(port: int, lines: list[str]) -> None:
    """One HTTP-framed transmission, the reference's push shape
    (headers, blank line, data lines)."""
    payload = (
        "POST /write HTTP/1.1\r\n"
        "Host: localhost\r\n"
        "Content-Type: text/plain\r\n"
        "\r\n" + "\n".join(lines) + "\n"
    )
    with socket.create_connection(("127.0.0.1", port)) as c:
        c.sendall(payload.encode())
        c.shutdown(socket.SHUT_WR)


def _wait_for_files(path: str, n: int, timeout_s: float = 10.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if len([f for f in os.listdir(path)
                if not f.startswith(".")]) >= n:
            return
        time.sleep(0.05)
    raise TimeoutError(f"landing dir never reached {n} files")


@pytest.fixture(scope="module")
def live_store(spark, sf_dir, tmp_path_factory):
    from scripts.run_flows import drain_live

    base = tmp_path_factory.mktemp("live")
    landing = str(base / "landing")
    store = str(base / "store")

    df = load_transcripts(spark, sf_dir)
    # three event-time slices = three pushed transmissions = three
    # micro-batches (maxFilesPerTrigger=1); slices ordered by time so
    # the carried boundary rows see monotone series histories, the
    # same staggered-arrival contract the parquet stream tests pin
    lines = [
        r.value
        for r in transcript_wire_lines(df.orderBy("ts", "conv_id",
                                                  "turn_idx")).collect()
    ]
    third = len(lines) // 3
    slices = [lines[:third], lines[third:2 * third], lines[2 * third:]]

    listener = SubscriptionListener(landing)
    listener.start()
    try:
        # catch-up phase: two transmissions land, one drain runs
        _push(listener.port, slices[0])
        _wait_for_files(landing, 1)
        _push(listener.port, slices[1])
        _wait_for_files(landing, 2)
        s1 = drain_live(spark, landing, store)
        assert s1["snapshots"] == 2
        # CRASH: the drain loop dies here. The restart below reuses
        # nothing in memory — only the on-disk checkpoint, manifest,
        # boundary and state dirs survive, exactly what a new process
        # would see.
        _push(listener.port, slices[2])
        _wait_for_files(landing, 3)
        s2 = drain_live(spark, landing, store)  # resume
        assert s2["snapshots"] == 3
    finally:
        listener.stop()
    return store, len(lines)


def _sorted(df):
    return df.toPandas().sort_values(
        ["conv_id", "tool", "role", "window_start"], ignore_index=True
    )


def test_live_store_equals_batch_rebuild(spark, sf_dir, live_store):
    store, _ = live_store
    full = rollup_tiers_cascade_exact(load_transcripts(spark, sf_dir))
    try:
        for tier in ("1h", "1d"):
            got = _sorted(read_cascade(spark, store, tier))
            exp = _sorted(full[tier])
            pd.testing.assert_frame_equal(got, exp)
    finally:
        for state in full["_state"]:
            state.unpersist()


def test_live_manifest_microbatches(spark, live_store):
    store, n_lines = live_store
    m = load_manifest(store)
    assert len(m.partitions) == 3  # one snapshot per transmission
    assert all(p.status == "done" for p in m.partitions)
    assert sum(p.rows_in for p in m.partitions) == n_lines
    starts = [p.start_us for p in m.partitions]
    assert starts == sorted(starts)


def test_live_resume_is_noop_without_new_pushes(spark, live_store):
    """A further restart with no new transmissions must not change the
    store (checkpoint replay safety — the epoch guard + committed
    offsets make the drain idempotent)."""
    from scripts.run_flows import drain_live

    store, _ = live_store
    landing = os.path.join(os.path.dirname(store), "landing")
    before = load_manifest(store)
    s = drain_live(spark, landing, store)
    assert s["snapshots"] == len(before.partitions)
    after = load_manifest(store)
    assert [p.part_id for p in after.partitions] == [
        p.part_id for p in before.partitions]
