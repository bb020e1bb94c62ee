"""Live-feed source tests: the rate-limited poll loop (virtual clock,
crash/resume exactly-once) and the push-subscription listener
(HTTP-framed socket pushes -> landing dir -> distributed parse).

Reference semantics under test:
PollingEsmondSourceFunction.scala:169-291 (loop interval, per-endpoint
offset advance, checkpointed endpoint state) and
InfluxAmpSourceFunction.scala:179-230 (header strip, line feed).
"""

from __future__ import annotations

import os
import socket

import pytest

from streamevmon_spark.sources.esmond import esmond_typed, synth_esmond_entries
from streamevmon_spark.streaming.live_sources import (
    Endpoint,
    PollingSource,
    SubscriptionListener,
    read_landing,
    read_landing_stream,
)


class VirtualClock:
    def __init__(self, t0: float = 1_700_000_000.0) -> None:
        self.t = t0

    def __call__(self) -> float:
        return self.t

    def sleep(self, dt: float) -> None:
        assert dt >= 0
        self.t += dt


def _feed(seed_offset: int = 0):
    """Deterministic fake esmond API: one entry every 10 s per
    endpoint, value derived from (endpoint, ts)."""

    calls: list[tuple[str, int, int]] = []

    def fetch(ep: Endpoint, t_start: int, t_end: int):
        calls.append((ep.base_uri, t_start, t_end))
        ep_idx = int(ep.base_uri.split("/k")[1].split("/")[0])
        first = (t_start // 10) * 10
        if first < t_start:
            first += 10
        out = []
        for ts in range(first, t_end + 1, 10):
            eid = ts * 100 + ep_idx + seed_offset
            out.append(
                {
                    "event_id": eid,
                    "base_uri": ep.base_uri,
                    "event_type": ep.event_type,
                    "ts_s": ts,
                    "val_json": f"{ts % 4000}.0",
                }
            )
        return out

    fetch.calls = calls
    return fetch


def _endpoints() -> list[Endpoint]:
    return [
        Endpoint(
            f"/esmond/perfsonar/archive/k{i}/throughput/base",
            "throughput",
            0,
        )
        for i in range(3)
    ]


def test_loop_interval_rule(tmp_path):
    """targetRefreshInterval/n floored at minimumTimeBetweenQueries."""
    clk = VirtualClock()
    src = PollingSource(
        fetch=_feed(),
        endpoints=_endpoints(),
        landing_dir=str(tmp_path / "land"),
        state_path=str(tmp_path / "state.json"),
        target_refresh_interval_s=60,
        minimum_time_between_queries_s=1,
        clock=clk,
        sleep=clk.sleep,
    )
    assert src.loop_interval_s() == pytest.approx(20.0)
    src.minimum_time_between_queries_s = 30
    assert src.loop_interval_s() == pytest.approx(30.0)


def test_poll_advances_offsets_and_rate_limits(tmp_path):
    clk = VirtualClock()
    fetch = _feed()
    src = PollingSource(
        fetch=fetch,
        endpoints=_endpoints(),
        landing_dir=str(tmp_path / "land"),
        state_path=str(tmp_path / "state.json"),
        fetch_history_s=100,
        time_offset_s=5,
        target_refresh_interval_s=30,
        minimum_time_between_queries_s=1,
        clock=clk,
        sleep=clk.sleep,
    )
    t0 = clk.t
    # catch-up pass: zero delay between endpoint queries
    n = src.poll_once(loop_interval_s=0.0)
    assert n > 0
    assert clk.t == t0  # no sleeps
    # every endpoint advanced to max(ts)+1
    for ep in src.endpoints:
        assert ep.last_measurement_time % 10 == 1
    # steady-state pass: 10 s between queries (30/3), simulated clock
    # advances by exactly 2 inter-query waits (first query is instant)
    t1 = clk.t
    src.poll_once()
    assert clk.t - t1 == pytest.approx(20.0)
    # fetch windows respect time_offset (t_end = query_time - offset,
    # and every query time is <= the final clock)
    for _, t_start, t_end in fetch.calls:
        assert t_end <= int(clk.t) - 5
        assert t_start <= t_end + 1


def test_empty_fetch_keeps_offset(tmp_path):
    clk = VirtualClock()
    src = PollingSource(
        fetch=lambda ep, a, b: [],
        endpoints=_endpoints(),
        landing_dir=str(tmp_path / "land"),
        state_path=str(tmp_path / "state.json"),
        clock=clk,
        sleep=clk.sleep,
    )
    before = [ep.last_measurement_time for ep in src.endpoints]
    assert src.poll_once(loop_interval_s=0.0) == 0
    assert [ep.last_measurement_time for ep in src.endpoints] == before
    # no landing file for an empty pass
    assert not [
        f for f in os.listdir(src.landing_dir) if f.endswith(".parquet")
    ]


def test_crash_resume_exactly_once(tmp_path, spark):  # noqa: F811
    """A poller killed mid-run resumes from the state checkpoint with
    neither duplicates nor gaps; a crash AFTER landing but BEFORE the
    state save replays the pass under the same batch seq (atomic
    replace, no duplicate rows)."""
    land = str(tmp_path / "land")
    state = str(tmp_path / "state.json")

    def mk(clk):
        return PollingSource(
            fetch=_feed(),
            endpoints=_endpoints(),
            landing_dir=land,
            state_path=state,
            fetch_history_s=60,
            target_refresh_interval_s=30,
            clock=clk,
            sleep=clk.sleep,
        )

    clk = VirtualClock()
    src = mk(clk)
    src.poll_once(loop_interval_s=0.0)
    clk.t += 40
    src.poll_once()

    # simulate the land-then-crash window: run a pass, then roll the
    # checkpoint back to its pre-pass value as if _save_state never ran
    seq_before = src._batch_seq
    offsets_before = [ep.last_measurement_time for ep in src.endpoints]
    clk.t += 40
    src.poll_once()
    src._batch_seq = seq_before
    for ep, off in zip(src.endpoints, offsets_before):
        ep.last_measurement_time = off
    src._save_state()

    # resume in a "new process"
    clk2 = VirtualClock(clk.t + 40)
    src2 = mk(clk2)
    assert src2._batch_seq == seq_before  # restored, will overwrite
    src2.poll_once()
    clk2.t += 40
    src2.poll_once()

    got = read_landing(spark, land).toPandas()
    assert not got.duplicated(["event_id"]).any()
    # no gaps: every 10 s tick per endpoint in the covered range landed
    for ep in src2.endpoints:
        mine = got[got.base_uri == ep.base_uri].sort_values("ts_s")
        ticks = mine["ts_s"].to_numpy()
        assert (ticks[1:] - ticks[:-1] == 10).all()


def test_landing_feeds_typed_parse_and_stream(tmp_path, spark):  # noqa: F811
    """Landing batches parse through esmond_typed identically to the
    same rows delivered as one relation, and the streaming view
    (availableNow) sees every batch exactly once."""
    land = str(tmp_path / "land")
    clk = VirtualClock()
    src = PollingSource(
        fetch=_feed(),
        endpoints=_endpoints(),
        landing_dir=land,
        state_path=str(tmp_path / "state.json"),
        fetch_history_s=120,
        clock=clk,
        sleep=clk.sleep,
    )
    src.poll_once(loop_interval_s=0.0)
    clk.t += 60
    src.poll_once()

    batch = read_landing(spark, land)
    typed = esmond_typed(batch).toPandas().sort_values("entry_id")
    assert (typed["subtype"] == "simple").all()
    assert len(typed) == batch.count()

    out_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        read_landing_stream(spark, land)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(out_dir)
    assert streamed.count() == batch.count()
    assert set(streamed.columns) == set(batch.columns)


def test_subscription_listener_header_strip_and_parse(tmp_path, spark):  # noqa: F811,E501
    """HTTP-framed push -> header dropped -> data lines landed -> the
    distributed line-protocol parse sees exactly the pushed lines."""
    from streamevmon_spark.sources.measurements import (
        parse_line_protocol,
        synth_line_protocol,
    )

    land = str(tmp_path / "push")
    listener = SubscriptionListener(land)
    listener.start()
    try:
        lines = [
            r.value
            for r in synth_line_protocol(
                spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            )
            .limit(50)
            .collect()
        ]
        payload = (
            "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            + "\n".join(lines)
            + "\n"
        )
        with socket.create_connection(("127.0.0.1", listener.port)) as c:
            c.sendall(payload.encode())
            c.shutdown(socket.SHUT_WR)
        # wait for the batch file
        import time as _t

        for _ in range(100):
            if os.listdir(land):
                break
            _t.sleep(0.05)
    finally:
        listener.stop()
    landed = spark.read.text(land)
    assert landed.count() == 50
    # \r survives the \n split as part of the header lines only; data
    # lines are byte-identical to what was pushed
    got = sorted(r.value for r in landed.collect())
    assert got == sorted(lines)
    from pyspark.sql import functions as F

    parsed = parse_line_protocol(
        landed.withColumn("event_id", F.monotonically_increasing_id())
    )
    assert parsed.where("measurement IS NOT NULL").count() > 0


def test_header_strip_rule():
    ls = SubscriptionListener.strip_http_header
    assert ls(["HTTP/1.1 200 OK", "H: v", "", "a", "b"]) == ["a", "b"]
    assert ls(["", "a"]) == ["a"]  # empty header block
    assert ls(["only-headers"]) == []


def test_transcript_wire_roundtrip_exact(spark, sf_dir):
    """print(parse(x)) == x for the transcript wire format — µs
    timestamps (no ns->ms truncation), NULL-value lossy turns, double
    values round-tripping through CAST(STRING)."""
    import pandas as pd

    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.streaming.live_sources import (
        parse_transcript_wire,
        transcript_wire_lines,
    )

    df = load_transcripts(spark, sf_dir)
    back = parse_transcript_wire(transcript_wire_lines(df))
    cols = ["conv_id", "turn_idx", "role", "tool", "ts", "value"]
    key = ["conv_id", "tool", "role", "ts", "turn_idx"]
    a = df.select(*cols).toPandas().sort_values(key, ignore_index=True)
    b = back.select(*cols).toPandas().sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["value"].isna().any()  # lossy turns exercised
