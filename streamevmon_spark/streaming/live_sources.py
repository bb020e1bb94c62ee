"""Live-feed sources: the rate-limited polling loop and the push
subscription listener, re-expressed for Spark's execution model.

The reference runs both as parallelism-1 Flink SourceFunctions:

- ``PollingEsmondSourceFunction`` (flink/sources/
  PollingEsmondSourceFunction.scala:169-291) keeps one ``Endpoint``
  record per discovered stream with the last observed measurement
  time, spreads queries so each endpoint refreshes every
  ``targetRefreshInterval`` but never queries the API more often than
  ``minimumTimeBetweenQueries`` (listen():273-283), fetches
  ``(lastMeasurementTime, queryTime - timeOffset]`` per endpoint,
  advances the offset to ``max(ts) + 1s`` only when entries arrived
  (getAndUpdateEndpoints():196-233), and checkpoints the endpoint list
  (snapshotState():301-304).
- ``InfluxAmpSourceFunction.listen`` (flink/sources/
  InfluxAmpSourceFunction.scala:179-230) accepts socket pushes,
  drops the HTTP header (all non-empty lines, then one blank line) and
  feeds each remaining line to the line-protocol parser.

The Spark-idiomatic decomposition: the API/socket loop is inherently a
single rate-limited driver thread (exactly the reference's
parallelism-1 constraint, PollingEsmondSourceFunction.scala:114-116),
so it runs OUTSIDE the cluster and lands small append-only parquet
batches into a landing directory; Structured Streaming's file source
(or the incremental-batch manifest loop in plans/pipeline) consumes
the landing dir with ordinary distributed plans. Entry state lives in
an atomically-replaced JSON checkpoint, so a crashed poller resumes
with neither duplicates nor gaps — the same contract as the
checkpointed ListState. At 100 TB nothing here is data-sized: the
poller moves API pages, the cluster moves the data.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the landing-batch schema == synth_esmond_entries' relation, so every
# consumer of the synthetic generator reads the live landing dir
# unchanged
ENTRY_FIELDS = ("event_id", "base_uri", "event_type", "ts_s", "val_json")
_ENTRY_PA_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("base_uri", pa.string()),
        ("event_type", pa.string()),
        ("ts_s", pa.int64()),
        ("val_json", pa.string()),
    ]
)
ENTRY_DDL = (
    "event_id BIGINT, base_uri STRING, event_type STRING, "
    "ts_s BIGINT, val_json STRING"
)


@dataclass
class Endpoint:
    """One discovered stream: its REST base-URI + event type and the
    exclusive lower bound for the next fetch (reference Endpoint,
    PollingEsmondSourceFunction.scala:83-89)."""

    base_uri: str
    event_type: str
    last_measurement_time: int  # epoch seconds


@dataclass
class PollingSource:
    """Rate-limited per-endpoint catch-up poller.

    ``fetch(endpoint, t_start_s, t_end_s)`` returns an iterable of
    entry dicts with at least ``ts_s`` (epoch s) — the injectable
    analogue of the reference's ``connectionBuilder``. ``clock`` /
    ``sleep`` are injectable so tests run with a virtual clock.
    """

    fetch: Callable[[Endpoint, int, int], Iterable[dict]]
    endpoints: list[Endpoint]
    landing_dir: str
    state_path: str
    fetch_history_s: int = 3600
    time_offset_s: int = 0
    target_refresh_interval_s: int = 60
    minimum_time_between_queries_s: int = 1
    clock: Callable[[], float] = time.time
    sleep: Callable[[float], None] = time.sleep
    _batch_seq: int = field(default=0, init=False)
    _last_query_time: float = field(default=0.0, init=False)

    def __post_init__(self) -> None:
        os.makedirs(self.landing_dir, exist_ok=True)
        if not self._restore_state():
            # firstMeasurementTime = now - fetchHistory - timeOffset
            # (open(), PollingEsmondSourceFunction.scala:124)
            first = int(
                self.clock() - self.fetch_history_s - self.time_offset_s
            )
            for ep in self.endpoints:
                ep.last_measurement_time = first

    # -- checkpointed endpoint state (snapshotState analogue). The
    # batch seq is part of the checkpoint: a crash between landing a
    # batch and saving state replays the pass under the SAME seq, so
    # the replay atomically replaces the orphaned file instead of
    # duplicating it (the reference gets the equivalent from Flink's
    # checkpoint-consistent source replay).
    def _restore_state(self) -> bool:
        if not os.path.exists(self.state_path):
            return False
        with open(self.state_path) as f:
            state = json.load(f)
        self.endpoints = [Endpoint(**r) for r in state["endpoints"]]
        self._batch_seq = state["batch_seq"]
        return True

    def _save_state(self) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "endpoints": [vars(ep) for ep in self.endpoints],
                    "batch_seq": self._batch_seq,
                },
                f,
            )
        os.replace(tmp, self.state_path)  # atomic on POSIX

    # -- landing-batch emission ---------------------------------------
    def _land(self, entries: list[dict]) -> str | None:
        if not entries:
            return None
        cols = {
            k: [e.get(k) for e in entries] for k in ENTRY_FIELDS
        }
        table = pa.table(cols, schema=_ENTRY_PA_SCHEMA)
        name = f"batch-{self._batch_seq:08d}.parquet"
        tmp = os.path.join(self.landing_dir, "." + name + ".tmp")
        pq.write_table(table, tmp)
        # atomic rename: the streaming file source never sees partial
        # files (dot-prefixed temp files are ignored by Spark anyway)
        final = os.path.join(self.landing_dir, name)
        os.replace(tmp, final)
        self._batch_seq += 1
        return final

    # -- the reference's loop-interval rule ---------------------------
    def loop_interval_s(self) -> float:
        """targetRefreshInterval / n_endpoints, floored at
        minimumTimeBetweenQueries (listen(), :273-283)."""
        target = self.target_refresh_interval_s / max(
            1, len(self.endpoints)
        )
        return max(target, float(self.minimum_time_between_queries_s))

    # -- one pass over all endpoints ----------------------------------
    def poll_once(self, loop_interval_s: float | None = None) -> int:
        """getAndUpdateEndpoints: query every endpoint once, waiting
        ``loop_interval_s`` between queries (0 for the initial catch-up
        pass, run():260-261), land the union as ONE parquet batch, then
        checkpoint endpoint state. Returns the number of entries
        landed.

        Ordering guarantee: state (endpoint offsets + batch seq) is
        persisted only AFTER the landing batch is durably renamed, so
        a crash between the two replays the whole pass under the same
        checkpointed seq — the replay atomically replaces the orphaned
        batch file, and batch readers never see duplicates.
        """
        if loop_interval_s is None:
            loop_interval_s = self.loop_interval_s()
        # "The first query happens instantly" (:177-179)
        self._last_query_time = self.clock() - loop_interval_s
        got: list[dict] = []
        for ep in self.endpoints:
            now = self.clock()
            target = self._last_query_time + loop_interval_s
            if now < target:
                self.sleep(target - now)
            self._last_query_time = self.clock()
            t_end = int(self._last_query_time - self.time_offset_s)
            entries = list(
                self.fetch(ep, ep.last_measurement_time, t_end)
            )
            if entries:
                # advance to max(ts)+1 only on data (:204-215)
                ep.last_measurement_time = (
                    max(e["ts_s"] for e in entries) + 1
                )
                got.extend(entries)
        self._land(got)
        self._save_state()
        return len(got)

    def run(self, n_passes: int) -> int:
        """The reference's run(): one 0-delay catch-up pass, then
        rate-limited polling (bounded by ``n_passes`` here — the
        sandbox has no cancel() signal)."""
        total = self.poll_once(loop_interval_s=0.0)
        for _ in range(n_passes - 1):
            total += self.poll_once()
        return total


def read_landing(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Batch view of the landing dir (feeds sources/esmond.esmond_typed
    directly — same relation as synth_esmond_entries)."""
    return spark.read.schema(ENTRY_DDL).parquet(landing_dir)


def read_landing_stream(
    spark: SparkSession, landing_dir: str
) -> DataFrame:
    """Structured-Streaming view of the landing dir; one file = one
    poller batch. maxFilesPerTrigger keeps micro-batches bounded when
    catching up a long outage."""
    return (
        spark.readStream.schema(ENTRY_DDL)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )


class SubscriptionListener:
    """Push-subscription listener: a TCP server that accepts
    HTTP-framed line-protocol pushes and lands each transmission's
    data lines as one text batch (InfluxAmpSourceFunction.listen,
    flink/sources/InfluxAmpSourceFunction.scala:179-230: drop all
    non-empty header lines, then one blank line, then every remaining
    line is a data line).

    The landing dir is consumed by ``spark.read(Stream).text`` +
    sources/measurements.parse_line_protocol — the push loop stays a
    driver-side thread exactly like the reference's parallelism-1
    source, while parsing/typing runs distributed.
    """

    def __init__(self, landing_dir: str, host: str = "127.0.0.1",
                 port: int = 0) -> None:
        os.makedirs(landing_dir, exist_ok=True)
        self.landing_dir = landing_dir
        self._seq = 0
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(8)
        self._sock.settimeout(0.1)
        self.port = self._sock.getsockname()[1]
        self._running = False
        self._thread: threading.Thread | None = None

    @staticmethod
    def strip_http_header(lines: list[str]) -> list[str]:
        """dropWhile(nonEmpty).drop(1) — the reference's header strip
        (InfluxAmpSourceFunction.scala:202-206)."""
        i = 0
        while i < len(lines) and lines[i] != "":
            i += 1
        return lines[i + 1:]

    def _land_lines(self, data_lines: list[str]) -> None:
        if not data_lines:
            return
        name = f"push-{self._seq:08d}.txt"
        tmp = os.path.join(self.landing_dir, "." + name + ".tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(data_lines) + "\n")
        os.replace(tmp, os.path.join(self.landing_dir, name))
        self._seq += 1

    def _serve(self) -> None:
        while self._running:
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            with conn:
                conn.settimeout(5.0)
                buf = b""
                while True:
                    try:
                        chunk = conn.recv(65536)
                    except socket.timeout:
                        break
                    if not chunk:
                        break
                    buf += chunk
                # BufferedReader.readLine semantics: a line ends at \n
                # with any preceding \r stripped (HTTP header lines
                # arrive \r\n-terminated)
                lines = [
                    ln[:-1] if ln.endswith("\r") else ln
                    for ln in buf.decode("utf-8", "replace").split("\n")
                ]
                if lines and lines[-1] == "":
                    lines.pop()  # trailing newline, not a data line
                self._land_lines(self.strip_http_header(lines))

    def start(self) -> None:
        self._running = True
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        self._sock.close()


# -- transcript wire format (push-subscription payload) ----------------
#
# One line per turn, the engine's own line-protocol dialect for pushed
# transcript streams (the InfluxAmpSourceFunction subscription payload
# analogue, flink/sources/InfluxAmpSourceFunction.scala:179-230 —
# there the pushed lines are AMP measurements; here they are transcript
# turns): ``transcripts,conv_id=<c>,tool=<t>,role=<r>
# turn_idx=<n>i[,value=<v>] <epoch_us>``. The trailing timestamp is
# MICROSECONDS (not the AMP family's nanoseconds) so the wire
# round-trips the transcript ts exactly — print(parse(x)) == x is what
# the live pipeline's byte-equal-to-batch guarantee rests on. Lossy
# turns omit the value field. Both directions are pure projections, so
# they run on batch AND streaming relations.

def transcript_wire_lines(df: DataFrame) -> DataFrame:
    """transcripts rows -> one wire line per turn (column ``value``)."""
    from streamevmon_spark.operators.rollup import EPOCH_NTZ

    return df.select(
        F.expr(
            "concat('transcripts,conv_id=', conv_id, ',tool=', tool, "
            "',role=', role, ' turn_idx=', turn_idx, 'i', "
            "CASE WHEN value IS NULL THEN '' "
            "ELSE concat(',value=', CAST(value AS STRING)) END, ' ', "
            f"CAST(datediff(MICROSECOND, {EPOCH_NTZ}, ts) AS STRING))"
        ).alias("value")
    )


def parse_transcript_wire(lines: DataFrame) -> DataFrame:
    """Wire lines (text relation, column ``value``) -> typed transcript
    rows (conv_id, turn_idx, role, text, tool, ts, value). Same flat
    quote-parity splitLineProtocol walk and per-field conversion rules
    as the AMP v1 family (sources/amp.py) — required tags/fields
    missing or unconvertible drop the line whole — but with µs
    timestamps and no ns->ms truncation. ``text`` lands NULL: the wire
    carries the numeric stream; the cascade store never reads text."""
    from streamevmon_spark.operators.rollup import EPOCH_NTZ
    from streamevmon_spark.sources.amp import _field_exprs, _named
    from streamevmon_spark.sources.measurements import _UNQUOTED

    toks = (
        "CASE WHEN NOT contains(value, '\"') "
        "THEN split(value, '[ ,]', -1) "
        f"ELSE split(value, '[ ,]{_UNQUOTED}', -1) END"
    )
    parsed = (
        lines.select(F.expr(toks).alias("t"))
        .where(F.size("t") >= 2)
        .select(
            F.col("t").getItem(0).alias("measurement"),
            F.expr("slice(t, 2, size(t) - 2)").alias("kvs"),
            F.expr("try_cast(element_at(t, -1) AS BIGINT)").alias(
                "time_us"
            ),
        )
        .where(
            (F.col("measurement") == "transcripts")
            & F.col("time_us").isNotNull()
        )
    )
    turn_idx, turn_ok = _field_exprs("turn_idx", "int_req")
    value, value_ok = _field_exprs("value", "double_opt")
    required = [F.expr(_named(k)) for k in ("conv_id", "tool", "role")]
    valid = turn_ok & value_ok
    for c in required:
        valid = valid & c.isNotNull()
    return parsed.where(valid).select(
        F.expr(_named("conv_id")).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.expr(_named("role")).alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.expr(_named("tool")).alias("tool"),
        F.expr(
            f"timestampadd(MICROSECOND, time_us, {EPOCH_NTZ})"
        ).alias("ts"),
        value.alias("value"),
    )


def read_push_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """Streaming typed-transcript view of a SubscriptionListener
    landing dir: one pushed transmission = one text file = one
    micro-batch unit."""
    lines = (
        spark.readStream.option(
            "maxFilesPerTrigger", max_files_per_trigger
        ).text(landing_dir)
    )
    return parse_transcript_wire(lines)
