"""Source-layer + join-like operator tests (sources/measurements.py,
operators/enrich.py) — the engine's analogue of the reference's
source/typed-stream/meta-extractor test coverage
(reference: runners/unified/SourceBuildTest, MeasurementCreateTest)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamevmon_spark.operators.enrich import enrich_broadcast, zip_streams
from streamevmon_spark.sources import measurements as M


def test_typed_stream_filters_single_type(spark, sf_dir):
    ev = M.load_events(spark, sf_dir)
    clicks = M.typed_stream(ev, "click")
    types = [r[0] for r in clicks.select("event_type").distinct().collect()]
    assert types == ["click"]


def test_drop_lossy_removes_nulls(spark, sf_dir):
    ev = M.load_events(spark, sf_dir)
    assert M.drop_lossy(ev).where(F.col("value").isNull()).count() == 0


def test_stream_ids_dense_and_consistent(spark, sf_dir):
    ev = M.load_events(spark, sf_dir)
    with_ids = M.assign_stream_ids(ev)
    # dense: ids are exactly 0..n_series-1
    ids = sorted(
        r[0] for r in with_ids.select("stream_id").distinct().collect()
    )
    n_series = ev.select(*M.SERIES_KEY).distinct().count()
    assert ids == list(range(n_series))
    # consistent: one id per series and one series per id
    pairs = with_ids.select(*M.SERIES_KEY, "stream_id").distinct()
    assert pairs.count() == n_series


def test_history_scan_boundaries(spark, sf_dir):
    ev = M.load_events(spark, sf_dir)
    lo, hi = "2024-01-01 00:30:00", "2024-01-01 02:00:00"
    got = M.history_scan(ev, lo, hi)
    mn, mx = got.agg(F.min("ts"), F.max("ts")).first()
    assert str(mn) > lo  # start exclusive
    assert str(mx) <= hi  # end inclusive


def test_parse_tags_extracts_int(spark, sf_dir):
    ev = M.load_events(spark, sf_dir)
    tagged = M.parse_tags(ev)
    row = tagged.select("props", "tag_k").first()
    import json

    assert row["tag_k"] == json.loads(row["props"])["k"]


def test_csv_projection_canonicalisation(spark, sf_dir):
    ev = M.load_events(spark, sf_dir)
    row = (
        M.csv_projection(ev)
        .join(ev, "event_id")
        .where(F.col("value").isNotNull())
        .first()
    )
    parts = row["csv_row"].split(",")
    assert parts[0] == str(row["event_id"])
    assert parts[3] == row["event_type"]
    # lossy rows serialise value as empty string (Option -> "")
    lossy = (
        M.csv_projection(ev.withColumn("value", F.lit(None).cast("double")))
        .first()["csv_row"]
        .split(",")
    )
    assert lossy[4] == ""


def test_enrich_broadcast_left_semantics(spark, sf_dir):
    ev = M.load_events(spark, sf_dir)
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = enrich_broadcast(
        ev, customer, "user_id", "c_custkey", ["c_name", "c_acctbal"]
    )
    assert out.count() == ev.count()  # left join: no fact rows lost
    # broadcast hint survives into the physical plan
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_zip_streams_positional(spark, sf_dir):
    ev = M.load_events(spark, sf_dir).select("event_id", "ts", "event_type")
    a = M.typed_stream(ev, "click").drop("event_type")
    b = M.typed_stream(ev, "view").drop("event_type")
    z = zip_streams(a, b, ["ts", "event_id"])
    assert z.count() == min(a.count(), b.count())
    # position 0 pairs the earliest row of each side
    first = z.orderBy("zip_idx").first()
    assert first["a_event_id"] == a.orderBy("ts", "event_id").first()["event_id"]
    assert first["b_event_id"] == b.orderBy("ts", "event_id").first()["event_id"]


def test_nab_file_scan_stream_from_filename(spark, tmp_path):
    """NAB CSV scan: stream id = source filename, rows parsed in
    parallel (reference: flink/sources/NabFileInputFormat.scala:41-80)."""
    from streamevmon_spark.sources.measurements import nab_file_scan

    for name, rows in {
        "ec2_cpu.csv": ["2014-01-01 00:00:00,1.5", "2014-01-01 00:05:00,2.5"],
        "speed_7578.csv": ["2015-09-01 12:00:00,60.0"],
    }.items():
        (tmp_path / name).write_text("timestamp,value\n" + "\n".join(rows))
    out = nab_file_scan(spark, str(tmp_path)).collect()
    by_stream = {}
    for r in out:
        by_stream.setdefault(r.stream, []).append((r.ts, r.value))
    assert set(by_stream) == {"ec2_cpu", "speed_7578"}
    assert len(by_stream["ec2_cpu"]) == 2
    assert by_stream["speed_7578"][0][1] == 60.0


def test_parse_rtts_edge_cases(spark):
    """getRtts parse quirks: empty brackets -> [], None -> NULL, spaces
    trimmed (reference: InfluxMeasurementFactory.scala:166-180)."""
    from streamevmon_spark.sources.measurements import parse_rtts

    df = spark.createDataFrame(
        [('"[]"',), ('"[308]"',), ('"[1, None, 3]"',)], "rtts_raw string"
    )
    got = [r.rtts for r in parse_rtts(df).collect()]
    assert got == [[], [308], [1, None, 3]]


def test_asof_enrich_semantics(spark):
    """As-of join: latest dim payload with dim_ts <= fact_ts per key;
    equal timestamps match (>= semantics); facts before any dim row or
    with an absent key get NULLs — mirroring DuckDB ASOF LEFT JOIN."""
    from streamevmon_spark.operators.enrich import asof_enrich

    facts = spark.createDataFrame(
        [("a", 5, "f1"), ("a", 10, "f2"), ("a", 20, "f3"),
         ("b", 10, "f4"), ("c", 10, "f5")],
        "k string, ts long, tag string",
    )
    dim = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 15, 2.0), ("b", 11, 3.0)],
        "k string, ts long, payload double",
    )
    got = {
        (r.k, r.ts): (r.asof_ts, r.asof_payload)
        for r in asof_enrich(facts, dim, ["k"], fact_ts="ts",
                             dim_ts="ts").collect()
    }
    assert got == {
        ("a", 5): (None, None),       # before any dim row
        ("a", 10): (10, 1.0),         # equal ts matches
        ("a", 20): (15, 2.0),         # latest of the two
        ("b", 10): (None, None),      # dim row is later
        ("c", 10): (None, None),      # key absent from dim
    }


def test_line_protocol_quote_aware_split(spark):
    from streamevmon_spark.sources.measurements import parse_line_protocol

    lines = spark.createDataFrame(
        [
            # quoted comma + quoted space survive inside values
            (1, 'm,region="us, west" msg="a b",n=4i 1500000000'),
            # entry without '=' rejects the WHOLE line
            (2, 'm,bad msg="x" 1500000000'),
            # '=' inside a quoted value also rejects the whole line
            # (reference entryToTuple splits on every '=')
            (3, 'm,t=1 msg="a=b" 1500000000'),
            # wrong space-part count rejects
            (4, 'm,t=1 msg="x" 1500000000 extra'),
            # minimal valid line: no tags, one field
            (5, "m f=2 2000000999"),
        ],
        "event_id long, value string",
    )
    out = parse_line_protocol(lines)
    rows = {(r.line_id, r.kind, r.key): r for r in out.collect()}
    ids = {lid for (lid, _, _) in rows}
    assert ids == {1, 5}
    assert rows[(1, "tag", "region")].val == '"us, west"'
    assert rows[(1, "field", "msg")].val == '"a b"'
    assert rows[(1, "field", "n")].val == "4i"
    # ns -> ms truncation (Instant.ofEpochMilli(NANOSECONDS.toMillis))
    import datetime as dt

    assert rows[(1, "field", "n")].time == dt.datetime(1970, 1, 1, 0, 0, 1, 500000)
    assert rows[(5, "field", "f")].time == dt.datetime(1970, 1, 1, 0, 0, 2)


def test_jdbc_range_scan_option_construction(spark):
    # no PostgreSQL in the sandbox: assert the constructed reader plan
    # (pushdown subquery with the reference's exclusive/inclusive
    # boundaries, partitioned read options, 1000-row fetch) via a
    # capturing stand-in for the DataFrameReader
    from streamevmon_spark.sources import jdbc as J

    captured = {}

    class FakeReader:
        def format(self, f):
            captured["format"] = f
            return self

        def option(self, k, v):
            captured[k] = v
            return self

    class FakeSpark:
        @property
        def read(self):
            return FakeReader()

    J.jdbc_range_scan(
        FakeSpark(), "jdbc:postgresql://db/amp", "data_amp2.traceroute",
        "timestamp", "2024-01-01 00:00:00", "2024-01-02 00:00:00",
        n_partitions=8, properties={"user": "amp"},
    )
    assert captured["format"] == "jdbc"
    assert captured["partitionColumn"] == "timestamp"
    assert captured["numPartitions"] == "8"
    assert captured["fetchsize"] == "1000"
    assert captured["user"] == "amp"
    assert "timestamp > '2024-01-01 00:00:00'" in captured["dbtable"]
    assert "timestamp <= '2024-01-02 00:00:00'" in captured["dbtable"]

    J.traceroute_meta_dim(FakeSpark(), "jdbc:postgresql://db/amp")
    assert captured["dbtable"] == "streams.traceroute"
