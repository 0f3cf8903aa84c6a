"""Load-test harness (tools/loadtest.py): workload parity knobs and
report consistency — the engine analog of the reference's only
benchmark tool (tools/loadtest.go)."""

from __future__ import annotations

from eventsgateway_spark.tools.loadtest import PROPS_SIZES, RANDOM_TOPICS, run_loadtest


def test_loadtest_report_and_bus_roundtrip(spark, tmp_path):
    bus = str(tmp_path / "bus")
    rep = run_loadtest(
        spark, threads=6, duration_s=1.0, props_size="medium",
        bus_root=bus, seed=7,
    )
    assert rep["sent"] == 6 * 4  # 1s / 250ms mean sleep = 4 per thread
    assert rep["ingested_ok"] == rep["sent"] and rep["rejected"] == 0
    assert rep["props_pairs"] == PROPS_SIZES["medium"] == 17
    assert rep["events_per_sec"] > 0
    # payloads landed on the bus, topics drawn from the reference set
    # (consume via the bus API: producers publish per-batch
    # subdirectories, which a flat root read would not see)
    from eventsgateway_spark.sources.kafka import FileBus

    payloads = FileBus(spark, bus).consume_batch()
    assert payloads.count() == rep["sent"]
    topics = {r["topic"] for r in payloads.select("topic").distinct().collect()}
    allowed = {f"sv-uploads-{t}" for t in RANDOM_TOPICS} | {"sv-uploads-loadtest"}
    assert topics <= allowed and len(topics) >= 2


def test_loadtest_is_seed_deterministic(spark):
    a = run_loadtest(spark, threads=2, duration_s=0.5, seed=3)
    b = run_loadtest(spark, threads=2, duration_s=0.5, seed=3)
    assert (a["sent"], a["ingested_ok"]) == (b["sent"], b["ingested_ok"])


def test_pipeline_throughput_probe(spark, tmp_path):
    """Backfill-scale throughput probe: JVM-generated wire rows through
    the full ingest plan; all events valid, payloads decodable."""
    from eventsgateway_spark.sources.avro_codec import decode_event
    from eventsgateway_spark.sources.kafka import FileBus
    from eventsgateway_spark.tools.loadtest import run_pipeline_throughput

    rep = run_pipeline_throughput(spark, 2_000, bus_root=str(tmp_path / "bus"))
    assert rep["events"] == 2_000
    rows = FileBus(spark, str(tmp_path / "bus")).consume_batch()
    assert rows.count() == 2_000
    one = rows.limit(1).collect()[0]
    rec = decode_event(bytes(one["value"]))
    assert rec["name"] == "load test event" and len(rec["props"]) == 11
    assert one["topic"].startswith("sv-uploads-")


def test_grpc_loadtest_inproc_histogram_and_bus(spark, tmp_path):
    """run_grpc_loadtest drives real SendEventsRequest wire bytes
    through the server-side codec + pipeline and reports the
    reference's {10,30,50,100,500} ms latency histogram
    (metrics/metrics.go:53). transport="inproc" is requested
    explicitly so the codec path under test is deterministic even in
    an environment where grpcio happens to be installed (the socket
    transport has its own gated coverage in test_ingest_grpc)."""
    from eventsgateway_spark.sources.kafka import FileBus
    from eventsgateway_spark.tools.loadtest import run_grpc_loadtest

    bus = str(tmp_path / "bus")
    rep = run_grpc_loadtest(
        spark, threads=3, duration_s=1.0, props_size="small",
        batch_size=5, bus_root=bus, seed=11, transport="inproc",
    )
    assert rep["transport"] == "inproc"
    assert rep["sent"] == 3 * 4 and rep["requests"] == 3  # ceil(12/5)
    assert rep["ingested_ok"] == rep["sent"] and rep["rejected"] == 0
    # cumulative buckets: monotone, +Inf == total requests
    hist = rep["latency_ms_buckets"]
    counts = [hist["10"], hist["30"], hist["50"], hist["100"],
              hist["500"], hist["+Inf"]]
    assert counts == sorted(counts) and counts[-1] == rep["requests"]
    # payloads really landed (wire id survived the full path)
    payloads = FileBus(spark, bus).consume_batch()
    assert payloads.count() == rep["sent"]


def test_grpc_loadtest_counts_rejects(spark):
    """A request whose decoded events include an invalid one reports it
    via FailureIndexes, and the report separates ok from rejected."""
    from eventsgateway_spark import ingest_grpc
    from eventsgateway_spark.ingest_http import ingest_events

    events = [
        {"id": "a", "name": "ok", "topic": "t", "props": {}, "timestamp": 1},
        {"id": "b", "name": "", "topic": "t", "props": {}, "timestamp": 1},
    ]
    raw = ingest_grpc.encode_send_events_request(events, request_id="r", retry=1)
    req = ingest_grpc.decode_send_events_request_full(raw)
    assert req["retry"] == 1 and len(req["events"]) == 2
    fail, reasons = ingest_events(spark, req["events"], None)
    assert fail == [1] and reasons[1]
