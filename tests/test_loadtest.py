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
