"""Prometheus pull endpoint (streaming/metrics_http.py): exposition
format, HTTP serving, and the live streaming-progress listener — the
engine analog of the reference's /metrics collectors
(metrics/metrics.go:47-76)."""

from __future__ import annotations

import urllib.request

from eventsgateway_spark.streaming.metrics_http import (
    PrometheusRegistry,
    ProgressMetricsListener,
    serve_metrics,
)


def test_registry_renders_exposition_format():
    r = PrometheusRegistry()
    r.inc_counter("ev_total", {"topic": "t1", "status": "ok"}, 3, help="events")
    r.inc_counter("ev_total", {"topic": "t1", "status": "ok"}, 2)
    r.inc_counter("ev_total", {"topic": "t2", "status": "failed"})
    r.set_gauge("buf_size", 7, {"topic": "t1"})
    for v in (5, 25, 45, 99, 400, 900):
        r.observe_histogram("resp_ms", v)
    text = r.render()
    assert "# TYPE ev_total counter" in text
    assert '# HELP ev_total events' in text
    assert 'ev_total{status="ok",topic="t1"} 5' in text
    assert 'ev_total{status="failed",topic="t2"} 1' in text
    assert "# TYPE buf_size gauge" in text
    assert 'buf_size{topic="t1"} 7' in text
    # cumulative buckets over the reference's {10,30,50,100,500} bounds
    assert 'resp_ms_bucket{le="10"} 1' in text
    assert 'resp_ms_bucket{le="30"} 2' in text
    assert 'resp_ms_bucket{le="50"} 3' in text
    assert 'resp_ms_bucket{le="100"} 4' in text
    assert 'resp_ms_bucket{le="500"} 5' in text
    assert 'resp_ms_bucket{le="+Inf"} 6' in text
    assert "resp_ms_sum 1474" in text
    assert "resp_ms_count 6" in text


def test_http_endpoint_serves_and_404s():
    r = PrometheusRegistry()
    r.inc_counter("hits_total", value=42)
    server, port = serve_metrics(r)
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=10
        ).read().decode()
        assert "hits_total 42" in body
        # live: a later increment is visible on the next scrape
        r.inc_counter("hits_total")
        body2 = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=10
        ).read().decode()
        assert "hits_total 43" in body2
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=10)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_streaming_progress_feeds_registry(spark, tmp_path):
    """A real micro-batch run must surface as counter/histogram/gauge
    families on the scrape — including observe() metrics."""
    from pyspark.sql import functions as F

    reg = PrometheusRegistry()
    listener = ProgressMetricsListener(reg)
    spark.streams.addListener(listener)
    try:
        src = str(tmp_path / "src")
        spark.range(100).select(
            F.col("id"), (F.col("id") % 3).cast("string").alias("topic")
        ).write.parquet(src)
        stream = (
            spark.readStream.schema("id long, topic string").parquet(src)
            .observe("ingest", F.count(F.lit(1)).alias("n_events"))
        )
        q = (
            stream.writeStream.format("noop")
            .queryName("metrics_probe")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener callbacks are async — poll briefly for delivery
        import time

        text = ""
        for _ in range(100):
            text = reg.render()
            if "eventsgateway_events_total" in text and "observed_n_events" in text:
                break
            time.sleep(0.2)
        assert 'eventsgateway_events_total{query="metrics_probe",status="ok"} 100' in text
        assert "eventsgateway_batch_duration_ms_count" in text
        assert 'eventsgateway_observed_n_events{observation="ingest",query="metrics_probe"} 100' in text
        server, port = serve_metrics(reg)
        try:
            body = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=10
            ).read().decode()
            assert "eventsgateway_events_total" in body
        finally:
            server.shutdown()
    finally:
        spark.streams.removeListener(listener)


def test_label_values_are_escaped():
    """A quote/backslash/newline in a label value (query names are
    user-controlled) must render escaped per the exposition spec —
    unescaped it would invalidate the whole scrape."""
    from eventsgateway_spark.streaming.metrics_http import PrometheusRegistry

    reg = PrometheusRegistry()
    reg.inc_counter("c_total", labels={"q": 'ingest "v2"\\x\n'})
    page = reg.render()
    assert 'q="ingest \\"v2\\"\\\\x\\n"' in page


def test_conflicting_histogram_buckets_raise():
    import pytest

    from eventsgateway_spark.streaming.metrics_http import PrometheusRegistry

    reg = PrometheusRegistry()
    reg.observe_histogram("h_ms", 5.0, buckets=(10.0, 100.0))
    with pytest.raises(ValueError, match="conflicting"):
        reg.observe_histogram("h_ms", 5.0, buckets=(1000.0, 5000.0))
