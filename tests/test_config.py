"""Config parity tests (cmd/root.go + server/app/app.go:86-107 viper
semantics): YAML file + EVENTSGATEWAY_ env overrides + reference
defaults, Go duration parsing, and the component factories."""

from __future__ import annotations

import textwrap

import pytest

from eventsgateway_spark.config import (
    EngineConfig,
    _parse_yaml_subset,
    loadtest_params,
    parse_duration,
)

REFERENCE_STYLE_YAML = textwrap.dedent(
    """
    # comment line
    kafka:
      producer:
        clientId: eventsgateway
        timeout: 250ms
        brokers: kafka:9092
    client:
      async: false
      channelBuffer: 500
      kafkatopic: default-topic
      maxRetries: 3
    loadtestclient:
      duration: 60s
      threads: 15
      randSleepCeilingMs: 500
      randPropsSize: small # small, medium, large, jumbo
    """
)


def _cfg(tmp_path, text=REFERENCE_STYLE_YAML) -> EngineConfig:
    p = tmp_path / "local.yaml"
    p.write_text(text)
    return EngineConfig.load(str(p))


def test_file_env_default_resolution(tmp_path, monkeypatch):
    cfg = _cfg(tmp_path)
    # file value
    assert cfg.get("kafka.producer.brokers") == "kafka:9092"
    assert cfg.get("client.channelBuffer") == 500
    assert cfg.get("client.async") is False
    # reference default when the file omits the key (app.go:94)
    assert cfg.get("kafka.producer.maxMessageBytes") == 1_000_000
    assert cfg.get("kafka.producer.topicPrefix") == "sv-uploads-"
    # env beats file (viper SetEnvPrefix + replacer)
    monkeypatch.setenv("EVENTSGATEWAY_KAFKA_PRODUCER_BROKERS", "other:9092")
    monkeypatch.setenv("EVENTSGATEWAY_CLIENT_MAXRETRIES", "7")
    assert cfg.get("kafka.producer.brokers") == "other:9092"
    assert cfg.get("client.maxRetries") == 7
    # unknown key -> caller default
    assert cfg.get("no.such.key", "fallback") == "fallback"


def test_duration_parsing(tmp_path):
    cfg = _cfg(tmp_path)
    assert cfg.get_duration("kafka.producer.timeout") == 0.25
    assert cfg.get_duration("loadtestclient.duration") == 60.0
    assert parse_duration("1m30s") == 90.0
    assert parse_duration(2) == 2.0
    with pytest.raises(ValueError):
        parse_duration("nonsense")


def test_fallback_parser_matches_reference_layout():
    """The dependency-free parser handles the reference config subset
    (nested maps, scalars, comments) identically to PyYAML."""
    data = _parse_yaml_subset(REFERENCE_STYLE_YAML)
    assert data["kafka"]["producer"]["brokers"] == "kafka:9092"
    assert data["client"]["channelBuffer"] == 500
    assert data["client"]["async"] is False
    assert data["loadtestclient"]["randPropsSize"] == "small"
    try:
        import yaml
    except ImportError:
        return
    assert data == yaml.safe_load(REFERENCE_STYLE_YAML)


def test_loadtest_params_mapping(tmp_path):
    lt = loadtest_params(_cfg(tmp_path))
    assert lt == {
        "threads": 15,
        "duration_s": 60.0,
        "sleep_ceiling_ms": 500,
        "props_size": "small",
    }


def test_component_factories(spark, tmp_path):
    from eventsgateway_spark.config import (
        gateway_from_config,
        serve_ingest_from_config,
    )

    cfg = _cfg(tmp_path)
    gw = gateway_from_config(spark, cfg)
    assert gw.default_topic == "default-topic"
    assert gw.max_message_bytes == 1_000_000
    server, port = serve_ingest_from_config(spark, cfg, sink=None, port=0)
    try:
        import json
        import urllib.request

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert r.status == 200
    finally:
        server.shutdown()


def test_fallback_parser_rejects_list_syntax():
    """The PyYAML-less subset parser must FAIL LOUDLY on '- item'
    list lines instead of silently dissolving them into bogus map
    keys (which would make e.g. a brokers list fall back to the
    baked-in default with no error)."""
    import pytest

    from eventsgateway_spark.config import _parse_yaml_subset

    with pytest.raises(ValueError, match="list syntax"):
        _parse_yaml_subset(
            "kafka:\n  producer:\n    brokers:\n      - kafka1:9092\n"
        )


def test_serve_ingest_default_host_is_loopback(spark, tmp_path):
    """ADVICE r6: the unauthenticated ingest endpoint must default to
    loopback; 0.0.0.0 is an explicit server.host opt-in."""
    from eventsgateway_spark.config import serve_ingest_from_config

    cfg = _cfg(tmp_path)
    assert cfg.get("server.host") is None  # not set by the fixture
    server, _port = serve_ingest_from_config(spark, cfg, sink=None, port=0)
    try:
        assert server.server_address[0] == "127.0.0.1"
    finally:
        server.shutdown()


def test_serve_ingest_grpc_transport_selection(spark, tmp_path):
    """server.transport: grpc routes to the gRPC server (or raises
    ImportError where grpcio is absent — this container)."""
    import pytest

    from eventsgateway_spark.config import serve_ingest_from_config
    from eventsgateway_spark.ingest_grpc import grpc_available

    cfg = _cfg(tmp_path)
    cfg._data.setdefault("server", {})["transport"] = "grpc"
    if grpc_available():
        server, port = serve_ingest_from_config(spark, cfg, sink=None, port=0)
        assert port > 0
        server.stop(0)
    else:
        with pytest.raises(ImportError):
            serve_ingest_from_config(spark, cfg, sink=None, port=0)
