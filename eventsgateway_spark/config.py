"""Viper-style YAML configuration — the reference's operational surface.

The reference wires every component through a viper config: YAML file +
`EVENTSGATEWAY_`-prefixed env-var overrides + code defaults
(`cmd/root.go:61` loads `./config/local.yaml`; defaults at
`server/app/app.go:86-107`, `client/client.go:151-159`,
`client/async.go:55-91`). This module reproduces the semantics a user
actually depends on:

- dotted-key lookup (``cfg.get("kafka.producer.maxMessageBytes")``)
- defaults baked in from the reference's SetDefault calls
- env overrides: ``EVENTSGATEWAY_KAFKA_PRODUCER_BROKERS`` beats the
  file, exactly viper's ``SetEnvPrefix`` + ``_`` key replacer
- Go-style duration strings ("250ms", "60s", "1m30s") parsed to
  float seconds via :func:`parse_duration`

YAML handling: PyYAML when importable, else a built-in parser for the
nested-map/scalar subset the reference's config files actually use
(the engine must not grow a hard dependency this container doesn't
guarantee).

Factory helpers map config onto the engine's components:
``gateway_from_config`` (producer API), ``serve_ingest_from_config``
(the served S1), ``loadtest_params`` (tools/loadtest defaults, keys
from `config/local.yaml:29-33`).
"""

from __future__ import annotations

import os
import re
from typing import Any

ENV_PREFIX = "EVENTSGATEWAY_"

#: Reference defaults (server/app/app.go:86-107, client/client.go:151-159,
#: config/local.yaml). Only operationally meaningful keys are carried —
#: Go-runtime tuning (net.* socket timeouts) has no Spark analog but is
#: still retrievable from the file if present.
DEFAULTS: dict[str, Any] = {
    "kafka.producer.brokers": "localhost:9192",
    "kafka.producer.maxMessageBytes": 1_000_000,
    "kafka.producer.clientId": "eventsgateway",
    "kafka.producer.topicPrefix": "sv-uploads-",
    "client.kafkatopic": "default-topic",
    "client.batchSize": 50,
    "client.lingerInterval": "500ms",
    "client.channelBuffer": 500,
    "client.maxRetries": 3,
    "client.retryInterval": "1s",
    "client.async": False,
    "server.port": 5000,
    "prometheus.enabled": True,
    "prometheus.port": ":9091",
    "loadtestclient.duration": "60s",
    "loadtestclient.threads": 15,
    "loadtestclient.randSleepCeilingMs": 500,
    "loadtestclient.randPropsSize": "small",
}

_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ms|s|m|h)")
_DUR_UNIT = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0}


def parse_duration(v: Any) -> float:
    """Go duration string → seconds ("250ms" → 0.25, "1m30s" → 90.0).
    Bare numbers pass through as seconds."""
    if isinstance(v, (int, float)):
        return float(v)
    s = str(v).strip()
    pos, total = 0, 0.0
    for m in _DUR_RE.finditer(s):
        if m.start() != pos:
            raise ValueError(f"malformed duration {v!r}")
        total += float(m.group(1)) * _DUR_UNIT[m.group(2)]
        pos = m.end()
    if pos != len(s) or pos == 0:
        raise ValueError(f"malformed duration {v!r}")
    return total


def _coerce(s: str) -> Any:
    """Scalar coercion for the fallback parser + env overrides (viper
    reads env vars as strings and coerces at Get* time)."""
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def _parse_yaml_subset(text: str) -> dict:
    """Nested-map/scalar YAML subset (what the reference configs use):
    2-space indentation, `key: value` / `key:` lines, '#' comments."""
    root: dict = {}
    stack: list[tuple[int, dict]] = [(-1, root)]
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        if line.lstrip().startswith("- "):
            # list syntax is OUTSIDE this subset: parsing '- item' as a
            # map key would silently corrupt the config (e.g. a brokers
            # list dissolving into nonsense keys and the baked-in
            # default winning). Fail loudly; install PyYAML or inline
            # the list as a scalar (comma-joined) instead.
            raise ValueError(
                "YAML list syntax ('- item') is not supported by the "
                f"fallback parser (line: {line.strip()!r}); install PyYAML "
                "or use a comma-separated scalar"
            )
        indent = len(line) - len(line.lstrip())
        key, _, val = line.strip().partition(":")
        while stack and indent <= stack[-1][0]:
            stack.pop()
        parent = stack[-1][1]
        val = val.strip()
        if val == "":
            child: dict = {}
            parent[key] = child
            stack.append((indent, child))
        else:
            parent[key] = _coerce(val.strip("'\""))
    return root


class EngineConfig:
    """Dotted-key config with reference defaults + env overrides."""

    def __init__(self, data: dict | None = None):
        self._data = data or {}

    @classmethod
    def load(cls, path: str | None = None) -> "EngineConfig":
        """Load a YAML file (reference layout); ``None`` → defaults +
        env only."""
        if path is None:
            return cls({})
        with open(path) as f:
            text = f.read()
        try:
            import yaml  # type: ignore

            data = yaml.safe_load(text) or {}
        except ImportError:
            data = _parse_yaml_subset(text)
        return cls(data)

    def get(self, key: str, default: Any = None) -> Any:
        """Resolution order (viper's): env override → file → reference
        default → ``default`` argument."""
        env = os.environ.get(ENV_PREFIX + key.upper().replace(".", "_"))
        if env is not None:
            return _coerce(env)
        node: Any = self._data
        for part in key.split("."):
            if not isinstance(node, dict) or part not in node:
                node = None
                break
            node = node[part]
        if node is not None:
            return node
        if key in DEFAULTS:
            return DEFAULTS[key]
        return default

    def get_duration(self, key: str, default: Any = None) -> float:
        return parse_duration(self.get(key, default))


# ---------------------------------------------------------------------------
# Component factories
# ---------------------------------------------------------------------------


def gateway_from_config(spark, cfg: EngineConfig):
    """Producer API wired like the reference client: default topic from
    client.kafkatopic, size limit from kafka.producer.maxMessageBytes."""
    from eventsgateway_spark.gateway import Gateway

    return Gateway(
        spark,
        default_topic=cfg.get("client.kafkatopic"),
        max_message_bytes=int(cfg.get("kafka.producer.maxMessageBytes")),
    )


def serve_ingest_from_config(spark, cfg: EngineConfig, sink=None, port: int | None = None):
    """The served S1 bound per config (server.host/server.port; pass
    ``port=0`` for an ephemeral test port).

    Default host is LOOPBACK (ADVICE r6): the endpoint is
    unauthenticated, so off-box exposure must be an explicit opt-in —
    set ``server.host: 0.0.0.0`` in the config to bind all interfaces
    on a deployed gateway.

    ``server.transport: grpc`` serves the reference's native wire
    protocol instead of HTTP/JSON (requires the public grpcio package;
    ingest_grpc.serve_ingest_grpc). Both transports share the entire
    pipeline below request framing."""
    port_ = int(cfg.get("server.port")) if port is None else port
    host = str(cfg.get("server.host") or "127.0.0.1")
    max_bytes = int(cfg.get("kafka.producer.maxMessageBytes"))
    if str(cfg.get("server.transport") or "http").lower() == "grpc":
        from eventsgateway_spark.ingest_grpc import serve_ingest_grpc

        return serve_ingest_grpc(
            spark, sink=sink, port=port_, max_message_bytes=max_bytes, host=host
        )
    from eventsgateway_spark.ingest_http import serve_ingest

    return serve_ingest(
        spark, sink=sink, port=port_, max_message_bytes=max_bytes, host=host
    )


def loadtest_params(cfg: EngineConfig) -> dict:
    """tools/loadtest.run_loadtest kwargs from loadtestclient.* keys
    (config/local.yaml:29-33)."""
    return {
        "threads": int(cfg.get("loadtestclient.threads")),
        "duration_s": cfg.get_duration("loadtestclient.duration"),
        "sleep_ceiling_ms": int(cfg.get("loadtestclient.randSleepCeilingMs")),
        "props_size": cfg.get("loadtestclient.randPropsSize"),
    }
