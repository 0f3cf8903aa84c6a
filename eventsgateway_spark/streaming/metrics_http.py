"""Prometheus-style pull metrics endpoint (SURVEY §2.4 A1-A4).

The reference exposes its operational aggregations as Prometheus
collectors over HTTP (`metrics/metrics.go:47-76`: response-time
histogram with buckets {10,30,50,100,500}, per-(topic,status) event
counter, per-topic buffer gauge; registered on the serve mux in
`server/app/app.go`). The engine's semantic equivalents are the
``observe()`` counters (operators/metrics.py) and the A1-A3 windowed
queries — this module closes the remaining gap: a *pull endpoint*
in the Prometheus text exposition format, fed live from Structured
Streaming progress events.

Pieces:
- ``PrometheusRegistry`` — thread-safe counter/gauge/histogram store
  with the text-format renderer (no third-party client library; the
  exposition format is a stable public spec).
- ``ProgressMetricsListener`` — a ``StreamingQueryListener`` mapping
  every ``StreamingQueryProgress`` to the reference's metric family:
  rows processed → events counter, batch duration → response-time
  histogram observation, rows-behind/input-rate → buffer gauge, plus
  any ``observe()`` metrics attached to the stream.
- ``serve_metrics`` — stdlib HTTP server on a daemon thread.

Scale posture: metrics are O(label-cardinality) driver-side state fed
by progress callbacks the driver already receives; nothing touches the
executor hot path.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

try:  # PySpark >= 3.4 exposes the Python listener API
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover - ancient PySpark
    StreamingQueryListener = object  # type: ignore[assignment,misc]

# The reference's response-time SLO buckets (metrics/metrics.go:53).
RESPONSE_TIME_BUCKETS_MS = (10.0, 30.0, 50.0, 100.0, 500.0)


class PrometheusRegistry:
    """Minimal Prometheus collector registry + text renderer."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[tuple[str, tuple[tuple[str, str], ...]], float] = {}
        self._gauges: dict[tuple[str, tuple[tuple[str, str], ...]], float] = {}
        self._hist: dict[
            tuple[str, tuple[tuple[str, str], ...]],
            tuple[list[int], float, int],  # bucket counts, sum, count
        ] = {}
        self._hist_buckets: dict[str, tuple[float, ...]] = {}
        self._help: dict[str, tuple[str, str]] = {}  # name -> (type, help)

    @staticmethod
    def _key(name: str, labels: dict[str, str] | None):
        return name, tuple(sorted((labels or {}).items()))

    def _declare(self, name: str, mtype: str, help_: str) -> None:
        self._help.setdefault(name, (mtype, help_))

    def inc_counter(
        self, name: str, labels: dict[str, str] | None = None,
        value: float = 1.0, help: str = "",
    ) -> None:
        with self._lock:
            self._declare(name, "counter", help)
            k = self._key(name, labels)
            self._counters[k] = self._counters.get(k, 0.0) + value

    def set_gauge(
        self, name: str, value: float,
        labels: dict[str, str] | None = None, help: str = "",
    ) -> None:
        with self._lock:
            self._declare(name, "gauge", help)
            self._gauges[self._key(name, labels)] = value

    def observe_histogram(
        self, name: str, value: float,
        labels: dict[str, str] | None = None,
        buckets: tuple[float, ...] = RESPONSE_TIME_BUCKETS_MS, help: str = "",
    ) -> None:
        with self._lock:
            self._declare(name, "histogram", help)
            prior = self._hist_buckets.setdefault(name, buckets)
            if prior != buckets and buckets != RESPONSE_TIME_BUCKETS_MS:
                # silently bucketing against bounds the caller never
                # asked for would misrepresent the distribution with
                # no error — conflicting definitions must fail loudly
                raise ValueError(
                    f"histogram {name!r} already declared with buckets "
                    f"{prior}; conflicting definition {buckets}"
                )
            k = self._key(name, labels)
            counts, total, n = self._hist.get(
                k, ([0] * len(self._hist_buckets[name]), 0.0, 0)
            )
            for i, le in enumerate(self._hist_buckets[name]):
                if value <= le:
                    counts[i] += 1
            self._hist[k] = (counts, total + value, n + 1)

    @staticmethod
    def _esc(v: str) -> str:
        """Exposition-format label-value escaping (backslash, quote,
        newline) — an unescaped quote in a query/observation name
        would invalidate the WHOLE scrape, not just one series."""
        return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")

    @staticmethod
    def _fmt_labels(label_items: tuple[tuple[str, str], ...], extra: str = "") -> str:
        parts = [
            f'{k}="{PrometheusRegistry._esc(str(v))}"' for k, v in label_items
        ]
        if extra:
            parts.append(extra)
        return "{" + ",".join(parts) + "}" if parts else ""

    @staticmethod
    def _fmt_val(v: float) -> str:
        return str(int(v)) if float(v).is_integer() else repr(float(v))

    def render(self) -> str:
        """Prometheus text exposition format (version 0.0.4)."""
        with self._lock:
            out: list[str] = []
            emitted_header: set[str] = set()

            def header(name: str) -> None:
                if name in emitted_header:
                    return
                mtype, help_ = self._help.get(name, ("untyped", ""))
                if help_:
                    out.append(f"# HELP {name} {help_}")
                out.append(f"# TYPE {name} {mtype}")
                emitted_header.add(name)

            for (name, labels), v in sorted(self._counters.items()):
                header(name)
                out.append(f"{name}{self._fmt_labels(labels)} {self._fmt_val(v)}")
            for (name, labels), v in sorted(self._gauges.items()):
                header(name)
                out.append(f"{name}{self._fmt_labels(labels)} {self._fmt_val(v)}")
            for (name, labels), (counts, total, n) in sorted(self._hist.items()):
                header(name)
                # counts[] is maintained cumulatively (every bucket with
                # le >= value was incremented), matching Prometheus'
                # cumulative-bucket semantics directly
                for le, c in zip(self._hist_buckets[name], counts):
                    le_label = 'le="' + self._fmt_val(le) + '"'
                    out.append(
                        f"{name}_bucket{self._fmt_labels(labels, le_label)} {c}"
                    )
                inf_label = 'le="+Inf"'
                out.append(
                    f"{name}_bucket{self._fmt_labels(labels, inf_label)} {n}"
                )
                out.append(f"{name}_sum{self._fmt_labels(labels)} {self._fmt_val(total)}")
                out.append(f"{name}_count{self._fmt_labels(labels)} {n}")
            return "\n".join(out) + "\n"


class ProgressMetricsListener(StreamingQueryListener):
    """Maps StreamingQueryProgress to the reference's metric family
    (names mirror metrics/metrics.go, re-namespaced to the engine):

    - ``eventsgateway_events_total{query,status}`` counter — processed
      rows per micro-batch (AsyncClientEventsCounter analog)
    - ``eventsgateway_batch_duration_ms{query}`` histogram with the
      reference's {10,30,50,100,500} buckets (response-time analog)
    - ``eventsgateway_input_rows_per_second{query}`` gauge (buffer
      pressure analog)
    - every ``observe()`` metric on the stream surfaces as
      ``eventsgateway_observed_<metric>{query,observation}`` gauges
    """

    def __init__(self, registry: PrometheusRegistry) -> None:
        self.registry = registry

    def onQueryStarted(self, event) -> None:  # noqa: N802 (listener API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        q = {"query": p.name or p.id.__str__()}
        self.registry.inc_counter(
            "eventsgateway_events_total",
            {**q, "status": "ok"},
            float(p.numInputRows),
            help="rows processed per micro-batch by status",
        )
        dur = p.durationMs or {}
        total_ms = float(dur.get("triggerExecution", 0))
        self.registry.observe_histogram(
            "eventsgateway_batch_duration_ms",
            total_ms,
            q,
            help="micro-batch trigger execution time in ms",
        )
        self.registry.set_gauge(
            "eventsgateway_input_rows_per_second",
            float(p.inputRowsPerSecond or 0.0),
            q,
            help="current source input rate",
        )
        for obs_name, metrics in (p.observedMetrics or {}).items():
            for field, value in metrics.asDict().items():
                if isinstance(value, (int, float)) and value is not None:
                    self.registry.set_gauge(
                        f"eventsgateway_observed_{field}",
                        float(value),
                        {**q, "observation": obs_name},
                        help="observe() metric from the streaming plan",
                    )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def serve_metrics(
    registry: PrometheusRegistry, port: int = 0
) -> tuple[ThreadingHTTPServer, int]:
    """Serve ``registry`` at ``GET /metrics`` on a daemon thread;
    returns (server, bound_port). ``port=0`` binds an ephemeral port.
    Call ``server.shutdown()`` to stop."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path.rstrip("/") not in ("", "/metrics".rstrip("/")):
                self.send_response(404)
                self.end_headers()
                return
            body = registry.render().encode()
            self.send_response(200)
            self.send_header(
                "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence per-request stderr noise
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]
