"""Observability (reference operators A23/A24, P7).

The reference exposes Prometheus counters/gauges/histograms
(/root/reference/internal/metrics/metrics.go:30-63) — runs, processed
items, fixed emails, last-success timestamps, run/query duration
histograms — plus a /healthz endpoint pinging Postgres and the gRPC
source (internal/server/health.go:31-73).

Spark-native equivalents:
- per-batch data metrics ride the query itself via ``df.observe``
  (computed during execution, zero extra passes);
- run-level metrics come from a ``StreamingQueryListener``;
- health = source/sink reachability + active streaming queries.

Metric names keep the reference's ``hephaestus_*`` scheme so dashboards
port over.
"""

from __future__ import annotations

import http.server
import json
import threading
import time
from collections import defaultdict
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # StreamingQueryListener import path (PySpark >= 3.4)
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object


def observe_pipeline(df: DataFrame, name: str = "hephaestus") -> DataFrame:
    """Attach the reference's data-quality counters to a cleaning plan.

    Expects the employee-feed shape (id/email/phone). Observed metrics
    surface in QueryProgress.observedMetrics[name] for streaming, or via
    Observation for batch."""
    from hephaestus_spark.operators.cleaning import email_valid, phone_valid

    return df.observe(
        name,
        F.count(F.lit(1)).alias("hephaestus_processed_items_total"),
        F.sum((~email_valid(F.col("email"))).cast("long")).alias(
            "hephaestus_fixed_emails_total"
        ),
        F.sum((~phone_valid(F.col("phone"))).cast("long")).alias(
            "hephaestus_invalid_phones_total"
        ),
    )


class MetricsListener(StreamingQueryListener):
    """A23: run counters + duration histogram samples per query."""

    def __init__(self) -> None:
        self.runs_total: dict[str, int] = defaultdict(int)
        self.items_total: dict[str, int] = defaultdict(int)
        self.durations_ms: dict[str, list[float]] = defaultdict(list)
        self.last_success_ts: dict[str, float] = {}
        self.observed: dict[str, list[dict]] = defaultdict(list)

    # -- StreamingQueryListener interface --
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or p.id
        self.runs_total[name] += 1
        self.items_total[name] += p.numInputRows
        if p.durationMs and "triggerExecution" in p.durationMs:
            self.durations_ms[name].append(p.durationMs["triggerExecution"])
        self.last_success_ts[name] = time.time()
        if p.observedMetrics:
            self.observed[name].append(
                {k: v.asDict() for k, v in p.observedMetrics.items()}
            )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def snapshot(self) -> dict:
        return {
            "hephaestus_runs_total": dict(self.runs_total),
            "hephaestus_processed_items_total": dict(self.items_total),
            "hephaestus_run_duration_ms": {
                k: {"count": len(v), "sum": sum(v)} for k, v in self.durations_ms.items()
            },
            "hephaestus_last_success_timestamp": dict(self.last_success_ts),
        }


def prometheus_text(snapshot: dict) -> str:
    """Render a MetricsListener snapshot in Prometheus text exposition
    format (the reference serves promhttp at /metrics,
    internal/server/server.go:37). Counters and gauges carry a
    query="<name>" label; durations render as a summary's _count/_sum
    pair — enough for rate() and avg-duration dashboards to port."""
    lines: list[str] = []

    def esc(v: str) -> str:
        return str(v).replace("\\", r"\\").replace('"', r"\"")

    for metric, mtype in (
        ("hephaestus_runs_total", "counter"),
        ("hephaestus_processed_items_total", "counter"),
    ):
        lines.append(f"# TYPE {metric} {mtype}")
        for q, v in sorted(snapshot.get(metric, {}).items()):
            lines.append(f'{metric}{{query="{esc(q)}"}} {v}')
    lines.append("# TYPE hephaestus_run_duration_ms summary")
    for q, s in sorted(snapshot.get("hephaestus_run_duration_ms", {}).items()):
        lines.append(f'hephaestus_run_duration_ms_count{{query="{esc(q)}"}} {s["count"]}')
        lines.append(f'hephaestus_run_duration_ms_sum{{query="{esc(q)}"}} {s["sum"]}')
    lines.append("# TYPE hephaestus_last_success_timestamp gauge")
    for q, v in sorted(snapshot.get("hephaestus_last_success_timestamp", {}).items()):
        lines.append(f'hephaestus_last_success_timestamp{{query="{esc(q)}"}} {v}')
    return "\n".join(lines) + "\n"


@dataclass
class HealthChecker:
    """A24: /healthz semantics — each dependency pinged, JSON verdict.

    checks: name -> zero-arg callable returning True/raising.
    With ``metrics`` set, /metrics serves the listener's counters in
    Prometheus text format beside /healthz — the reference's promhttp
    route (server.go:37)."""

    spark: SparkSession
    checks: dict = field(default_factory=dict)
    metrics: MetricsListener | None = None

    def status(self) -> tuple[dict, int]:
        out = {}
        ok = True
        # the engine itself: session alive + streams healthy
        try:
            self.spark.sql("SELECT 1").collect()
            out["spark"] = "OK"
        except Exception as exc:  # pragma: no cover
            out["spark"] = f"failed: {exc}"
            ok = False
        for name, check in self.checks.items():
            try:
                out[name] = "OK" if check() else "failed"
                ok = ok and out[name] == "OK"
            except Exception as exc:
                out[name] = f"failed: {exc}"
                ok = False
        return out, (200 if ok else 503)

    def serve(self, port: int = 0) -> http.server.ThreadingHTTPServer:
        """Driver-side monitoring sidecar (server/server.go:25-67)."""
        checker = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path == "/metrics" and checker.metrics is not None:
                    payload = prometheus_text(checker.metrics.snapshot()).encode()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                    )
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                if self.path != "/healthz":
                    self.send_response(404)
                    self.end_headers()
                    return
                body, code = checker.status()
                payload = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a):  # silence
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv
