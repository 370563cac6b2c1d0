"""Liveness HTTP surface (ST7): the reference's k8s probe endpoint.

The reference serves ``/actuator/health/liveness`` through Spring's
actuator, overriding the state with two CDC checks — stream up, and last
dequeued event within the inactivity window
(CustomLivenessIndicator.kt:35-64). This module is the ~30-line Spark
twin: a stdlib ``http.server`` on a daemon thread answering the same path
from :class:`listeners.LivenessListener` state — ``200 {"status":"UP"}``
while the tracked query progresses within the threshold, ``503
{"status":"DOWN"}`` when it stops or goes stale (the actuator's
UP/DOWN body + status-code contract, which is what a kubelet probes).

Ops-only surface: no Spark dependency beyond the listener object, safe on
the driver of any deployment. Use::

    listener = LivenessListener(inactivity_threshold_seconds=120)
    spark.streams.addListener(listener)
    server = start_liveness_server(listener, lambda: [q.id for q in
                                   spark.streams.active], port=0)
    ...
    server.shutdown()
"""

from __future__ import annotations

import json
import threading
from collections.abc import Callable, Iterable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

LIVENESS_PATH = "/actuator/health/liveness"


def start_liveness_server(
    listener,
    query_ids: Callable[[], Iterable],
    host: str = "127.0.0.1",
    port: int = 0,
) -> ThreadingHTTPServer:
    """Serve ``LIVENESS_PATH`` from ``listener`` state for the queries named
    by ``query_ids()`` (re-evaluated per probe, so restarts under new ids
    stay covered). UP iff at least one id is tracked and EVERY tracked id
    is alive — a dead or stale member breaks the pod, exactly the
    reference's single-stream semantics generalized to many queries.
    Returns the running server (``server_port`` tells the bound port when
    ``port=0``); callers own ``shutdown()``."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self) -> None:  # noqa: N802 - http.server contract
            if self.path != LIVENESS_PATH:
                self.send_response(404)
                self.end_headers()
                return
            ids = list(query_ids())
            up = bool(ids) and all(listener.is_alive(q) for q in ids)
            body = json.dumps({"status": "UP" if up else "DOWN"}).encode()
            self.send_response(200 if up else 503)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args) -> None:  # quiet: probes are periodic
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
