"""HTTP health probe (reference A27 — the last Table-A row).

The reference serves a constant ``200 OK`` from a ring handler behind
http-kit (``/root/reference/src/lens/handler.clj:4-7``,
``server.clj:9-16`` lifecycle start/stop).  The engine twin keeps the
same contract on ``GET /health`` — 200 with a body whose first line is
``OK`` — and, because a Spark driver has real liveness state the
reference's constant handler didn't, degrades to ``503`` when the
SparkContext is stopped.  ``GET /health?full=1`` adds a JSON snapshot
(app id, executor-ish parallelism, active streaming queries) for
operators; the plain probe stays byte-cheap for load-balancer checks.

Stdlib-only (``http.server`` in a daemon thread) so the sandbox needs
no web framework; on a real deploy the same ``health_snapshot`` feeds
whatever serving stack fronts the driver.  This is ops surface, not a
dataflow operator — no ``queries()`` entry (SURVEY's call, VERDICT r7
concurring); the pytest drives it over a real socket.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit


def health_snapshot(spark) -> dict:
    """Liveness + a small ops snapshot.  ``status`` is ``"ok"`` iff the
    SparkContext is usable; everything else is best-effort detail."""
    try:
        sc = spark.sparkContext
        alive = not sc._jsc.sc().isStopped()
    except Exception:  # noqa: BLE001 — a dead/stopped session IS the signal
        return {"status": "down"}
    if not alive:
        return {"status": "down"}
    snap = {
        "status": "ok",
        "app_id": sc.applicationId,
        "default_parallelism": sc.defaultParallelism,
    }
    try:
        snap["active_streams"] = [
            {"name": q.name, "id": str(q.id), "active": q.isActive}
            for q in spark.streams.active
        ]
    except Exception:  # noqa: BLE001 — streams listing must not fail the probe
        snap["active_streams"] = None
    return snap


def serve_health(spark, port: int = 0) -> tuple[ThreadingHTTPServer, int]:
    """Start the probe on ``port`` (0 = ephemeral) in a daemon thread;
    returns ``(server, bound_port)``.  ``server.shutdown()`` stops it —
    the reference's component stop-fn (``server.clj:13-16``)."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — http.server API
            url = urlsplit(self.path)
            if url.path not in ("/health", "/"):
                self.send_error(404)
                return
            snap = health_snapshot(spark)
            ok = snap["status"] == "ok"
            body = "OK\n" if ok else "DOWN\n"
            # parsed, not a substring test: `?notfull=1` must NOT turn
            # on the verbose body the plain probe contract keeps cheap
            if parse_qs(url.query).get("full") == ["1"]:
                body += json.dumps(snap) + "\n"
            payload = body.encode()
            self.send_response(200 if ok else 503)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):  # quiet: probes fire every few seconds
            pass

    class Server(ThreadingHTTPServer):
        # the documented stop path is shutdown(); without closing the
        # listening socket too, every start/stop cycle leaks the bound
        # fd and a fixed port can never be re-bound (r8 review)
        def shutdown(self):  # noqa: A003 — deliberate override
            super().shutdown()
            self.server_close()

    server = Server(("127.0.0.1", port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]
