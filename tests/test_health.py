"""A27 HTTP health probe: 200 OK alive, 503 when the context is gone
(reference handler.clj:4-7 serves the constant; we add real liveness)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from lens_sds_batch_spark.health import health_snapshot, serve_health


def _get(port: int, path: str):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_health_probe_alive_and_snapshot(spark):
    server, port = serve_health(spark)
    try:
        status, body = _get(port, "/health")
        assert status == 200 and body.startswith("OK")
        status, body = _get(port, "/health?full=1")
        assert status == 200
        snap = json.loads(body.splitlines()[1])
        assert snap["status"] == "ok"
        assert snap["app_id"] and snap["default_parallelism"] >= 1
        assert snap["active_streams"] == []  # nothing running in this test
        # parsed query param, not a substring test: ?notfull=1 stays cheap
        status, body = _get(port, "/health?notfull=1")
        assert status == 200 and body == "OK\n"
        status, _ = _get(port, "/nope")
        assert status == 404
    finally:
        server.shutdown()


def test_health_probe_degrades_to_503():
    """A dead/stopped session must read as DOWN — the constant-200
    reference handler can't distinguish; a Spark driver can and
    should."""

    class DeadSession:  # the shape health_snapshot touches
        @property
        def sparkContext(self):
            raise RuntimeError("SparkContext was shut down")

    assert health_snapshot(DeadSession()) == {"status": "down"}
    server, port = serve_health(DeadSession())
    try:
        status, body = _get(port, "/health")
        assert status == 503 and body.startswith("DOWN")
    finally:
        server.shutdown()


def test_health_snapshot_lists_active_streams(spark, tmp_path):
    """The ops snapshot must surface running streaming queries — the
    one piece of driver state an operator actually pages on."""
    q = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .writeStream.format("noop")
        .queryName("health_probe_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        snap = health_snapshot(spark)
        assert snap["status"] == "ok"
        assert any(s["name"] == "health_probe_stream" and s["active"]
                   for s in snap["active_streams"])
    finally:
        q.stop()
    assert all(
        s["name"] != "health_probe_stream" for s in health_snapshot(spark)["active_streams"]
    )
