"""K6 heartbeat — mirrors reference io/heartbeat_test.go:16-67: GET
received with uid/version params; HTTP 426 triggers the upgrade path
(reference SIGQUITs itself; we invoke the injected callback)."""

from __future__ import annotations

import http.server
import threading
import time

from k8stream_spark.io.heartbeat import Heartbeat, ping


class _Handler(http.server.BaseHTTPRequestHandler):
    status = 200
    seen: list[str] = []

    def do_GET(self):  # noqa: N802
        _Handler.seen.append(self.path)
        self.send_response(_Handler.status)
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


def _server():
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}/hook"


def test_ping_sends_uid_and_version():
    srv, url = _server()
    _Handler.status, _Handler.seen = 200, []
    try:
        assert ping(url, "u1", "0.0.5", timeout=2) == 200
        assert _Handler.seen and "uid=u1" in _Handler.seen[0]
        assert "version=0.0.5" in _Handler.seen[0]
    finally:
        srv.shutdown()


def test_upgrade_required_triggers_callback():
    srv, url = _server()
    _Handler.status, _Handler.seen = 426, []
    fired = threading.Event()
    hb = Heartbeat(url, "u1", "0.0.5", interval=0.05, timeout=2,
                   on_upgrade=fired.set)
    try:
        hb.start()
        assert fired.wait(timeout=5), "426 did not trigger on_upgrade"
    finally:
        hb.stop()
        srv.shutdown()


def test_heartbeat_survives_server_errors():
    hb = Heartbeat("http://127.0.0.1:1/nope", "u", "v", interval=0.02,
                   timeout=0.1, on_upgrade=lambda: None)
    hb.start()
    time.sleep(0.2)
    hb.stop()  # no exception despite connection failures
