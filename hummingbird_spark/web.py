"""Progress web endpoint — the reference's monitoring UI re-expressed
over the engine's Progress arithmetic.

Reference: an HTTP server on port 3629 renders percent-complete, a
status-count chart, and an ETA line computed from task-status counts
(web_server.go:19-84: StartWebServer/handler; ETA extrapolation at
web_server.go:60-84 mirrors operators/metrics.py::Progress). Spark has
its own executor/stage UI on 4040, so this endpoint serves what Spark
does NOT know: namespace-level migration status.

Stdlib-only (ThreadingHTTPServer in a daemon thread); the tracker is a
driver-side object fed by run_migration — at 100 TB the per-namespace
counters stay tiny (one row per table), so serving them from driver
memory is the right design.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from hummingbird_spark.operators.metrics import Progress


@dataclass
class ProgressTracker:
    """Thread-safe namespace status counts (the workspace CountAllStatus
    analogue, web_server.go:56-66): added -> processing -> completed or
    failed, plus per-namespace copied-row counts."""

    started_at: float = field(default_factory=time.time)
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False)
    _status: dict[str, str] = field(default_factory=dict)
    _rows: dict[str, int] = field(default_factory=dict)

    def add(self, *namespaces: str) -> None:
        with self._lock:
            for ns in namespaces:
                self._status.setdefault(ns, "added")

    def start(self, ns: str) -> None:
        with self._lock:
            self._status[ns] = "processing"

    def complete(self, ns: str, rows: int = 0) -> None:
        with self._lock:
            self._status[ns] = "completed"
            self._rows[ns] = rows

    def fail(self, ns: str) -> None:
        with self._lock:
            self._status[ns] = "failed"

    def snapshot(self) -> dict:
        with self._lock:
            statuses = dict(self._status)
            rows = dict(self._rows)
        counts = {s: 0 for s in ("added", "processing", "completed",
                                 "failed")}
        for s in statuses.values():
            counts[s] = counts.get(s, 0) + 1
        total = len(statuses)
        prog = Progress(completed=counts["completed"], total=total,
                        started_at=self.started_at)
        eta = prog.eta_seconds()
        return {
            "ok": 1,
            "percent": round(prog.percent, 2),
            "counts": counts,
            "total": total,
            "rows_copied": sum(rows.values()),
            "namespaces": [
                {"ns": ns, "status": st, "rows": rows.get(ns, 0)}
                for ns, st in sorted(statuses.items())
            ],
            "eta_seconds": round(eta, 1) if eta is not None else None,
            "elapsed_seconds": round(time.time() - self.started_at, 1),
        }


_PAGE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta http-equiv="refresh" content="5">
<title>hummingbird_spark migration</title></head>
<body style="font-family: sans-serif">
<h2>Migration progress: {percent}%</h2>
<p>{eta_line}</p>
<table border="1" cellpadding="4"><tr><th>Status</th><th>Count</th></tr>
{rows}</table>
<p>Total rows copied: {rows_copied} &middot; elapsed {elapsed}s &middot;
raw JSON at <a href="/api/progress">/api/progress</a></p>
</body></html>"""


def _eta_line(snap: dict) -> str:
    # the reference's three-way ETA phrase (web_server.go:68-75)
    if snap["total"] and snap["percent"] >= 100.0:
        return "Initial data copy completed"
    if snap["counts"].get("processing"):
        n = snap["counts"]["processing"]
        suffix = (f", estimated {snap['eta_seconds']}s remaining"
                  if snap["eta_seconds"] is not None else "")
        return f"Copying {n} namespace(s){suffix}"
    return "Waiting for work"


class _Handler(BaseHTTPRequestHandler):
    tracker: ProgressTracker  # injected by start_web_server

    def log_message(self, fmt, *args):  # quiet: no per-request stderr
        pass

    def _send(self, code: int, ctype: str, body: bytes) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Access-Control-Allow-Origin", "*")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 (stdlib API name)
        snap = self.tracker.snapshot()
        if self.path.startswith("/api/progress"):
            self._send(200, "application/json",
                       json.dumps(snap).encode())
        elif self.path == "/favicon.ico":
            self._send(204, "image/x-icon", b"")
        elif self.path == "/":
            rows = "".join(
                f"<tr><td>{s}</td><td>{c}</td></tr>"
                for s, c in snap["counts"].items()
            )
            html = _PAGE.format(
                percent=snap["percent"], eta_line=_eta_line(snap),
                rows=rows, rows_copied=snap["rows_copied"],
                elapsed=snap["elapsed_seconds"],
            )
            self._send(200, "text/html", html.encode())
        else:
            self._send(404, "application/json",
                       json.dumps({"ok": 0, "message": "not found"})
                       .encode())


def start_web_server(tracker: ProgressTracker,
                     port: int = 3629) -> ThreadingHTTPServer:
    """Serve the tracker on localhost:port (0 = ephemeral; read the
    bound port from server.server_address). Runs in a daemon thread;
    call .shutdown() to stop. Default port matches the reference
    (-port 3629, neutrino.go)."""
    handler = type("BoundHandler", (_Handler,), {"tracker": tracker})
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
