"""REST job API (SURVEY §3.2): the reference's control plane
(`internal/api/server.go`, `internal/api/handlers.go`) over the Spark
job registry.

Routes (same lifecycle and codes as the reference):
- POST   /jobs       → 202 {"job_id": …}   (handlers.go:55-95)
- GET    /jobs/{id}  → 200 status struct   (handlers.go:164-175)
- DELETE /jobs/{id}  → 200 cancelled       (handlers.go:178-198)

The job body carries the indexer request (`models.go:11-18`):
start_block, contracts, storage — validated like
buildConfigFromRequest (handlers.go:215-277). Execution = the batch
decode pipeline over a pre-landed raw-log path (or an injected
fetcher). stdlib http.server: the API is control plane; the data
plane never passes through it.
"""

from __future__ import annotations

import json
import re
import threading
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

from pyspark.sql import SparkSession

from .jobs import JobRegistry

JOB_PATH = re.compile(r"^/jobs/([0-9a-f]{32})$")


def make_server(spark: SparkSession, port: int,
                runner: Optional[Callable[[SparkSession, dict], None]] = None
                ) -> ThreadingHTTPServer:
    """Build the HTTP server; ``runner(spark, request_body)`` does the
    actual indexing work (injected so tests run without RPC)."""
    registry = JobRegistry(spark)
    run = runner or _default_runner

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: dict) -> None:
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # quiet test output; reference logs via middleware
            pass

        def do_POST(self):
            if self.path != "/jobs":
                return self._send(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._send(400, {"error": "invalid JSON body"})
            problems = _validate(body)
            if problems:
                return self._send(400, {"error": problems})
            job_id = registry.submit(lambda s, b=body: run(s, b))
            self._send(202, {"job_id": job_id})

        def do_GET(self):
            m = JOB_PATH.match(self.path)
            if not m:
                return self._send(404, {"error": "not found"})
            try:
                st = registry.get(m.group(1))
            except KeyError:
                return self._send(404, {"error": "unknown job"})
            self._send(200, asdict(st))

        def do_DELETE(self):
            m = JOB_PATH.match(self.path)
            if not m:
                return self._send(404, {"error": "not found"})
            try:
                st = registry.cancel(m.group(1))
            except KeyError:
                return self._send(404, {"error": "unknown job"})
            self._send(200, asdict(st))

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    server.registry = registry  # exposed for tests
    return server


def _validate(body: dict) -> Optional[str]:
    """Request validation mirroring handlers.go:62-79."""
    if not body.get("contracts"):
        return "at least one contract is required"
    for c in body["contracts"]:
        if not c.get("address"):
            return "contract address is required"
    storage = (body.get("storage") or {}).get("type", "csv")
    if storage not in ("csv", "parquet", "jdbc"):
        return f"unsupported storage type {storage!r}"
    return None


def _default_runner(spark: SparkSession, body: dict) -> None:
    """Index pre-landed raw logs per the request: decode each
    configured event and write to the requested sink."""
    from .sources.abi import parse_abi, decode_event
    from .sources.evm_logs import read_raw_logs
    from .sources.sinks import write_event_csv, write_event_parquet

    raw_path = body["raw_logs_path"]
    out = body.get("storage", {}).get("path", "./output")
    stype = body.get("storage", {}).get("type", "csv")
    for c in body["contracts"]:
        events = parse_abi(c["abi"])
        wanted = c.get("events") or list(events)
        raw = read_raw_logs(spark, raw_path, addresses=(c["address"],))
        for name in wanted:
            decoded = decode_event(raw, events[name], contract_name=c["name"])
            if stype == "parquet":
                write_event_parquet(decoded, out)
            else:
                write_event_csv(decoded.drop(*[
                    f.name for f in decoded.schema.fields
                    if f.dataType.typeName() == "decimal"]), out)


def serve_forever_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t
