"""Opt-in loopback HTTP server for browsing exported artifacts.

Reference parity (mcp_server/local_artifact_server.py): a tiny static file
server rooted at the exports directory so client UIs can open dashboards and
report files the tools write; loopback-only by default, path-traversal safe,
with a /health endpoint and URL builder. Data-plane free — this serves bytes
the sinks already wrote.

The reference manages one process-global server wired to env vars; here the
server is an explicit object (start/stop in tests, several roots per
process) with the same env-var defaults.
"""

from __future__ import annotations

import ipaddress
import json
import os
import threading
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer


def _loopback(host: str) -> bool:
    if host in ("localhost", ""):
        return True
    try:
        return ipaddress.ip_address(host).is_loopback
    except ValueError:
        return False


class _ArtifactHandler(SimpleHTTPRequestHandler):
    root: str = "."

    def log_message(self, fmt, *args):
        pass

    def _resolved(self) -> str | None:
        """Map the URL path inside the root; None on traversal attempts.
        Resolve BOTH sides so ../ and symlink escapes are caught the same
        way (reference translate_path:145-169)."""
        rel = self.path.split("?", 1)[0].split("#", 1)[0].lstrip("/")
        target = os.path.realpath(os.path.join(self.root, rel))
        root = os.path.realpath(self.root)
        if target != root and not target.startswith(root + os.sep):
            return None
        return target

    def do_GET(self):
        if self.path == "/health":
            body = json.dumps({"status": "ok", "root": os.path.realpath(self.root)}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        target = self._resolved()
        if target is None:
            self.send_error(403)
            return
        if not os.path.isfile(target):
            self.send_error(404)
            return
        with open(target, "rb") as fh:
            data = fh.read()
        self.send_response(200)
        self.send_header("Content-Type", self.guess_type(target))
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


class ArtifactServer:
    """Static artifact server over ``root``. Loopback-only unless
    ``allow_bind_all`` (reference $ANALYST_MCP_ALLOW_BIND_ALL); non-loopback
    hosts fall back to 127.0.0.1 with the same posture as the reference."""

    def __init__(
        self,
        root: str | None = None,
        host: str | None = None,
        port: int = 0,
        allow_bind_all: bool | None = None,
    ):
        self.root = os.path.realpath(
            root or os.environ.get("ANALYST_MCP_ARTIFACT_ROOT", "exports")
        )
        host = (host or os.environ.get("ANALYST_MCP_ARTIFACT_SERVER_HOST", "127.0.0.1")).strip() or "127.0.0.1"
        if allow_bind_all is None:
            allow_bind_all = os.environ.get("ANALYST_MCP_ALLOW_BIND_ALL", "").strip().lower() in ("1", "true", "yes", "on")
        if not _loopback(host) and not allow_bind_all:
            host = "127.0.0.1"
        self.host = host
        handler = type("BoundArtifactHandler", (_ArtifactHandler,), {"root": self.root})
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def base_url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "ArtifactServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, name="artifact-http", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()

    def url_for(self, local_path: str) -> str:
        """URL for a file under the root; raises if the path escapes it
        (reference build_local_artifact_url:390-404)."""
        real = os.path.realpath(local_path)
        if real != self.root and not real.startswith(self.root + os.sep):
            raise ValueError(f"{local_path!r} is outside the artifact root {self.root!r}")
        return f"{self.base_url}/{os.path.relpath(real, self.root).replace(os.sep, '/')}"
