"""Artifact HTTP server (sources/artifacts.py) — reference
local_artifact_server parity: static serving, traversal safety, health,
URL building, loopback posture."""

import json
import urllib.error
import urllib.request

import pytest

from analyst_toolkit_spark.sources.artifacts import ArtifactServer


@pytest.fixture()
def served(tmp_path):
    (tmp_path / "reports").mkdir()
    (tmp_path / "reports" / "dash.html").write_text("<html>ok</html>")
    (tmp_path / "secret_outside.txt").write_text("nope")
    root = tmp_path / "reports"
    srv = ArtifactServer(root=str(root), port=0).start()
    yield srv, root
    srv.stop()


def test_serves_files_and_health(served):
    srv, root = served
    with urllib.request.urlopen(f"{srv.base_url}/dash.html", timeout=10) as r:
        assert r.read() == b"<html>ok</html>"
        assert "text/html" in r.headers["Content-Type"]
    with urllib.request.urlopen(f"{srv.base_url}/health", timeout=10) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_traversal_and_missing(served):
    srv, _ = served
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{srv.base_url}/../secret_outside.txt", timeout=10)
    assert exc.value.code in (403, 404)  # urllib normalizes ../; raw socket check below
    import http.client

    host, port = srv._httpd.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("GET", "/../secret_outside.txt")
    assert conn.getresponse().status == 403  # un-normalized traversal refused
    conn.close()
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{srv.base_url}/missing.html", timeout=10)
    assert exc.value.code == 404


def test_url_for_inside_and_outside_root(served, tmp_path):
    srv, root = served
    url = srv.url_for(str(root / "dash.html"))
    with urllib.request.urlopen(url, timeout=10) as r:
        assert b"ok" in r.read()
    with pytest.raises(ValueError, match="outside the artifact root"):
        srv.url_for(str(tmp_path / "secret_outside.txt"))


def test_nonloopback_falls_back_to_loopback(tmp_path, monkeypatch):
    monkeypatch.delenv("ANALYST_MCP_ALLOW_BIND_ALL", raising=False)
    srv = ArtifactServer(root=str(tmp_path), host="0.0.0.0", port=0)
    try:
        assert srv.host == "127.0.0.1"
    finally:
        srv._httpd.server_close()
