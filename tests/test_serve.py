"""HTTP server tests: health, pose inference, error paths."""

import base64
import http.client
import json

import numpy as np
import pytest

from tpupose.config import PoseConfig, InferenceConfig, ModelConfig
from tpupose.infer import PoseEstimator
from tpupose.serve import serve


@pytest.fixture(scope="module")
def server():
    cfg = PoseConfig(
        model=ModelConfig(num_stages=1, compute_dtype="float32"),
        inference=InferenceConfig(scale_search=(0.5,), max_peaks=16, max_people=16),
    )
    est = PoseEstimator(cfg)
    srv = serve(est, port=0)  # ephemeral port
    yield srv
    srv.shutdown()


def _conn(server):
    host, port = server.server_address[:2]
    return http.client.HTTPConnection(host, port, timeout=600)


def test_healthz(server):
    c = _conn(server)
    c.request("GET", "/healthz")
    r = c.getresponse()
    assert r.status == 200
    body = json.loads(r.read())
    assert body["status"] == "ok" and body["pretrained"] is False


def test_pose_roundtrip(server):
    import cv2

    img = np.random.default_rng(0).integers(0, 255, (96, 96, 3)).astype(np.uint8)
    ok, enc = cv2.imencode(".png", img)
    assert ok
    c = _conn(server)
    c.request("POST", "/pose?draw=1", body=enc.tobytes())
    r = c.getresponse()
    assert r.status == 200
    body = json.loads(r.read())
    assert isinstance(body["people"], list)
    png = base64.b64decode(body["overlay_png_b64"])
    overlay = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
    assert overlay.shape == (96, 96, 3)


def test_pose_bad_body(server):
    c = _conn(server)
    c.request("POST", "/pose", body=b"not an image")
    r = c.getresponse()
    assert r.status == 400
    assert "cannot decode" in json.loads(r.read())["error"]


def test_unknown_path(server):
    c = _conn(server)
    c.request("GET", "/nope")
    assert c.getresponse().status == 404
