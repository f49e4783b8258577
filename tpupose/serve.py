"""HTTP inference server.

Production-serving counterpart of the reference's demo scripts: a
threaded stdlib HTTP server around one PoseEstimator. Endpoints:

  GET  /healthz          -> {"status": "ok", "pretrained": bool}
  POST /pose             -> people JSON for one encoded (jpg/png) image
  POST /pose?draw=1      -> adds a base64 PNG skeleton overlay

Requests funnel through a lock: JAX dispatch is single-stream per
process, and estimator jit caches are shared. Batching across requests
is deliberately out of scope for the stdlib server — large deployments
should drive ``PoseEstimator.stream`` from their own frontend.

Run: python -m tpupose.serve --port 8080 [--weights model.h5] [--scales 1]
"""

from __future__ import annotations

import argparse
import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_handler(estimator):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(
                    200, {"status": "ok", "pretrained": estimator.pretrained}
                )
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/pose"):
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n <= 0:
                    self._reply(400, {"error": "empty body"})
                    return
                data = self.rfile.read(n)
                import cv2

                image = cv2.imdecode(
                    np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR
                )
                if image is None:
                    self._reply(400, {"error": "cannot decode image"})
                    return
                draw = "draw=1" in (self.path.split("?", 1) + [""])[1]
                with lock:
                    out = estimator.process(image, draw=draw)
                resp = {"people": out["people"]}
                if draw:
                    ok, png = cv2.imencode(".png", out["canvas"])
                    if ok:
                        resp["overlay_png_b64"] = base64.b64encode(
                            png.tobytes()
                        ).decode()
                self._reply(200, resp)
            except Exception as e:  # pragma: no cover - defensive
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def serve(estimator, host: str = "127.0.0.1", port: int = 8080):
    """Returns the started ThreadingHTTPServer (caller owns shutdown)."""
    server = ThreadingHTTPServer((host, port), make_handler(estimator))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main(argv=None) -> int:
    from tpupose.cli import _add_common_model_args, _config
    from tpupose.infer import PoseEstimator

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    _add_common_model_args(ap)
    args = ap.parse_args(argv)

    est = PoseEstimator(_config(args), weights_path=args.weights)
    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(est)
    )
    print(f"serving on http://{args.host}:{args.port}  (pretrained={est.pretrained})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
