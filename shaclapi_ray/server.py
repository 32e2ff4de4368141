"""HTTP service surface mirroring the reference's Flask routes
(/root/reference/run.py:21-67) with the standard library only:

    POST /multiprocessing  ≙ run.py:21-34  -> api.run_job
    POST /validation       ≙ run.py:37-48  -> api.validation_and_statistics
    POST /reduce           ≙ run.py:51-62  -> api.only_reduce_shape_schema
    POST /incremental      (no reference analog) -> api.run_incremental
    POST /pipeline         (extension)     -> api.run_pipeline
    GET  /healthcheck      -> {"status": "ok"}

Bodies are JSON (the reference accepts form fields; JSON carries the
same keys — camelCase aliases included via api._norm_config). Responses
are JSON. The server is a thin shell over the library API: it owns no
Ray session of its own when embedded (make_server), and initialises one
only when run as a script (the CLI owns the session per the repo rule).

Run:  python -m shaclapi_ray.server --port 8080
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl

from shaclapi_ray import api


def _parse_body(handler: BaseHTTPRequestHandler) -> dict:
    length = int(handler.headers.get("Content-Length") or 0)
    raw = handler.rfile.read(length) if length else b""
    ctype = (handler.headers.get("Content-Type") or "").split(";")[0].strip()
    if ctype == "application/x-www-form-urlencoded":
        # the reference's request.form transport; values arrive as strings
        out: dict = {}
        for k, v in parse_qsl(raw.decode()):
            if v in ("true", "True"):
                out[k] = True
            elif v in ("false", "False"):
                out[k] = False
            else:
                out[k] = v
        return out
    return json.loads(raw.decode() or "{}")


class Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path == "/healthcheck":
            self._send(200, {"status": "ok"})
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        routes = {
            "/multiprocessing": api.run_job,
            "/validation": api.validation_and_statistics,
            "/reduce": api.only_reduce_shape_schema,
            "/incremental": api.run_incremental,
            "/pipeline": api.run_pipeline,  # extension: operator registry
        }
        fn = routes.get(self.path)
        if fn is None:
            self._send(404, {"error": f"unknown path {self.path}"})
            return
        try:
            config = _parse_body(self)
            self._send(200, fn(config))
        except (ValueError, KeyError) as e:
            self._send(400, {"error": str(e)})
        except Exception as e:  # mirror the reference's 500-on-failure
            self._send(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Embeddable server (port 0 = ephemeral). Caller owns the Ray
    session and the serve loop."""
    return ThreadingHTTPServer((host, port), Handler)


def main() -> None:
    import argparse

    import ray

    p = argparse.ArgumentParser(description="shaclapi_ray HTTP service")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args()
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    srv = make_server(args.host, args.port)
    try:
        print(f"serving on http://{args.host}:{srv.server_address[1]}")
        srv.serve_forever()
    finally:
        srv.server_close()
        ray.shutdown()


if __name__ == "__main__":
    main()
