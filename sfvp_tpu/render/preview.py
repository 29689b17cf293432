"""Live preview — the headless replacement for the reference's GLFW window
and swapchain present loop (ref main.cpp:76-80, 674-682): a tiny stdlib
HTTP server that serves the most recent progressive frame as PNG behind an
auto-refreshing page. Zero dependencies; runs in a daemon thread.

Usage:
    pv = PreviewServer(port=8000)
    pv.update(img_f32)          # called by the driver at frame boundaries
    ...
    pv.close()
"""

from __future__ import annotations

import http.server
import threading
from typing import Optional

import numpy as np

from .png import tonemap_srgb_u8, tonemap_unorm_u8

_PAGE = b"""<!doctype html>
<html><head><title>sfvp_tpu live preview</title>
<style>body{background:#111;margin:0;display:grid;place-items:center;height:100vh}
img{image-rendering:pixelated;max-width:95vw;max-height:95vh}</style></head>
<body><img id="f" src="/frame.png">
<script>setInterval(()=>{document.getElementById('f').src='/frame.png?'+Date.now()},500)</script>
</body></html>"""


class PreviewServer:
    def __init__(self, port: int = 8000, host: str = "127.0.0.1",
                 srgb: bool = False):
        self._lock = threading.Lock()
        self._png: Optional[bytes] = None
        self._tonemap = tonemap_srgb_u8 if srgb else tonemap_unorm_u8
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path.startswith("/frame.png"):
                    with outer._lock:
                        data = outer._png
                    if data is None:
                        self.send_response(404)
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(data)))
                    self.send_header("Cache-Control", "no-store")
                    self.end_headers()
                    self.wfile.write(data)
                else:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_PAGE)

            def log_message(self, *a):  # silence request spam
                pass

        self._server = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def update(self, img) -> None:
        """img: (H, W, 3) float32 linear radiance."""
        from .png import encode_png

        data = encode_png(self._tonemap(np.asarray(img)), compress_level=3)
        with self._lock:
            self._png = data

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
