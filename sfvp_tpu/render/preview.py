"""Live preview — the headless replacement for the reference's GLFW window
and swapchain present loop (ref main.cpp:76-80, 674-682): a tiny stdlib
HTTP server in a daemon thread. Zero dependencies.

Two endpoints:
  /            auto-connecting page (stream with poll fallback)
  /stream      PUSH stream (multipart/x-mixed-replace): a new PNG part is
               pushed the moment the driver publishes a frame, so the
               browser tracks step cadence exactly — the "watch it
               converge" experience of the reference's present loop
  /frame.png   latest frame (pull; kept for curl/scripts)

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

_BOUNDARY = b"sfvpframe"

_PAGE = b"""<!doctype html>
<html><head><title>sfvp_tpu live preview</title>
<style>body{background:#111;margin:0;display:grid;place-items:center;height:100vh}
img{image-rendering:pixelated;max-width:95vw;max-height:95vh}</style></head>
<body><img id="f" src="/stream">
<script>
// fallback to polling if the push stream errors out (e.g. proxies)
document.getElementById('f').onerror = () => {
  const f = document.getElementById('f');
  f.onerror = null;
  f.src = '/frame.png';
  setInterval(() => { f.src = '/frame.png?' + Date.now(); }, 500);
};
</script>
</body></html>"""


class PreviewServer:
    def __init__(self, port: int = 8000, host: str = "127.0.0.1",
                 srgb: bool = False):
        self._cond = threading.Condition()
        self._png: Optional[bytes] = None
        self._seq = 0
        self._closing = False
        self._tonemap = tonemap_srgb_u8 if srgb else tonemap_unorm_u8
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path.startswith("/stream"):
                    self._stream()
                elif self.path.startswith("/frame.png"):
                    with outer._cond:
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

            def _stream(self):
                """Push parts as frames arrive (multipart/x-mixed-replace,
                the classic MJPEG mechanism, with PNG parts)."""
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary="
                    + _BOUNDARY.decode(),
                )
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                seen = -1
                try:
                    while True:
                        with outer._cond:
                            fresh = outer._cond.wait_for(
                                lambda: outer._closing
                                or (outer._png is not None
                                    and outer._seq != seen),
                                timeout=10.0,
                            )
                            if outer._closing:
                                return
                            if not fresh:
                                continue  # timeout: no new frame, don't
                                # resend the previous one
                            data, seen = outer._png, outer._seq
                        if data is None:
                            continue  # timeout before the first frame
                        self.wfile.write(
                            b"--" + _BOUNDARY + b"\r\n"
                            b"Content-Type: image/png\r\n"
                            b"Content-Length: "
                            + str(len(data)).encode() + b"\r\n\r\n"
                            + data + b"\r\n"
                        )
                        self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    return  # client went away

            def log_message(self, *a):  # silence request spam
                pass

        self._server = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def update(self, img) -> None:
        """img: (H, W, 3) float32 linear radiance. Publishes the frame and
        wakes every connected /stream client."""
        from .png import encode_png

        data = encode_png(self._tonemap(np.asarray(img)), compress_level=3)
        with self._cond:
            self._png = data
            self._seq += 1
            self._cond.notify_all()

    def close(self) -> None:
        with self._cond:
            self._closing = True
            self._cond.notify_all()
        self._server.shutdown()
        self._server.server_close()
