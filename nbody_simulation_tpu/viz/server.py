"""Live browser viewer — the headless equivalent of the reference's window.

The reference opens a 1250x1250 winit window and presents every popped
snapshot (reference src/main.rs:83-99, :145-162). In a headless TPU
deployment the interactive surface is a browser: a stdlib HTTP server serves

- ``/``           an auto-refreshing HTML page with the frame and telemetry
- ``/frame.png``  the latest framebuffer as PNG
- ``/stats``      JSON: step, fps, ups, Counting phase seconds, drop count

A consumer thread pops snapshots from the engine queue at its own pace —
exactly the render thread's role — and keeps only the latest.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


from nbody_simulation_tpu.runtime.engine import Engine, Snapshot
from nbody_simulation_tpu.utils.pngio import save_png

_PAGE = b"""<!doctype html>
<html><head><title>nbody_simulation_tpu</title>
<style>
 body { background:#111; color:#ddd; font-family: monospace; text-align:center }
 img  { image-rendering: pixelated; border: 1px solid #333; max-width: 90vmin }
 pre  { color:#8f8 }
</style></head>
<body>
<h3>nbody_simulation_tpu &mdash; live</h3>
<img id="f" src="/frame.png">
<pre id="s"></pre>
<script>
 async function tick() {
   document.getElementById('f').src = '/frame.png?' + Date.now();
   try {
     const r = await fetch('/stats');
     document.getElementById('s').textContent =
         JSON.stringify(await r.json(), null, 1);
   } catch (e) {}
 }
 setInterval(tick, 250);
</script>
</body></html>
"""


class ViewerServer:
    """Serves the engine's latest snapshot over HTTP."""

    def __init__(self, engine: Engine, port: int = 8000, host: str = "127.0.0.1"):
        self.engine = engine
        self.latest: Snapshot | None = None
        self._png: bytes = b""
        self._lock = threading.Lock()
        self._fps_counter = 0
        self._fps = 0.0
        self._ups = 0.0
        self._last_step = 0
        self._t0 = time.monotonic()
        self._stopped = threading.Event()

        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def do_GET(self):
                if self.path.startswith("/frame.png"):
                    with viewer._lock:
                        body = viewer._png
                    ctype = "image/png"
                elif self.path.startswith("/stats"):
                    body = json.dumps(viewer.stats()).encode()
                    ctype = "application/json"
                else:
                    body = _PAGE
                    ctype = "text/html"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._http_thread = threading.Thread(
            target=self.httpd.serve_forever, name="viewer-http", daemon=True)
        self._consumer = threading.Thread(
            target=self._consume, name="viewer-consumer", daemon=True)

    def start(self) -> None:
        self._http_thread.start()
        self._consumer.start()

    def _consume(self) -> None:
        while not self._stopped.is_set():
            snap = self.engine.next_snapshot(timeout=1.0)
            if snap is None:
                if len(self.engine.queue) == 0 and self.engine._thread and \
                        not self.engine._thread.is_alive():
                    return
                continue
            buf = io.BytesIO()
            try:
                from PIL import Image
                Image.fromarray(snap.frame, "RGBA").save(buf, "PNG")
                png = buf.getvalue()
            except ImportError:
                import tempfile, os
                with tempfile.NamedTemporaryFile(suffix=".png",
                                                 delete=False) as f:
                    save_png(f.name, snap.frame)
                    png = open(f.name, "rb").read()
                    os.unlink(f.name)
            with self._lock:
                self.latest = snap
                self._png = png
                self._fps_counter += 1
                now = time.monotonic()
                dt = now - self._t0
                if dt >= 1.0:
                    self._fps = self._fps_counter / dt
                    self._ups = (snap.step - self._last_step) / dt
                    self._fps_counter = 0
                    self._last_step = snap.step
                    self._t0 = now

    def stats(self) -> dict:
        with self._lock:
            s = self.latest
            return {
                "step": 0 if s is None else s.step,
                "fps": round(self._fps, 2),
                "ups": round(self._ups, 2),
                "dropped": self.engine.dropped,
                "counting": None if s is None else {
                    "build_bvh": s.counting.build_bvh,
                    "sum_gravity": s.counting.sum_gravity,
                    "post_calculations": s.counting.post_calculations,
                },
            }

    def stop(self) -> None:
        self._stopped.set()
        self.httpd.shutdown()
