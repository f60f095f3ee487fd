"""Live viewer service: the RsViewer Loop analog (rs_viewer.cpp:67-117).

The reference's viewer polls the driver for frames, renders each fresh one
into an interactive SubprocessViewer window, sleeps interval/8 when the
frame is stale, and optionally records every rendered frame
(rs_viewer.cpp:82-112). A TPU pod is headless, so the "window" here is an
HTTP service: `LiveServer` holds the latest rendered PNG and serves

  GET /           self-refreshing HTML page (the live view)
  GET /frame.png  latest frame
  GET /stream     multipart/x-mixed-replace PNG stream (MJPEG-style)
  GET /status     JSON side-channel (frame index, pose, fps)

plus an optional atomically-updated `latest.png` on disk for file
watchers. `viewer_loop` reproduces the exact Loop semantics over a
FrameStream source: poll -> render fresh frames -> sleep interval/8 when
stale -> record.

No third-party deps: PNG encoding is stdlib zlib, the server is
http.server in a daemon thread.
"""

from __future__ import annotations

import json
import os
import struct
import threading
import time
import zlib

import numpy as np

_INDEX_HTML = b"""<!doctype html>
<html><head><title>rs-viewer live</title><style>
body { background: #111; color: #ddd; font-family: monospace; margin: 1em; }
img { max-width: 100%; image-rendering: pixelated; }
</style></head><body>
<div id="status">connecting...</div>
<img id="view" src="/frame.png">
<script>
const img = document.getElementById('view');
const status = document.getElementById('status');
async function tick() {
  img.src = '/frame.png?t=' + Date.now();
  try {
    const s = await (await fetch('/status')).json();
    status.textContent = JSON.stringify(s);
  } catch (e) {}
}
setInterval(tick, 200);
</script></body></html>
"""


def encode_png(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> PNG bytes (stdlib zlib only)."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    # Filter byte 0 (None) prepended to every scanline.
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# Small viridis-like colormap (anchor colors, linearly interpolated).
_CMAP = np.asarray(
    [
        [68, 1, 84],
        [59, 82, 139],
        [33, 145, 140],
        [94, 201, 98],
        [253, 231, 37],
    ],
    np.float32,
)


def depth_to_rgb(depth: np.ndarray, max_depth: float = 5.0) -> np.ndarray:
    """Depth (H, W) meters -> (H, W, 3) uint8; invalid (<= 0, NaN/inf) is
    black. Non-finite pixels must be zeroed BEFORE the colormap index
    math: floor(NaN).astype(int32) is INT32_MIN, which would crash the
    _CMAP gather (and with it the whole viewer loop)."""
    d = np.asarray(depth, np.float32)
    d = np.where(np.isfinite(d), d, 0.0)
    t = np.clip(d / max_depth, 0.0, 1.0) * (len(_CMAP) - 1)
    lo = np.floor(t).astype(np.int32)
    hi = np.minimum(lo + 1, len(_CMAP) - 1)
    frac = (t - lo)[..., None]
    rgb = _CMAP[lo] * (1.0 - frac) + _CMAP[hi] * frac
    rgb[d <= 0.0] = 0.0
    return rgb.astype(np.uint8)


class LiveServer:
    """Thread-backed HTTP service holding the latest rendered frame."""

    def __init__(self, port: int = 0, host: str = "127.0.0.1"):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self._lock = threading.Condition()
        self._png: bytes = encode_png(np.zeros((2, 2, 3), np.uint8))
        self._seq = 0
        self._status: dict = {}
        server_self = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                # The index page polls /frame.png every 200 ms, so client
                # disconnects mid-write are ROUTINE -- swallow them instead
                # of letting socketserver dump a traceback per navigation.
                try:
                    self._do_get()
                except (BrokenPipeError, ConnectionResetError):
                    pass

            def _do_get(self):
                path = self.path.split("?")[0]
                if path == "/":
                    self._send(200, "text/html", _INDEX_HTML)
                elif path == "/frame.png":
                    with server_self._lock:
                        body = server_self._png
                    self._send(200, "image/png", body)
                elif path == "/status":
                    with server_self._lock:
                        body = json.dumps(server_self._status).encode()
                    self._send(200, "application/json", body)
                elif path == "/stream":
                    # MJPEG-style multipart stream of PNGs: push every new
                    # frame as it arrives (the truly-live endpoint).
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=frame",
                    )
                    self.end_headers()
                    seen = -1
                    try:
                        while True:
                            with server_self._lock:
                                server_self._lock.wait_for(
                                    lambda: server_self._seq != seen, timeout=5.0
                                )
                                body, seen = server_self._png, server_self._seq
                            self.wfile.write(
                                b"--frame\r\nContent-Type: image/png\r\n"
                                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                            )
                            self.wfile.write(body + b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        return
                else:
                    self._send(404, "text/plain", b"not found")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def update(self, png: bytes, status: dict | None = None) -> None:
        with self._lock:
            self._png = png
            if status is not None:
                self._status = status
            self._seq += 1
            self._lock.notify_all()

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()


def write_latest_png(path: str, png: bytes) -> None:
    """Atomic latest-frame update (tmp + rename) for file watchers."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(png)
    os.replace(tmp, path)


def viewer_loop(
    stream,
    on_frame,
    frame_interval_s: float = 0.0,
    max_frames: int | None = None,
    sleep=time.sleep,
) -> int:
    """The Loop (rs_viewer.cpp:67-117): poll the source; STALE frames sleep
    interval/8 (rs_viewer.cpp:82-86); fresh frames go to on_frame(ts, frame)
    (render + record, :90-112). Returns the number of frames shown.

    stream: anything with .poll() -> (ts, frame) | None and .exhausted.
    """
    shown = 0
    stale_sleep = max(frame_interval_s / 8.0, 1e-3)
    while max_frames is None or shown < max_frames:
        item = stream.poll()
        if item is None:
            if stream.exhausted:
                break
            sleep(stale_sleep)
            continue
        on_frame(*item)
        shown += 1
    return shown
