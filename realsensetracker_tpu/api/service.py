"""Tracking-as-a-service: POST depth frames over HTTP, get SE(3) poses back.

The reference is a single-process CLI tool; a production TPU deployment is
a long-lived service fed by remote producers. `TrackingService` wraps any
tracker with a `.process(depth, ts, ...)` method (api.Tracker,
tracking.slam.SlamTracker) in a stdlib ThreadingHTTPServer:

  POST /track        body = .npy (H, W) float32 depth, or .npz with keys
                     depth [+ color] for RGB-D methods; optional ?ts=SECONDS
                     -> JSON {frame, success, pose, rmse, inlier_fraction, ms}
  GET  /pose         latest pose + frame counter
  GET  /status       service + per-session tracker stats
  GET  /trajectory   full trajectory, TUM text format
  POST /reset        fresh tracker state (new trajectory)

Every endpoint takes ?session=NAME (default "default"): each session is an
independent tracker created on first use, so N producers track N
independent streams against one device (the serving analog of BASELINE
config 5's multi-stream tracking).

One device dispatch at a time: a lock serializes /track requests (TPU
programs are single-stream; concurrent dispatch through the relay
deadlocks), so N producers can POST concurrently and get queued, ordered
results. The client side is `post_frame` / `get_json` (stdlib urllib).
"""

from __future__ import annotations

import io
import json
import threading
import time
import urllib.request

import numpy as np


def _current_pose(tracker) -> np.ndarray:
    pose = getattr(tracker, "pose", None)
    if pose is None:
        traj = tracker.trajectory
        pose = traj.poses[-1] if len(traj) else np.eye(4)
    return np.asarray(pose, np.float64)


def _result_record(res, frame: int, ms: float) -> dict:
    rec = {"frame": frame, "ms": round(ms, 3)}
    for key in ("success", "rmse", "inlier_fraction"):
        if hasattr(res, key):
            val = getattr(res, key)
            rec[key] = bool(val) if key == "success" else float(val)
    pose = np.asarray(res.pose, np.float64)
    rec["pose"] = [[round(float(v), 9) for v in row] for row in pose]
    return rec


class TrackingService:
    """HTTP frame-in/pose-out tracking service around a tracker factory."""

    def __init__(self, make_tracker, host: str = "127.0.0.1", port: int = 0,
                 max_frames: int | None = None):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self._make_tracker = make_tracker
        self._lock = threading.Lock()  # serializes device dispatches
        self._sessions: dict = {}  # name -> (tracker, frame_count)
        self._frames = 0  # total across sessions
        self._started = time.time()
        self._max_frames = max_frames
        self.done = threading.Event()  # set once max_frames frames tracked
        svc = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, body: bytes,
                      ctype: str = "application/json") -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_json(self, obj, code: int = 200) -> None:
                self._send(code, json.dumps(obj).encode())

            def _session(self) -> str:
                if "session=" in self.path:
                    return self.path.split("session=")[1].split("&")[0] or "default"
                return "default"

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/pose":
                    with svc._lock:
                        tracker, frames = svc._get_session(self._session())
                        pose = _current_pose(tracker)
                    self._send_json({
                        "frame": frames,
                        "pose": [[float(v) for v in row] for row in pose],
                    })
                elif path == "/status":
                    self._send_json(svc.status())
                elif path == "/trajectory":
                    with svc._lock:
                        tracker, _ = svc._get_session(self._session())
                        text = tracker.trajectory.to_tum()
                    self._send(200, text.encode(), "text/plain")
                else:
                    self._send(404, b"not found", "text/plain")

            def do_POST(self):
                path = self.path.split("?")[0]
                if path == "/reset":
                    name = self._session()
                    with svc._lock:
                        svc._sessions.pop(name, None)
                    self._send_json({"reset": True, "session": name})
                    return
                if path != "/track":
                    self._send(404, b"not found", "text/plain")
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    depth, color = _decode_frame(self.rfile.read(n))
                    ts = None
                    if "ts=" in self.path:
                        ts = float(self.path.split("ts=")[1].split("&")[0])
                except Exception as e:  # malformed request, not a crash
                    self._send_json({"error": str(e)}, code=400)
                    return
                try:
                    name = self._session()
                    with svc._lock:
                        tracker, n = svc._get_session(name)
                        t0 = time.perf_counter()
                        kwargs = {}
                        if color is not None:
                            # api.Tracker takes color=, SlamTracker gray=.
                            key = ("gray" if "gray" in
                                   tracker.process.__code__.co_varnames
                                   else "color")
                            kwargs[key] = color
                        res = tracker.process(depth, ts, **kwargs)
                        ms = 1000 * (time.perf_counter() - t0)
                        svc._sessions[name] = (tracker, n + 1)
                        svc._frames += 1
                        frames = n + 1
                        total = svc._frames
                    self._send_json(_result_record(res, frames, ms))
                except Exception as e:
                    self._send_json({"error": str(e)}, code=500)
                    return
                # max_frames bounds the TOTAL across sessions.
                if svc._max_frames is not None and total >= svc._max_frames:
                    svc.done.set()

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def _get_session(self, name: str):
        """Caller must hold self._lock. Creates the session on first use."""
        if name not in self._sessions:
            self._sessions[name] = (self._make_tracker(), 0)
        return self._sessions[name]

    def status(self) -> dict:
        with self._lock:
            sessions = {}
            for name, (tracker, n) in self._sessions.items():
                rec = {"frames": n, "tracker": type(tracker).__name__}
                kf = getattr(tracker, "keyframe_count", None)
                if kf is not None:
                    rec["keyframes"] = int(kf)
                sessions[name] = rec
            out = {
                "frames": self._frames,
                "uptime_s": round(time.time() - self._started, 1),
                "sessions": sessions,
            }
            if "default" in sessions:
                out["tracker"] = sessions["default"]["tracker"]
                if "keyframes" in sessions["default"]:
                    out["keyframes"] = sessions["default"]["keyframes"]
        return out

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()


def _decode_frame(body: bytes):
    """Request body -> (depth (H, W) f32, color | None).

    .npy = a single depth array; .npz (zip magic) = 'depth' [+ 'color'].
    """
    buf = io.BytesIO(body)
    if body[:2] == b"PK":
        with np.load(buf) as z:
            if "depth" not in z:
                raise ValueError(".npz body needs a 'depth' array")
            depth = np.asarray(z["depth"], np.float32)
            color = np.asarray(z["color"]) if "color" in z else None
        return depth, color
    arr = np.load(buf, allow_pickle=False)
    return np.asarray(arr, np.float32), None


# -- stdlib client helpers ---------------------------------------------------

def post_frame(base_url: str, depth, ts: float | None = None,
               color=None, session: str | None = None,
               timeout: float = 120.0) -> dict:
    """Client: POST one frame to a TrackingService; returns the JSON record."""
    buf = io.BytesIO()
    if color is not None:
        np.savez(buf, depth=np.asarray(depth, np.float32),
                 color=np.asarray(color))
    else:
        np.save(buf, np.asarray(depth, np.float32))
    url = base_url.rstrip("/") + "/track"
    params = []
    if ts is not None:
        params.append(f"ts={ts}")
    if session is not None:
        params.append(f"session={session}")
    if params:
        url += "?" + "&".join(params)
    req = urllib.request.Request(
        url, data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def get_json(base_url: str, path: str, timeout: float = 30.0):
    with urllib.request.urlopen(
        base_url.rstrip("/") + path, timeout=timeout
    ) as r:
        body = r.read()
    if r.headers.get("Content-Type", "").startswith("application/json"):
        return json.loads(body)
    return body.decode()
