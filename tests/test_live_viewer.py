"""Live HTTP viewer (viz/live.py): the Viewer-thread equivalent
(src/Viewer.cc:73-190) must serve the page, both PNG panels, and the
status line to a real HTTP client while tracking updates it."""

import json
import urllib.request

import numpy as np

from orbslam2_dualcam_tpu.models.map import Map, KeyFrame
from orbslam2_dualcam_tpu.pipeline.tracking import HostFrame
from orbslam2_dualcam_tpu.viz.live import LiveViewer


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.read()


def _host_frame(rng, ncam=2, n=50):
    uv = rng.uniform(0, 600, (ncam, n, 2)).astype(np.float32)
    valid = np.ones((ncam, n), bool)
    mp_ids = np.where(rng.uniform(size=(ncam, n)) < 0.5,
                      rng.integers(0, 100, (ncam, n)), -1)
    f = HostFrame(frame_id=3, timestamp=0.1, uv=uv,
                  level=np.zeros((ncam, n), np.int32),
                  angle=np.zeros((ncam, n), np.float32),
                  desc=np.zeros((ncam, n, 8), np.uint32),
                  valid=valid, words=np.zeros((ncam, n), np.int32),
                  nodes=np.zeros((ncam, n), np.int32),
                  mp_ids=mp_ids)
    f.T_cw = np.eye(4)
    return f


def test_live_viewer_serves_panels(rng):
    m = Map()
    for i in range(5):
        kf = KeyFrame(kid=m.new_kid(), frame_id=i, T_cw=np.eye(4),
                      uv=np.zeros((16, 2), np.float32),
                      kp_cam=np.zeros(16, np.int32),
                      level=np.zeros(16, np.int32),
                      angle=np.zeros(16, np.float32),
                      desc=np.zeros((16, 8), np.uint32),
                      kp_valid=np.ones(16, bool),
                      mp_idx=np.full(16, -1, np.int64))
        m.add_keyframe(kf)
    for i in range(30):
        m.new_point(rng.normal(size=3), ref_kid=0, first_cam=0)

    v = LiveViewer(port=0, min_interval_s=0.0)
    try:
        images = rng.uniform(0, 255, (2, 120, 160)).astype(np.float32)
        frame = _host_frame(rng)
        v.update(images, frame, "OK", m, np.stack([np.eye(4), np.eye(4)]))

        code, body = _get(v.port, "/")
        assert code == 200 and b"frame.png" in body
        code, png = _get(v.port, "/frame.png")
        assert code == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
        code, png = _get(v.port, "/map.png")
        assert code == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
        code, body = _get(v.port, "/status.json")
        status = json.loads(body)
        assert status["state"] == "OK"
        assert status["n_keyframes"] == 5
        assert status["n_points"] == 30
        assert status["tracked"] > 0
    finally:
        v.close()


def test_live_viewer_throttles_but_updates_status(rng):
    m = Map()
    v = LiveViewer(port=0, min_interval_s=3600.0)
    try:
        images = rng.uniform(0, 255, (2, 60, 80)).astype(np.float32)
        frame = _host_frame(rng, n=10)
        v.update(images, frame, "OK", m, np.stack([np.eye(4), np.eye(4)]))
        # second update inside the throttle window: no re-render, but the
        # status line must still move (the reference redraws status text
        # every loop regardless of the 3D view rate)
        v.update(images, frame, "LOST", m, np.stack([np.eye(4), np.eye(4)]))
        code, body = _get(v.port, "/status.json")
        assert json.loads(body)["state"] == "LOST"
    finally:
        v.close()
