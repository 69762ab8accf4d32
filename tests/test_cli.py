"""CLI + reference-YAML parity: parse the reference's own settings file and
run the video driver end-to-end on a tiny synthetic video."""

import os
import subprocess
import sys

import numpy as np
import pytest

from orbslam2_dualcam_tpu.utils.yaml_config import load_rig_yaml

REF_YAML = "/root/reference/Dual-LenaCV.yaml"


pytestmark = pytest.mark.slow

@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="no reference yaml")
def test_load_reference_yaml():
    cfg = load_rig_yaml(REF_YAML)
    assert cfg.n_cameras == 2
    cam0, cam1 = cfg.cameras
    assert abs(cam0.fx - 558.47) < 0.01        # Dual-LenaCV.yaml Camera0.fx
    assert abs(cam1.fx - 546.60) < 0.01
    # cam0 extrinsic is identity; cam1 rotated ~69deg with ~10cm baseline
    assert np.allclose(cam0.q_sc, (1, 0, 0, 0))
    t1 = np.asarray(cam1.t_sc)
    assert abs(np.linalg.norm(t1) - 0.0997) < 0.01
    assert cfg.orb.n_features == 1000
    assert cfg.orb.n_levels == 8
    assert cfg.fps == 30.0


def test_video_cli_end_to_end(tmp_path):
    import cv2

    from orbslam2_dualcam_tpu.utils import synthetic

    # render a small mono video of the textured room
    rng = np.random.default_rng(0)
    world = synthetic.make_box_world(rng, half=6.0, tex_size=256)
    K = np.array([[130.0, 0, 80], [0, 130, 60], [0, 0, 1]])
    vid = str(tmp_path / "seq.avi")
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 30, (160, 120))
    for T in synthetic.orbit_trajectory(16, radius=1.5,
                                        total_angle=0.4 * np.pi):
        img = synthetic.render(world, K, T, H=120, W=160).astype(np.uint8)
        wr.write(cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))
    wr.release()

    yaml = tmp_path / "rig.yaml"
    yaml.write_text("""%YAML:1.0
nCameras: 1
Camera0.fx: 130.0
Camera0.fy: 130.0
Camera0.cx: 80.0
Camera0.cy: 60.0
Camera.width: 160
Camera.height: 120
Camera.fps: 30.0
Camera.RGB: 1
ORBextractor.nFeatures: 200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 3
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "orbslam2_dualcam_tpu.run",
         "--settings", str(yaml), "--video", vid, "--out", str(out),
         "--mono", "--no-loop", "--cpu"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr
    assert (out / "FramePoseTcw.txt").exists()
    assert (out / "map.npz").exists()
    lines = (out / "FramePoseTcw.txt").read_text().strip().splitlines()
    assert len(lines) >= 5, r.stdout


def test_video_cli_orbvoc_bin(tmp_path):
    """--vocab accepts the reference's DBoW2 binary artifact directly, like
    dual_slam_video.cpp:45-52's first positional arg (System.cc:88-102)."""
    import struct

    import cv2

    from orbslam2_dualcam_tpu.utils import synthetic

    # synthesize a tiny DBoW2 .bin vocabulary (saveToBinaryFile layout)
    rng = np.random.default_rng(11)
    rows = []
    frontier, next_id, k, L = [0], 1, 3, 2
    for level in range(L):
        new_frontier = []
        for p in frontier:
            for _ in range(k):
                leaf = level == L - 1
                desc = rng.integers(0, 256, 32).astype(np.uint8)
                rows.append((p, leaf, desc,
                             float(rng.uniform(0.1, 1.0)) if leaf else 0.0))
                if not leaf:
                    new_frontier.append(next_id)
                next_id += 1
        frontier = new_frontier
    voc_bin = str(tmp_path / "voc.bin")
    with open(voc_bin, "wb") as f:
        f.write(struct.pack("<IIiiii", len(rows), 4 + 32 + 4 + 1, k, L, 0, 0))
        for p, leaf, d, w in rows:
            f.write(struct.pack("<i", p) + bytes(d.tolist()) +
                    struct.pack("<f", w) + struct.pack("<?", leaf))

    world = synthetic.make_box_world(np.random.default_rng(0), half=6.0,
                                     tex_size=256)
    K = np.array([[130.0, 0, 80], [0, 130, 60], [0, 0, 1]])
    vid = str(tmp_path / "seq.avi")
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 30, (160, 120))
    for T in synthetic.orbit_trajectory(10, radius=1.5,
                                        total_angle=0.25 * np.pi):
        img = synthetic.render(world, K, T, H=120, W=160).astype(np.uint8)
        wr.write(cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))
    wr.release()

    yaml = tmp_path / "rig.yaml"
    yaml.write_text("""%YAML:1.0
nCameras: 1
Camera0.fx: 130.0
Camera0.fy: 130.0
Camera0.cx: 80.0
Camera0.cy: 60.0
Camera.width: 160
Camera.height: 120
Camera.fps: 30.0
Camera.RGB: 1
ORBextractor.nFeatures: 200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 3
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "orbslam2_dualcam_tpu.run",
         "--settings", str(yaml), "--video", vid, "--out", str(out),
         "--vocab", voc_bin, "--mono", "--no-loop", "--cpu"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr
    assert (out / "FramePoseTcw.txt").exists()
