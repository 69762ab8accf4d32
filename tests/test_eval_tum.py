"""examples/eval_tum.py's evaluate() driven on an ON-DISK TUM-layout
sequence (rgb/*.png files + rgb.txt + groundtruth.txt written to disk,
read back through cv2 like a real download would be).

The actual TUM tarballs are unreachable from this sandbox (zero egress —
eval_tum.py --try-download records the DNS failure), so this pins the
entire real-data code path — loader, file IO, timestamp-matched ground
truth, mono pipeline, ATE — on frames with real photographic texture.
The moment a network (or a mounted dataset) exists, the same function
produces the BASELINE.md config[0] number with zero code changes."""

import os

import numpy as np
import pytest

from orbslam2_dualcam_tpu.utils import datasets, synthetic

pytestmark = pytest.mark.slow


def _write_tum_dir(tmp_path, n=45):
    import cv2
    K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]])
    planes = datasets.photo_room_planes(half=3.0, height=1.8, seed=5,
                                        tex=512)
    poses = synthetic.orbit_trajectory(n, radius=1.2,
                                       total_angle=0.9 * np.pi)
    os.makedirs(tmp_path / "rgb", exist_ok=True)
    rgb_lines, gt_lines = [], []
    for i, (img, T) in enumerate(
            datasets.planar_photo_sequence(poses, K, H=240, W=320,
                                           planes=planes)):
        ts = 1305031100.0 + i / 30.0
        name = f"rgb/{ts:.6f}.png"
        cv2.imwrite(str(tmp_path / name), img.astype(np.uint8))
        rgb_lines.append(f"{ts:.6f} {name}")
        c = np.linalg.inv(T)[:3, 3]
        gt_lines.append(f"{ts:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                        f"0 0 0 1")
    (tmp_path / "rgb.txt").write_text(
        "# color images\n" + "\n".join(rgb_lines) + "\n")
    (tmp_path / "groundtruth.txt").write_text(
        "# ground truth\n" + "\n".join(gt_lines) + "\n")
    return poses


def test_evaluate_on_disk_sequence(tmp_path):
    from examples.eval_tum import evaluate

    poses = _write_tum_dir(tmp_path)
    out = evaluate(str(tmp_path),
                   intr=dict(fx=260.0, fy=260.0, cx=160.0, cy=120.0))
    assert out["n_tracked"] >= len(poses) - 8, out
    assert out["n_kf"] >= 5, out
    # mono Sim3-aligned ATE on a ~2.4m-diameter circuit
    assert out["ate_sim3_m"] < 0.25, out
