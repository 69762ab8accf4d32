"""Evaluate mono SLAM on the real-texture planar-room sequence.

The sequence mounts a real photograph (doc/dual_camera_model.jpg from the
reference repo) on the walls of a room and produces every frame with
cv2.warpPerspective under the exact plane-induced homography — real image
statistics with exact ground truth, independent of the synthetic renderer
the unit tests use (utils/datasets.py).  Mirrors the role of the
reference's indoor_lab_loop.avi demo (README.md:54-60); for actual TUM
sequences use --tum <dir> (utils/datasets.TumRgbDataset).

Usage:
  python examples/eval_real_texture.py [--frames N] [--tum DIR]
Prints ATE RMSE (Sim3 and SE3 alignment) against ground truth.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from orbslam2_dualcam_tpu.pipeline.system import System  # noqa: E402
from orbslam2_dualcam_tpu.utils import datasets, metrics, synthetic  # noqa: E402
from orbslam2_dualcam_tpu.utils.config import (CameraConfig,  # noqa: E402
                                               CapacityConfig, MappingConfig,
                                               OrbConfig, SystemConfig)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tum", default=None, help="TUM RGB sequence dir")
    ap.add_argument("--kitti", default=None,
                    help="KITTI odometry sequence dir (image_0/, times.txt)")
    ap.add_argument("--n-features", type=int, default=800)
    ap.add_argument("--levels", type=int, default=6)
    ap.add_argument("--full", action="store_true",
                    help="reference operating point: 640x480, 1300 feats, "
                         "8 levels (Dual-LenaCV.yaml:48-77)")
    args = ap.parse_args()

    if args.full:
        W, H, f, nf, nl = 640, 480, 520.0, 1300, 8
    else:
        W, H, f, nf, nl = 320, 240, 260.0, args.n_features, args.levels
    cfg = SystemConfig(
        cameras=(CameraConfig(width=W, height=H, fx=f, fy=f,
                              cx=W / 2, cy=H / 2),),
        orb=OrbConfig(n_features=nf, n_levels=nl),
        mapping=MappingConfig(cull_found_ratio=0.1),
        capacity=CapacityConfig(max_local_mp=4096 if args.full else 2048))

    sys_ = System(cfg, voc=None, enable_loop_closing=False)
    gt_of_frame = {}
    if args.kitti:
        ds = datasets.KittiOdometryDataset.load(args.kitti)
        for i in range(len(ds.frames)):
            sys_.track(ds.read(i)[None], float(ds.times[i]))
            c = ds.gt_center(i)
            if c is not None:
                gt_of_frame[i] = c
    elif args.tum:
        ds = datasets.TumRgbDataset.load(args.tum)
        for i, (ts, _) in enumerate(ds.frames):
            img = ds.read(i)
            sys_.track(img[None], ts)
            c = ds.gt_center_at(ts)
            if c is not None:
                gt_of_frame[i] = c
    else:
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
        poses = synthetic.out_and_back_trajectory(n_out=24, n_turn=40,
                                                  n_back=24, turn_radius=2.0)
        for i, (img, T) in enumerate(
                datasets.planar_photo_sequence(poses, K, H=H, W=W)):
            sys_.track(img[None], i / 30.0)
            gt_of_frame[i] = -T[:3, :3].T @ T[:3, 3]

    est, gt = [], []
    for kid in sorted(sys_.map.keyframes):
        kf = sys_.map.keyframes[kid]
        if kf.frame_id in gt_of_frame:
            est.append(kf.center())
            gt.append(gt_of_frame[kf.frame_id])
    est, gt = np.asarray(est), np.asarray(gt)
    ate_sim3 = metrics.ate_rmse(est, gt, with_scale=True)
    ate_se3 = metrics.ate_rmse(est, gt, with_scale=False)
    span = float(np.linalg.norm(gt.max(0) - gt.min(0)))
    print(f"keyframes: {len(est)}  span: {span:.2f} m")
    print(f"ATE RMSE (Sim3 align): {ate_sim3:.4f} m "
          f"({100 * ate_sim3 / span:.2f}% of span)")
    print(f"ATE RMSE (SE3 align):  {ate_se3:.4f} m")


if __name__ == "__main__":
    main()
