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
    ap.add_argument("--loop", action="store_true",
                    help="closed-circuit orbit in the photo room with a "
                         "sequence-trained vocabulary and loop closing ON "
                         "(the role of the reference's indoor_lab_loop.avi)")
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

    loop_poses = None
    voc = None
    if args.loop:
        import jax.numpy as jnp

        from orbslam2_dualcam_tpu.ops import orb
        from orbslam2_dualcam_tpu.vocab import bow
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
        # full circuit + overlap so the tail revisits the start viewpoint.
        # Room half=3.0 keeps wall distance in the 1.5-5m band the orbit's
        # tangential view can triangulate (the default 6m room puts the
        # far wall 8.4m away and tracking starves mid-circle)
        # 2.6pi: the revisit begins at ~77 % of the sequence (frame 104
        # of 135), leaving a realistic post-closure stretch in which the
        # tracker re-tracks through the corrected map and further loop
        # edges consolidate (indoor_lab_loop.avi-style overlap)
        loop_planes = datasets.photo_room_planes(half=3.0, height=1.8)
        loop_poses = synthetic.orbit_trajectory(135, radius=1.5,
                                                total_angle=2.6 * np.pi)
        # vocabulary trained from a sparse subsample of the sequence itself
        # (stand-in for the reference's offline-trained ORBvoc)
        descs = []
        for i, (img, _) in enumerate(
                datasets.planar_photo_sequence(loop_poses[::7], K, H=H, W=W,
                                               planes=loop_planes)):
            ft = orb.extract_orb(jnp.asarray(img), cfg.orb, nf)
            descs.append(np.asarray(ft.desc)[np.asarray(ft.valid)])
        voc = bow.train_vocabulary(np.concatenate(descs), branching=9,
                                   depth=4, seed=5, weight_docs=descs)

    sys_ = System(cfg, voc=voc, enable_loop_closing=args.loop)
    gt_of_frame = {}
    states = []
    if args.kitti:
        ds = datasets.KittiOdometryDataset.load(args.kitti)
        for i in range(len(ds.frames)):
            states.append(sys_.track(ds.read(i)[None], float(ds.times[i])))
            c = ds.gt_center(i)
            if c is not None:
                gt_of_frame[i] = c
    elif args.tum:
        ds = datasets.TumRgbDataset.load(args.tum)
        for i, (ts, _) in enumerate(ds.frames):
            img = ds.read(i)
            states.append(sys_.track(img[None], ts))
            c = ds.gt_center_at(ts)
            if c is not None:
                gt_of_frame[i] = c
    else:
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
        if args.loop:
            poses, planes = loop_poses, loop_planes
        else:
            poses = synthetic.out_and_back_trajectory(n_out=24, n_turn=40,
                                                      n_back=24,
                                                      turn_radius=2.0)
            planes = None
        for i, (img, T) in enumerate(
                datasets.planar_photo_sequence(poses, K, H=H, W=W,
                                               planes=planes)):
            states.append(sys_.track(img[None], i / 30.0))
            gt_of_frame[i] = -T[:3, :3].T @ T[:3, 3]
    n_lost = sum(1 for s in states if s == "LOST")
    print(f"frames: {len(states)}  lost: {n_lost}  final: {states[-1]}")
    if sys_.loop_closer is not None:
        print(f"loops closed: {sys_.loop_closer.n_loops_closed}")

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
