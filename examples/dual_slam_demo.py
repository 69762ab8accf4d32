"""Full dual-camera SLAM demo: the four-stage bootstrap end-to-end.

Equivalent of the reference's Examples/Dual/dual_slam_video.cpp driver, on
the synthetic textured-room world: trains a vocabulary, runs the crab-walk
out-U-turn-back sequence, prints the bootstrap events (mono init ->
cross-camera relocs -> metric scaling -> FULL), saves trajectories, the
map checkpoint, and viewer snapshots.

Run:  python examples/dual_slam_demo.py [out_dir]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

import jax

if os.environ.get("SLAM_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.ops import orb
from orbslam2_dualcam_tpu.pipeline.system import System
from orbslam2_dualcam_tpu.utils import checkpoint, metrics, synthetic
from orbslam2_dualcam_tpu.utils.config import (CameraConfig, CapacityConfig,
                                               OrbConfig, SystemConfig,
                                               TrackerConfig, VocabConfig)
from orbslam2_dualcam_tpu.vocab import bow


def main(out_dir: str = "/tmp/dual_slam_demo") -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(3)
    cam0 = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160,
                        cy=120)
    # 0.5m baseline: the scale-observable demo rig (at the reference's
    # 10cm baseline this harshest-case 180-degree synthetic rig is
    # information-limited — see RESULTS.md "metric-scale observability")
    cam1 = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160,
                        cy=120, q_sc=(0.0, 0.0, 1.0, 0.0),
                        t_sc=(0.0, 0.0, 0.50))
    cfg = SystemConfig(
        cameras=(cam0, cam1),
        orb=OrbConfig(n_features=400, n_levels=4),
        vocab=VocabConfig(branching=8, depth=4),
        tracker=TrackerConfig(reloc_gap_try=4, reloc_gap_fail=4,
                              num_frame_in_secondmap=3),
        capacity=CapacityConfig(max_local_mp=2048))

    world = synthetic.make_box_world(rng, half=6.0)
    K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]])
    print("training vocabulary ...")
    descs = []
    for T in synthetic.orbit_trajectory(10, radius=1.0):
        img = synthetic.render(world, K, T, H=240, W=320)
        f = orb.extract_orb(jnp.asarray(img), cfg.orb, 400)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = bow.train_vocabulary(np.concatenate(descs), branching=8, depth=4,
                               seed=9, weight_docs=descs)

    sys_ = System(cfg, voc=voc, enable_loop_closing=False)
    poses = synthetic.out_and_back_trajectory(n_out=26, n_turn=30, n_back=26)
    Ks = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    t0 = time.time()
    for k, T_cw in enumerate(poses):
        imgs = synthetic.render_rig(world, Ks, T_sc, T_cw, H=240, W=320)
        st = sys_.track(imgs, k / 30.0)
        if k % 10 == 0:
            print(f"frame {k:3d}: {st:16s} inl={sys_.tracker.n_track_inliers:4d} "
                  f"kf={sys_.map.n_keyframes:3d} mp={sys_.map.n_points}")
    print(f"done in {time.time()-t0:.1f}s; state={sys_.tracker.state}")
    print("bootstrap events:")
    for e in sys_.tracker.events:
        if any(e.startswith(p) for p in ("INIT", "XRELOC", "SCALED", "XKF",
                                         "XWARP", "XSPREAD", "FULL",
                                         "LOST", "RELOC")):
            print("  ", e)

    # metric accuracy
    est, gt = [], []
    for kid in sorted(sys_.map.keyframes):
        kf = sys_.map.keyframes[kid]
        est.append(kf.center())
        Tg = poses[kf.frame_id]
        gt.append(-Tg[:3, :3].T @ Tg[:3, 3])
    est, gt = np.asarray(est), np.asarray(gt)
    _, _, s = metrics.align_umeyama(est, gt)
    print(f"metric scale vs ground truth: {s:.3f} (1.0 = perfect)")
    print(f"SE3 ATE: {metrics.ate_rmse(est, gt, with_scale=False):.3f} m")

    sys_.save_frame_trajectory(os.path.join(out_dir, "frames.txt"))
    sys_.save_keyframe_trajectory(os.path.join(out_dir, "keyframes.txt"))
    sys_.save_map_points(os.path.join(out_dir, "map_points.txt"))
    checkpoint.save_map(sys_.map, os.path.join(out_dir, "map.npz"))
    try:
        from orbslam2_dualcam_tpu.viz import viewer
        viewer.plot_map(sys_.map, T_sc, os.path.join(out_dir, "map.png"),
                        current_T_cw=sys_.tracker.last.T_cw)
        print(f"artifacts in {out_dir}: frames.txt keyframes.txt "
              f"map_points.txt map.npz map.png")
    except Exception as e:  # matplotlib optional
        print(f"viewer skipped ({e})")


if __name__ == "__main__":
    main(*sys.argv[1:2])
