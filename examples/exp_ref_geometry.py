"""Experiment: dual bootstrap at the REFERENCE's own rig geometry —
cam1 yawed ~69 deg from cam0 with a ~10 cm baseline (Dual-LenaCV.yaml:
q=(0.33887, -0.0756, 0.90397, 0.24836) |t|=0.0997 — a dominant-yaw
rotation).  RESULTS.md argues the 69-deg geometry makes metric scale
observable at 10 cm because the rear camera relocalizes against regions
mapped ~10 frames earlier (drift below signal), unlike the 180-deg
back-to-back worst case.  This measures that claim in-repo.

Usage: python examples/exp_ref_geometry.py [yaw_deg] [sign]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from orbslam2_dualcam_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from orbslam2_dualcam_tpu.ops import orb  # noqa: E402
from orbslam2_dualcam_tpu.pipeline.system import System  # noqa: E402
from orbslam2_dualcam_tpu.utils import metrics, synthetic  # noqa: E402
from orbslam2_dualcam_tpu.utils.config import (  # noqa: E402
    CameraConfig, CapacityConfig, MappingConfig, OrbConfig, SystemConfig,
    TrackerConfig, VocabConfig)
from orbslam2_dualcam_tpu.vocab import bow  # noqa: E402


def main():
    yaw_deg = float(sys.argv[1]) if len(sys.argv) > 1 else 69.0
    sign = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    yaw = np.deg2rad(yaw_deg) * sign
    # cam1 orientation in rig frame: R_1 = R_y(yaw); T_sc rotation is R_1^T
    # => quaternion of R_y(-yaw) in (w, x, y, z)
    q = (np.cos(-yaw / 2), 0.0, np.sin(-yaw / 2), 0.0)
    cam0 = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160,
                        cy=120)
    cam1 = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160,
                        cy=120, q_sc=q, t_sc=(0.0, 0.0, 0.10))
    cfg = SystemConfig(
        cameras=(cam0, cam1),
        orb=OrbConfig(n_features=400, n_levels=4),
        mapping=MappingConfig(cull_found_ratio=0.1),
        vocab=VocabConfig(branching=8, depth=3),
        tracker=TrackerConfig(reloc_gap_try=4, reloc_gap_fail=4,
                              num_frame_in_secondmap=3),
        capacity=CapacityConfig(max_local_mp=2048),
    )
    rng = np.random.default_rng(3)
    world = synthetic.make_box_world(rng, half=6.0)
    K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]])
    descs = []
    for T in synthetic.orbit_trajectory(10, radius=1.0):
        img = synthetic.render(world, K, T, H=240, W=320)
        f = orb.extract_orb(jnp.asarray(img), cfg.orb, 400)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = bow.train_vocabulary(np.concatenate(descs), branching=8, depth=3,
                               seed=9, weight_docs=descs)

    sys_ = System(cfg, voc=voc, enable_loop_closing=False)
    poses = synthetic.out_and_back_trajectory(n_out=26, n_turn=30, n_back=26)
    Ks = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    states = []
    for k, T_cw in enumerate(poses):
        imgs = synthetic.render_rig(world, Ks, T_sc, T_cw, H=240, W=320)
        states.append(sys_.track(imgs, k / 30.0))

    ev = sys_.tracker.events
    for e in ev:
        if any(e.startswith(p) for p in
               ("XRELOC", "SCALED", "XTRY", "MGBA", "LOST", "XBOW",
                "XPNP", "XREF", "XROT", "XANCHOR")):
            print(e)
    print("final state:", states[-1],
          "n_lost:", sum(1 for s in states if s == "LOST"))
    print("map_scaled:", sys_.map.map_scaled)
    kids = sorted(sys_.map.keyframes.keys())
    est, gt = [], []
    for kid in kids:
        kf = sys_.map.keyframes[kid]
        est.append(kf.center())
        Tg = poses[kf.frame_id]
        gt.append(-Tg[:3, :3].T @ Tg[:3, 3])
    est, gt = np.asarray(est), np.asarray(gt)
    _, _, s = metrics.align_umeyama(est, gt, with_scale=True)
    ate_sim3 = metrics.ate_rmse(est, gt, with_scale=True)
    ate_se3 = metrics.ate_rmse(est, gt, with_scale=False)
    span = np.linalg.norm(gt.max(0) - gt.min(0))
    n_cross = sum(1 for mp in sys_.map.points.values()
                  if mp.seen_by_multiple_cams)
    print(f"yaw={yaw_deg*sign:+.0f}deg scale s={s:.3f} "
          f"ate_sim3={ate_sim3:.3f} ate_se3={ate_se3:.3f} span={span:.2f} "
          f"kf={len(kids)} cross_pts={n_cross}")


if __name__ == "__main__":
    main()
