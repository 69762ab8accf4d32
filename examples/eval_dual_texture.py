"""Dual-camera bootstrap on REAL image texture at the REFERENCE's rig
geometry — the repo's equivalent of running the reference on its
indoor_lab_loop.avi artifact (README.md:54-60).

Both rig cameras are rendered from the photo-textured planar room
(utils/datasets.planar_photo_rig_sequence) with cam1 yawed `yaw_deg` from
cam0 at a ~10 cm baseline — the Dual-LenaCV.yaml:24-46 geometry
(q=(0.33887,-0.0756,0.90397,0.24836), |t|=0.0997: a dominant ~69-deg yaw).
Measures: metric scale error |s-1|, ATE (Sim3 + SE3 aligned), LOST count.

Usage: python examples/eval_dual_texture.py [--yaw 69] [--frames 110]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from orbslam2_dualcam_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from orbslam2_dualcam_tpu.ops import orb  # noqa: E402
from orbslam2_dualcam_tpu.pipeline.system import System  # noqa: E402
from orbslam2_dualcam_tpu.utils import datasets, metrics, synthetic  # noqa: E402
from orbslam2_dualcam_tpu.utils.config import (  # noqa: E402
    CameraConfig, CapacityConfig, MappingConfig, OrbConfig, SystemConfig,
    TrackerConfig, VocabConfig)
from orbslam2_dualcam_tpu.vocab import bow  # noqa: E402


def run(yaw_deg: float = 69.0, n_frames: int = 110, baseline: float = 0.10,
        verbose: bool = True, seed: int = 3, loop_closing: bool = False,
        total_angle: float = 2.0 * np.pi):
    """yaw_deg > 0: cam1 TRAILS the orbit sweep (sees regions cam0 mapped
    ~yaw/step frames earlier — the regime the reference's cross-camera
    reloc operates in); yaw_deg < 0: cam1 leads (nothing mapped in its
    view until the lap closes — scale unobservable by construction).

    loop_closing=True + total_angle > 2*pi: the circuit revisits its
    start after the metric bootstrap, exercising CreateSecondMap ->
    SearchCrossCameras -> DetectLoop -> CorrectLoop -> GBA in one run
    (the combination LoopClosing.cc:469-701 x Tracking.cc:512-775)."""
    yaw = np.deg2rad(-yaw_deg)
    q = (np.cos(-yaw / 2), 0.0, np.sin(-yaw / 2), 0.0)
    cam0 = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160,
                        cy=120)
    cam1 = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160,
                        cy=120, q_sc=q, t_sc=(0.0, 0.0, baseline))
    cfg = SystemConfig(
        cameras=(cam0, cam1),
        orb=OrbConfig(n_features=400, n_levels=4),
        mapping=MappingConfig(cull_found_ratio=0.1),
        vocab=VocabConfig(branching=8, depth=4),
        tracker=TrackerConfig(reloc_gap_try=4, reloc_gap_fail=4,
                              num_frame_in_secondmap=3),
        capacity=CapacityConfig(max_local_mp=2048),
    )
    planes = datasets.photo_room_planes(half=3.0, height=1.8, seed=seed)
    # orbit: the rig circles the room center; during the circuit cam1
    # points where cam0 pointed ~yaw/step frames earlier — exactly the
    # regime where the reference's cross-camera reloc fires
    poses = synthetic.orbit_trajectory(n_frames, radius=1.2,
                                       total_angle=total_angle)
    K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]])
    descs = []
    for img, _ in datasets.planar_photo_sequence(poses[::7], K, H=240,
                                                 W=320, planes=planes):
        f = orb.extract_orb(jnp.asarray(img), cfg.orb, 400)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = bow.train_vocabulary(np.concatenate(descs), branching=8, depth=4,
                               seed=9, weight_docs=descs)

    sys_ = System(cfg, voc=voc, enable_loop_closing=loop_closing)
    rig_K = np.asarray(sys_.rig.K)
    rig_T_sc = np.asarray(sys_.rig.T_sc)
    states = []
    for k, (ims, T_cw) in enumerate(datasets.planar_photo_rig_sequence(
            poses, rig_K, rig_T_sc, H=240, W=320, planes=planes)):
        states.append(sys_.track(ims, k / 30.0))

    ev = sys_.tracker.events
    if verbose:
        for e in ev:
            if any(e.startswith(p) for p in
                   ("INIT", "XRELOC", "SCALED", "MGBA", "LOST", "RELOC",
                    "XPNP", "XREF", "XROT", "XANCHOR")):
                print(e)
    n_lost = sum(1 for s in states if s == "LOST")
    kids = sorted(sys_.map.keyframes.keys())
    est, gt = [], []
    for kid in kids:
        kf = sys_.map.keyframes[kid]
        est.append(kf.center())
        Tg = poses[kf.frame_id]
        gt.append(-Tg[:3, :3].T @ Tg[:3, 3])
    est, gt = np.asarray(est), np.asarray(gt)
    _, _, s = metrics.align_umeyama(est, gt, with_scale=True)
    out = dict(
        yaw=yaw_deg, scale=float(s),
        map_scaled=sys_.map.map_scaled,
        ate_sim3=float(metrics.ate_rmse(est, gt, with_scale=True)),
        ate_se3=float(metrics.ate_rmse(est, gt, with_scale=False)),
        span=float(np.linalg.norm(gt.max(0) - gt.min(0))),
        n_lost=n_lost, n_kf=len(kids), final=states[-1],
        n_cross=sum(1 for mp in sys_.map.points.values()
                    if mp.seen_by_multiple_cams),
        n_loops=(sys_.loop_closer.n_loops_closed
                 if sys_.loop_closer is not None else 0))
    if verbose:
        print(out)
    return out, sys_


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--yaw", type=float, default=69.0)
    ap.add_argument("--frames", type=int, default=110)
    ap.add_argument("--baseline", type=float, default=0.10)
    args = ap.parse_args()
    run(args.yaw, args.frames, args.baseline)


if __name__ == "__main__":
    main()
