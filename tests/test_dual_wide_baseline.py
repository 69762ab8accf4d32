"""Dual bootstrap metric ACCURACY at an observable operating point.

tests/test_dual_slam.py runs the reference's own ~10cm baseline, where
the scale signal sits below mono map drift and NO estimator can recover
metric scale (quantified in RESULTS.md: BA's cost is lower at the wrong
scale; anchor-subset fits cluster at the drift floor).  This suite runs
the SAME pipeline with a 0.5m baseline — 5x the signal, same drift — and
gates that the full bootstrap chain (pair-LS commit -> anchor attach ->
1-DoF cross-edge refine -> frontier warp -> metric GBA) actually lands
near metric.  Together the two suites separate "the machinery is wrong"
from "the geometry is information-limited".
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_dualcam_tpu.ops import orb
from orbslam2_dualcam_tpu.pipeline.system import System
from orbslam2_dualcam_tpu.utils import metrics, synthetic
from orbslam2_dualcam_tpu.utils.config import (CameraConfig, CapacityConfig,
                                               MappingConfig,
                                               OrbConfig, SystemConfig,
                                               TrackerConfig, VocabConfig)
from orbslam2_dualcam_tpu.vocab import bow

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def wide_run():
    cam0 = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160,
                        cy=120)
    cam1 = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160,
                        cy=120, q_sc=(0.0, 0.0, 1.0, 0.0),
                        t_sc=(0.0, 0.0, 0.50))
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
    for k, T_cw in enumerate(poses):
        imgs = synthetic.render_rig(world, Ks, T_sc, T_cw, H=240, W=320)
        sys_.track(imgs, k / 30.0)
    return sys_, poses


def test_metric_scale_accurate_when_observable(wide_run):
    sys_, poses = wide_run
    assert sys_.map.map_scaled, sys_.tracker.events
    kids = sorted(sys_.map.keyframes.keys())
    est, gt = [], []
    for kid in kids:
        kf = sys_.map.keyframes[kid]
        est.append(kf.center())
        Tg = poses[kf.frame_id]
        gt.append(-Tg[:3, :3].T @ Tg[:3, 3])
    est, gt = np.asarray(est), np.asarray(gt)
    _, _, s = metrics.align_umeyama(est, gt, with_scale=True)
    # measured 1.106 on this fixture with the periodic metric-GBA refresh
    # (_maybe_metric_refresh); 1.10 is the fixture's BA optimum — restarting
    # GBA from ground-truth scale converges back to 1.10 (RESULTS.md), so
    # the pipeline extracts everything the observations hold.  The gate
    # leaves noise margin but fails for >=35% scale error (vs the measured
    # 1.24 without the refresh and the 3x floor at the 10cm baseline).
    assert 0.75 < s < 1.35, f"metric scale off: {s:.3f}"
    # the periodic metric refresh must actually have fired
    assert any(e.startswith("MGBA@") for e in sys_.tracker.events), \
        sys_.tracker.events
    # with an accurate global scale the SE3 (scale-FIXED) ATE must also
    # be bounded — this is the end-user metric the dual rig exists for
    ate_se3 = metrics.ate_rmse(est, gt, with_scale=False)
    span = np.linalg.norm(gt.max(0) - gt.min(0))
    assert ate_se3 < 0.45 * span, (ate_se3, span)
    ate_sim3 = metrics.ate_rmse(est, gt, with_scale=True)
    assert ate_sim3 < 0.05 * span, (ate_sim3, span)
