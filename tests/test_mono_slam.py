"""End-to-end monocular SLAM slice on a synthetic sequence (config[0] of
BASELINE.json): init -> tracking -> keyframing -> local mapping -> BA,
evaluated by ATE after Sim3 alignment."""

import numpy as np
import pytest

from orbslam2_dualcam_tpu.pipeline.system import System
from orbslam2_dualcam_tpu.utils import metrics, synthetic
from orbslam2_dualcam_tpu.utils.config import (CameraConfig, CapacityConfig,
                                               MappingConfig,
                                               OrbConfig, SystemConfig)


pytestmark = pytest.mark.slow

def small_cfg():
    return SystemConfig(
        cameras=(CameraConfig(width=320, height=240, fx=260, fy=260,
                              cx=160, cy=120),),
        orb=OrbConfig(n_features=400, n_levels=4),
        # 400 feats/cam vs ~1k visible local points: scale the
        # found-ratio cull gate down per MappingConfig's budget rule
        mapping=MappingConfig(cull_found_ratio=0.1),
        capacity=CapacityConfig(max_local_mp=2048),
    )


@pytest.fixture(scope="module")
def mono_run():
    rng = np.random.default_rng(42)
    cfg = small_cfg()
    world = synthetic.make_box_world(rng, n_points=2500, half=6.0)
    sys_ = System(cfg, voc=None, enable_loop_closing=False)
    n_frames = 45
    poses = synthetic.orbit_trajectory(n_frames, radius=1.5,
                                       total_angle=0.8 * np.pi)
    K = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    states = []
    for k, T_cw in enumerate(poses):
        imgs = synthetic.render_rig(world, K, T_sc, T_cw, H=240, W=320)
        states.append(sys_.track(imgs, k / 30.0))
    return sys_, poses, states


def test_initializes_and_tracks(mono_run):
    sys_, poses, states = mono_run
    assert states[-1] == "OK", (states, sys_.tracker.events)
    # should have initialized within the first ~10 frames
    assert "OK" in states[:12], sys_.tracker.events
    n_lost = sum(1 for s in states if s == "LOST")
    assert n_lost <= 3, (states, sys_.tracker.events)


def test_map_grows(mono_run):
    sys_, _, _ = mono_run
    assert sys_.map.n_keyframes >= 4, sys_.tracker.events
    assert sys_.map.n_points > 150
    assert sys_.mapper.n_triangulated > 50


def test_ate(mono_run):
    sys_, poses, states = mono_run
    traj = sys_.tracker.composed_trajectory()
    assert len(traj) > 30
    est = metrics.trajectory_positions(traj)
    fids = [t[0] for t in traj]
    # frame ids are 0-based (Tracker._pull runs before the counter
    # increments), so fid indexes `poses` directly
    gt = np.asarray([-poses[f][:3, :3].T @ poses[f][:3, 3]
                     for f in fids])
    ate = metrics.ate_rmse(est, gt, with_scale=True)
    # trajectory spans ~3.5m; current slice lands 0.14-0.23m across pipeline
    # variations (~5%).  Target for parity with ORB-SLAM2-class accuracy is
    # cm level — tracked as a roadmap item; this gate catches catastrophic
    # regressions only.
    assert ate < 0.30, f"ATE {ate:.4f} m; events={sys_.tracker.events}"


def test_abrupt_turn_recovery():
    """An abrupt 9 deg/frame turn makes the optical flow (~41 px at
    f=260) exceed both the 15 px motion-model window and its 30 px
    widened retry — the breakdown that LOSES tracking unless the
    reference-KF fallback matches by descriptor without a window, the
    role of TrackReferenceKeyFrame's SearchByBoW (Tracking.cc:1295-1369).
    Regression for the 640x480/1300x8 operating point, reproduced at
    test scale (same angular rate, same px/window ratio)."""
    rng = np.random.default_rng(3)
    cfg = small_cfg()
    world = synthetic.make_box_world(rng, n_points=2500, half=6.0)
    sys_ = System(cfg, voc=None, enable_loop_closing=False)
    poses = synthetic.out_and_back_trajectory(n_out=12, n_turn=20, n_back=8,
                                              turn_radius=1.0)
    K = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    states = []
    for k, T_cw in enumerate(poses):
        imgs = synthetic.render_rig(world, K, T_sc, T_cw, H=240, W=320)
        states.append(sys_.track(imgs, k / 30.0))
    n_lost = sum(1 for s in states if s == "LOST")
    assert n_lost == 0, (states, sys_.tracker.events)
    assert states[-1] == "OK", (states, sys_.tracker.events)


def test_savers(mono_run, tmp_path):
    sys_, _, _ = mono_run
    fp = tmp_path / "frames.txt"
    kp = tmp_path / "kfs.txt"
    mp = tmp_path / "map.txt"
    sys_.save_frame_trajectory(str(fp))
    sys_.save_keyframe_trajectory(str(kp))
    sys_.save_map_points(str(mp))
    lines = fp.read_text().strip().splitlines()
    assert len(lines) == len(sys_.tracker.trajectory)
    assert len(lines[0].split()) == 8      # x y z qx qy qz qw id
    assert len(kp.read_text().strip().splitlines()) == sys_.map.n_keyframes
