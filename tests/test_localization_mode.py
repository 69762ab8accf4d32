"""Localization-only mode + forced-lost fault injection (System.cc:182-214,
330-333 equivalents), against a prebuilt map."""

import numpy as np
import pytest

from orbslam2_dualcam_tpu.pipeline.system import System
from orbslam2_dualcam_tpu.utils import synthetic
from orbslam2_dualcam_tpu.utils.config import (CameraConfig, CapacityConfig,
                                               MappingConfig,
                                               OrbConfig, SystemConfig)


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def built_system():
    rng = np.random.default_rng(11)
    cfg = SystemConfig(
        cameras=(CameraConfig(width=320, height=240, fx=260, fy=260,
                              cx=160, cy=120),),
        orb=OrbConfig(n_features=400, n_levels=4),
        # 400 feats/cam vs ~1k visible local points: scale the
        # found-ratio cull gate down per MappingConfig's budget rule
        mapping=MappingConfig(cull_found_ratio=0.1),
        capacity=CapacityConfig(max_local_mp=2048))
    world = synthetic.make_box_world(rng, half=6.0)
    sys_ = System(cfg, voc=None, enable_loop_closing=False)
    poses = synthetic.orbit_trajectory(24, radius=1.5,
                                       total_angle=0.5 * np.pi)
    K = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    for k, T_cw in enumerate(poses):
        sys_.track(synthetic.render_rig(world, K, T_sc, T_cw, H=240, W=320),
                   k / 30.0)
    return sys_, world, poses


def test_localization_mode_freezes_map(built_system):
    sys_, world, poses = built_system
    assert sys_.tracker.state == "OK"
    n_kf = sys_.map.n_keyframes
    n_mp = sys_.map.n_points
    sys_.activate_localization_mode()
    K = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    # retrace the trajectory backwards (smooth reversal, no teleport):
    # must keep tracking, map unchanged
    for k, T_cw in enumerate(poses[-2:-12:-1]):
        st = sys_.track(synthetic.render_rig(world, K, T_sc, T_cw,
                                             H=240, W=320), 1.0 + k / 30.0)
    assert st == "OK"
    assert sys_.map.n_keyframes == n_kf
    assert sys_.map.n_points == n_mp
    sys_.deactivate_localization_mode()
    assert not sys_.tracker.localization_only


def test_forced_lost_and_recovery(built_system):
    sys_, world, poses = built_system
    sys_.set_compulsory_lost()
    K = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    img = synthetic.render_rig(world, K, T_sc, poses[12], H=240, W=320)
    st = sys_.track(img, 2.0)
    assert any(e.startswith("FORCED_LOST") for e in sys_.tracker.events)
    # without a vocabulary the fallback reloc uses the last pose + wide
    # projection search — showing a mapped view again must recover
    for k in range(3):
        st = sys_.track(img, 2.1 + k / 30.0)
        if st == "OK":
            break
    assert st == "OK", sys_.tracker.events
