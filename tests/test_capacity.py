"""Capacity enforcement: a long run must keep the map within
CapacityConfig bounds (KF/MP caps are hard limits with visible refusal
events, not decoration), with keyframe culling recycling slots."""

import numpy as np
import pytest

from orbslam2_dualcam_tpu.pipeline.system import System
from orbslam2_dualcam_tpu.utils import synthetic
from orbslam2_dualcam_tpu.utils.config import (CameraConfig, CapacityConfig,
                                               MappingConfig, OrbConfig,
                                               SystemConfig)

pytestmark = pytest.mark.slow


def test_long_run_bounded():
    rng = np.random.default_rng(2)
    cap = CapacityConfig(max_keyframes=30, max_mappoints=4000,
                         max_local_mp=2048)
    cfg = SystemConfig(
        cameras=(CameraConfig(width=320, height=240, fx=260, fy=260,
                              cx=160, cy=120),),
        orb=OrbConfig(n_features=400, n_levels=4),
        mapping=MappingConfig(cull_found_ratio=0.1),
        capacity=cap,
    )
    world = synthetic.make_box_world(rng, half=6.0)
    sys_ = System(cfg, voc=None, enable_loop_closing=False)
    K = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    # 2 laps of the orbit (~50+ KFs demanded per lap vs a 30-KF cap):
    # sustained tracking is only possible if eviction keeps recycling
    # slots for the local map around the camera
    poses = synthetic.orbit_trajectory(180, radius=1.5,
                                       total_angle=4.0 * np.pi)
    states = []
    for k, T_cw in enumerate(poses):
        imgs = synthetic.render_rig(world, K, T_sc, T_cw, H=240, W=320)
        states.append(sys_.track(imgs, k / 30.0))
        assert sys_.map.n_keyframes <= cap.max_keyframes
        assert sys_.map.n_points <= cap.max_mappoints
    # Tracking must stay healthy under SUSTAINED eviction pressure: the
    # cap binds from ~frame 35 (50+ KFs demanded per lap vs 30 slots) and
    # ~50 evictions recycle slots through frame 120.  A later terminal
    # loss is the documented failure mode of bounded-window odometry
    # WITHOUT place recognition (evicted regions cannot be relocalized
    # against; the reference never bounds its map so never faces this) —
    # the dual/vocab configurations recover via the KFDB instead.
    n_lost_early = sum(1 for s in states[:120] if s == "LOST")
    assert n_lost_early < 12, (n_lost_early, sys_.tracker.events[:40])
    # capacity pressure must have acted visibly (eviction or refusal
    # events), not silently
    n_evict = sum(1 for e in sys_.tracker.events
                  if e.startswith("KFEVICT"))
    assert n_evict >= 10 or sys_.map.n_keyframes < cap.max_keyframes, \
        sys_.tracker.events[-10:]
