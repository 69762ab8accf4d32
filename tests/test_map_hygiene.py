"""Map/session hygiene: culled-keyframe trajectory re-anchoring, full
tracker reset, and the geometry-epoch guard metadata.

These protect against three failure modes found by review:
- composed_trajectory falling back to the stale capture-time pose when a
  frame's reference keyframe was culled (the reference re-anchors through
  the parent chain with mTcp, System::SaveTrajectory);
- System.reset() leaving dual-bootstrap anchors alive while Map.clear()
  recycles keyframe ids from 0;
- map-wide transforms (set_scale, Sim3 correction) not being visible to
  concurrent consumers (Map.geometry_epoch).
"""

import numpy as np

from orbslam2_dualcam_tpu.models.map import KeyFrame, Map


def _kf(kid: int, x: float) -> KeyFrame:
    T = np.eye(4)
    T[:3, 3] = [x, 0.0, 0.0]
    n = 4
    return KeyFrame(
        kid=kid, frame_id=kid, T_cw=T,
        uv=np.zeros((n, 2)), kp_cam=np.zeros(n, np.int64),
        level=np.zeros(n, np.int32), angle=np.zeros(n),
        desc=np.zeros((n, 8), np.uint32), kp_valid=np.ones(n, bool),
        mp_idx=np.full(n, -1, np.int64))


def test_culled_redirect_reanchors_through_parent():
    m = Map()
    a, b, c = _kf(0, 0.0), _kf(1, 1.0), _kf(2, 2.0)
    for kf in (a, b, c):
        m.add_keyframe(kf)
    b.parent, c.parent = a.kid, b.kid
    a.children.add(b.kid)
    b.children.add(c.kid)
    T_b_before = b.T_cw.copy()
    m.erase_keyframe(b)
    assert b.kid in m.culled_redirect
    pk, T_rel = m.culled_redirect[b.kid]
    assert pk == a.kid
    # invariant at cull time: T_rel @ T_parent == T_culled
    np.testing.assert_allclose(T_rel @ a.T_cw, T_b_before, atol=1e-12)
    # move the parent (as BA / a loop correction would); the redirect
    # composition must follow it
    a.T_cw = a.T_cw.copy()
    a.T_cw[:3, 3] += [0.0, 0.5, 0.0]
    T_recomposed = T_rel @ a.T_cw
    assert abs(T_recomposed[1, 3] - (T_b_before[1, 3] + 0.5)) < 1e-12


def test_geometry_epoch_bumps_on_global_transforms():
    m = Map()
    m.add_keyframe(_kf(0, 0.0))
    e0 = m.geometry_epoch
    m.set_scale(2.0)
    assert m.geometry_epoch == e0 + 1
    m.clear()
    assert m.geometry_epoch == e0 + 2


def test_system_reset_clears_bootstrap_state():
    from orbslam2_dualcam_tpu.pipeline.system import System
    from orbslam2_dualcam_tpu.utils.config import (CameraConfig,
                                                   OrbConfig, SystemConfig)
    cfg = SystemConfig(
        cameras=(CameraConfig(width=64, height=48, fx=50, fy=50,
                              cx=32, cy=24),),
        orb=OrbConfig(n_features=64, n_levels=2))
    s = System(cfg, voc=None, enable_loop_closing=False)
    tr = s.tracker
    # simulate mid-bootstrap state
    tr.cross_reloc_scales.extend([1.0, 2.0])
    tr.pending_cross.append((3, [], np.eye(4), 1.0))
    tr._last_xreloc = (3, [], np.eye(4), 1.0)
    tr.next_cross_try = 99
    tr.ref_kid = 7
    tr.localization_only = True
    s.reset()
    assert tr.cross_reloc_scales == []
    assert tr.pending_cross == []
    assert tr._last_xreloc is None
    assert tr.next_cross_try == 0
    assert tr.ref_kid == -1
    assert not tr.localization_only
    assert tr.state == tr.NOT_INITIALIZED
    assert s.map.n_keyframes == 0
