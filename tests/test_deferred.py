"""Deferred (batched, device-pipelined) tracking mode.

System(deferred_tracking=True) dispatches frames in batches of
`pipeline_depth` and processes results a batch behind (SURVEY §5: the
host reads results asynchronously, the TPU analog of the reference's
thread overlap).  These tests pin the mode's contract: same tracking
quality as the synchronous path, complete trajectories after flush, and
— the regression that motivated them — a device pose chain that stays
on SO(3) (without re-orthonormalization, f32 drift compounds ~2.4x per
frame through the velocity carry and tracking collapses at ~15 chained
frames)."""

import numpy as np

from orbslam2_dualcam_tpu.pipeline.system import System
from orbslam2_dualcam_tpu.utils import metrics, synthetic
from orbslam2_dualcam_tpu.utils.config import dual_default


def _run(deferred: bool, n_frames: int = 40, async_mapping: bool = False):
    cfg = dual_default()
    rng = np.random.default_rng(1)
    world = synthetic.make_box_world(rng, n_points=6000, half=6.0)
    poses = synthetic.orbit_trajectory(n_frames, radius=1.5,
                                       total_angle=0.5 * np.pi)
    sys_ = System(cfg, voc=None, enable_loop_closing=False,
                  deferred_tracking=deferred, async_mapping=async_mapping)
    K = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    for k, T in enumerate(poses):
        imgs = synthetic.render_rig(world, K, T_sc, T, H=480, W=640)
        sys_.track(imgs, k / 30.0)
    sys_.shutdown()
    est = {fid: T for fid, ts, rk, Trel, T in sys_.tracker.trajectory}
    common = sorted(set(est) & set(range(len(poses))))
    E = np.stack([np.linalg.inv(est[i])[:3, 3] for i in common])
    G = np.stack([np.linalg.inv(poses[i])[:3, 3] for i in common])
    return sys_, metrics.ate_rmse(E, G), len(common), poses


def test_deferred_matches_sync_quality():
    """The pipelined mode must track the orbit as well as the sync path:
    no dropped frames, no thin-stage-1 collapses (the SO(3)-drift
    signature), complete trajectory after shutdown()."""
    sys_, ate, n, poses = _run(deferred=True)
    ev = sys_.tracker.events
    assert not any(e.startswith("DROPFRAME") for e in ev), ev[-10:]
    assert not any(e.startswith("THIN") for e in ev), ev[-10:]
    assert not any(e.startswith("LOST") for e in ev), ev[-10:]
    # every frame after init must have a recorded pose (flush drained the
    # in-flight batch)
    assert n >= len(poses) - 5
    assert ate < 0.35, ate     # sync runs land 0.05-0.15 on this fixture


def test_deferred_with_async_mapping():
    """Deferred tracking + the mapping thread (the bench's deployment
    config) — the map mutates concurrently under the coarse lock."""
    sys_, ate, n, poses = _run(deferred=True, async_mapping=True)
    ev = sys_.tracker.events
    assert not any(e.startswith("LOST") for e in ev), ev[-10:]
    assert n >= len(poses) - 5
    assert ate < 0.35, ate


def test_deferred_flush_is_idempotent():
    sys_, _, _, _ = _run(deferred=True, n_frames=12)
    st1 = sys_.tracker.flush()
    st2 = sys_.tracker.flush()
    assert st1 == st2
