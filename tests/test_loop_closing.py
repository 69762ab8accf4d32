"""Loop-closure + relocalization integration (config[1]): a full-circle
orbit with a trained vocabulary must detect and close the loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_dualcam_tpu.ops import orb
from orbslam2_dualcam_tpu.pipeline.system import System
from orbslam2_dualcam_tpu.utils import metrics, synthetic
from orbslam2_dualcam_tpu.utils.config import (CameraConfig, CapacityConfig,
                                               MappingConfig,
                                               OrbConfig, SystemConfig,
                                               VocabConfig)
from orbslam2_dualcam_tpu.vocab import bow


pytestmark = pytest.mark.slow

def small_cfg():
    return SystemConfig(
        cameras=(CameraConfig(width=320, height=240, fx=260, fy=260,
                              cx=160, cy=120),),
        orb=OrbConfig(n_features=400, n_levels=4),
        # 400 feats/cam vs ~1k visible local points: scale the
        # found-ratio cull gate down per MappingConfig's budget rule
        mapping=MappingConfig(cull_found_ratio=0.1),
        vocab=VocabConfig(branching=8, depth=4),
        capacity=CapacityConfig(max_local_mp=2048),
    )


@pytest.fixture(scope="module")
def world_and_vocab():
    rng = np.random.default_rng(7)
    cfg = small_cfg()
    world = synthetic.make_box_world(rng, half=6.0)
    # train the vocabulary from descriptors of a few world views
    K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]])
    descs = []
    for T in synthetic.orbit_trajectory(16, radius=1.5):
        img = synthetic.render(world, K, T, H=240, W=320)
        f = orb.extract_orb(jnp.asarray(img), cfg.orb, 400)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = bow.train_vocabulary(np.concatenate(descs), branching=8, depth=4,
                               seed=5, weight_docs=descs)
    return cfg, world, voc


@pytest.fixture(scope="module")
def loop_run(world_and_vocab):
    cfg, world, voc = world_and_vocab
    sys_ = System(cfg, voc=voc, enable_loop_closing=True)
    n_frames = 72
    poses = synthetic.orbit_trajectory(n_frames, radius=1.5,
                                       total_angle=2.0 * np.pi)
    K = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    states = []
    for k, T_cw in enumerate(poses):
        imgs = synthetic.render_rig(world, K, T_sc, T_cw, H=240, W=320)
        states.append(sys_.track(imgs, k / 30.0))
    return sys_, poses, states


def test_loop_closes(loop_run):
    sys_, poses, states = loop_run
    assert sys_.loop_closer is not None
    assert sys_.loop_closer.n_loops_closed >= 1, sys_.tracker.events
    assert states[-1] in ("OK", "FULL"), sys_.tracker.events


def test_ate_after_loop(loop_run):
    sys_, poses, states = loop_run
    # the ATE gate must actually require the capability it names: a
    # loop-free run can drift under the threshold on a short circuit
    assert sys_.loop_closer.n_loops_closed >= 1, sys_.tracker.events
    traj = sys_.tracker.composed_trajectory()
    est = metrics.trajectory_positions(traj)
    fids = [t[0] for t in traj]
    gt = np.asarray([-poses[f][:3, :3].T @ poses[f][:3, 3] for f in fids])
    ate = metrics.ate_rmse(est, gt, with_scale=True)
    # loop currently closes near the END of the circle (consistency needs
    # ~4 consecutive retrievals), so only part of the accumulated drift is
    # recovered — ~0.6m on a ~9m circumference.  Earlier detection (better
    # retrieval) is the roadmap item; this gate tracks non-catastrophic
    # behavior until then.
    assert ate < 0.8, f"ATE {ate:.3f}; events={sys_.tracker.events}"


def test_relocalization_after_blackout(world_and_vocab):
    cfg, world, voc = world_and_vocab
    sys_ = System(cfg, voc=voc, enable_loop_closing=False)
    poses = synthetic.orbit_trajectory(30, radius=1.5,
                                       total_angle=0.6 * np.pi)
    K = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    for k, T_cw in enumerate(poses[:20]):
        imgs = synthetic.render_rig(world, K, T_sc, T_cw, H=240, W=320)
        sys_.track(imgs, k / 30.0)
    assert sys_.tracker.state == "OK"
    # blackout: featureless frames force LOST
    black = np.zeros((1, 240, 320), np.float32)
    for k in range(3):
        st = sys_.track(black, (20 + k) / 30.0)
    assert st == "LOST", st
    # revisit a mapped view (with a small offset) -> kfdb reloc
    T_back = poses[10].copy()
    for k in range(4):
        imgs = synthetic.render_rig(world, K, T_sc, T_back, H=240, W=320)
        st = sys_.track(imgs, (23 + k) / 30.0)
    assert st == "OK", sys_.tracker.events
    assert any(e.startswith("RELOC") for e in sys_.tracker.events), \
        sys_.tracker.events
    # the relocalized camera center must match the mapped trajectory's
    # frame-10 center in MAP coordinates
    traj = {t[0]: t for t in sys_.tracker.composed_trajectory()}
    c_reloc = metrics.trajectory_positions([traj[max(traj)]])[0]
    c_orig = metrics.trajectory_positions([traj[10]])[0] if 10 in traj else None
    if c_orig is not None:
        assert np.linalg.norm(c_reloc - c_orig) < 0.08, (c_reloc, c_orig)
