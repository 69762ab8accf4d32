"""Pipeline parallelism: tracking must overlap local-mapping BA.

VERDICT r1 #6: the async mode used to hold one coarse lock across the
whole frame AND the whole mapper step, serializing the "threads".  Now
local BA runs in abortable chunks that release the map lock while each
chunk executes on-device (optim/ba.solve_ba_chunked), so tracking
proceeds during mapping — and a queued keyframe aborts the BA early
(the reference's InterruptBA, LocalMapping.cc:97-108).
"""

import numpy as np
import pytest

from orbslam2_dualcam_tpu.pipeline.system import System
from orbslam2_dualcam_tpu.utils import synthetic
from orbslam2_dualcam_tpu.utils.config import (BAConfig, CameraConfig,
                                               CapacityConfig, MappingConfig,
                                               OrbConfig, SystemConfig)


def _cfg():
    return SystemConfig(
        cameras=(CameraConfig(width=320, height=240, fx=260, fy=260,
                              cx=160, cy=120),),
        orb=OrbConfig(n_features=400, n_levels=4),
        mapping=MappingConfig(cull_found_ratio=0.1),
        # long local BA in small chunks: plenty of yield points
        ba=BAConfig(local_iters_a=10, local_iters_b=20, abort_chunk=2),
        capacity=CapacityConfig(max_local_mp=2048))


@pytest.mark.slow
def test_tracking_overlaps_local_ba():
    rng = np.random.default_rng(11)
    world = synthetic.make_box_world(rng, half=6.0)
    sys_ = System(_cfg(), voc=None, enable_loop_closing=False,
                  async_mapping=True)
    poses = synthetic.out_and_back_trajectory(n_out=18, n_turn=0, n_back=0)
    K = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    states = []
    for k, T in enumerate(poses):
        img = synthetic.render_rig(world, K, T_sc, T, H=240, W=320)
        states.append(sys_.track(img, k / 30.0))
    sys_.shutdown()
    assert states[-1] in ("OK", "FULL"), states

    # proof of overlap: at least one tracked frame's wall interval
    # intersects a local-BA solve interval (impossible under the old
    # whole-step lock, where BA ran strictly between frames)
    ba_iv = sys_.mapper.ba_intervals
    fr_iv = sys_.frame_intervals
    assert ba_iv, "local BA never ran"
    overlaps = sum(1 for (b0, b1) in ba_iv for (f0, f1) in fr_iv
                   if max(b0, f0) < min(b1, f1))
    assert overlaps > 0, (ba_iv[:5], fr_iv[:5])


@pytest.mark.slow
def test_async_matches_sync_map():
    """The overlapped pipeline must still build an equivalent map."""
    rng = np.random.default_rng(11)
    world = synthetic.make_box_world(rng, half=6.0)
    poses = synthetic.out_and_back_trajectory(n_out=14, n_turn=0, n_back=0)

    def run(async_mode):
        s = System(_cfg(), voc=None, enable_loop_closing=False,
                   async_mapping=async_mode)
        K = np.asarray(s.rig.K)
        T_sc = np.asarray(s.rig.T_sc)
        for k, T in enumerate(poses):
            s.track(synthetic.render_rig(world, K, T_sc, T, H=240, W=320),
                    k / 30.0)
        s.shutdown()
        return s

    s_sync = run(False)
    s_async = run(True)
    # async timing varies; demand the same order of map richness, not
    # bit-identical state
    assert s_async.map.n_keyframes >= 0.5 * s_sync.map.n_keyframes
    assert len(s_async.map.points) >= 0.5 * len(s_sync.map.points)
    assert s_async.tracker.state in ("OK", "FULL")
