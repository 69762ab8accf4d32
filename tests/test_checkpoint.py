import numpy as np

from orbslam2_dualcam_tpu.models.map import KeyFrame, Map
from orbslam2_dualcam_tpu.utils import checkpoint


def make_small_map(rng):
    m = Map()
    for k in range(3):
        N = 40
        kf = KeyFrame(
            kid=m.new_kid(), frame_id=k * 2,
            T_cw=np.eye(4) + 0.01 * k,
            uv=rng.uniform(0, 320, (N, 2)),
            kp_cam=np.zeros(N, np.int64),
            level=rng.integers(0, 4, N).astype(np.int32),
            angle=rng.uniform(-3, 3, N).astype(np.float32),
            desc=rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32),
            kp_valid=np.ones(N, bool),
            mp_idx=np.full(N, -1, np.int64),
            word=rng.integers(0, 100, N), node=rng.integers(0, 10, N))
        m.add_keyframe(kf)
    kfs = list(m.keyframes.values())
    for i in range(20):
        mp = m.new_point(rng.normal(size=3), kfs[0].kid, 0)
        m.add_observation(mp, kfs[0], i, 0)
        m.add_observation(mp, kfs[1], i, 0)
        if i % 2 == 0:
            m.add_observation(mp, kfs[2], i, 1)
    for kf in kfs:
        m.update_connections(kf)
    m.map_scaled = True
    m.first_scale_kid = kfs[1].kid
    return m


def test_roundtrip(rng, tmp_path):
    m = make_small_map(rng)
    p = str(tmp_path / "map.npz")
    checkpoint.save_map(m, p)
    m2 = checkpoint.load_map(p)
    assert m2.n_keyframes == m.n_keyframes
    assert m2.n_points == m.n_points
    assert m2.map_scaled and m2.first_scale_kid == m.first_scale_kid
    for kid, kf in m.keyframes.items():
        kf2 = m2.keyframes[kid]
        np.testing.assert_array_equal(kf2.T_cw, kf.T_cw)
        np.testing.assert_array_equal(kf2.desc, kf.desc)
        np.testing.assert_array_equal(kf2.mp_idx, kf.mp_idx)
        assert kf2.covis == kf.covis
    for mid, mp in m.points.items():
        mp2 = m2.points[mid]
        np.testing.assert_array_equal(mp2.pos, mp.pos)
        assert mp2.obs == mp.obs
        assert mp2.obs_cam == mp.obs_cam
        assert mp2.seen_by_multiple_cams == mp.seen_by_multiple_cams


def test_localization_against_restored_map(rng, tmp_path):
    """Restored map supports continued operation: erase/replace bookkeeping
    still works on loaded objects."""
    m = make_small_map(rng)
    p = str(tmp_path / "map.npz")
    checkpoint.save_map(m, p)
    m2 = checkpoint.load_map(p)
    mid = next(iter(m2.points))
    mp = m2.points[mid]
    kid = next(iter(mp.obs))
    m2.erase_observation(mp, kid)
    assert kid not in mp.obs
