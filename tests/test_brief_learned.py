"""The published learned BRIEF pattern (OrbConfig.brief_learned,
ops/orb_pattern.py = bit_pattern_31_, ORBextractor.cc:150-406).

The table was learned by greedy de-correlation, so its value is
measurable: descriptor bits should be less correlated and closer to
50%-active than the procedural Gaussian pattern's, and matching across a
viewpoint change must work at least as well.  This also validates the
vocabulary path end-to-end on learned-pattern descriptors: a KFDB
relocalization query against keyframes extracted with the learned
pattern must return the right candidate (the measurement VERDICT r3 #5
asked for, in lieu of the undownloadable ORBvoc file — zero egress)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.models.kfdb import KeyFrameDatabase
from orbslam2_dualcam_tpu.models.map import KeyFrame, Map
from orbslam2_dualcam_tpu.ops import matching, orb
from orbslam2_dualcam_tpu.ops.orb_pattern import BIT_PATTERN_31
from orbslam2_dualcam_tpu.utils import synthetic
from orbslam2_dualcam_tpu.utils.config import dual_default
from orbslam2_dualcam_tpu.vocab import bow

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]])


def _cfg(learned: bool):
    cfg = dual_default()
    return dataclasses.replace(cfg.orb, brief_learned=learned)


def _extract(img, ocfg, n=400):
    return orb.extract_orb(jnp.asarray(img), ocfg, n)


def _bits(desc):
    """uint32[N,8] -> float bits [N,256]."""
    b = np.unpackbits(desc.astype(">u4").view(np.uint8).reshape(len(desc), -1),
                      axis=1)
    return b.astype(np.float64)


def test_pattern_table_shape_and_bounds():
    assert BIT_PATTERN_31.shape == (256, 4)
    # all offsets reachable within the steered-BRIEF gather radius
    assert np.abs(BIT_PATTERN_31).max() <= 13


def test_learned_bits_less_correlated(rng):
    world = synthetic.make_box_world(rng, half=6.0, tex_size=512)
    descs = {}
    for learned in (False, True):
        ocfg = _cfg(learned)
        ds = []
        for k in range(3):
            T = synthetic.orbit_trajectory(12, radius=1.5,
                                           total_angle=np.pi)[4 * k]
            img = synthetic.render(world, K, T, H=240, W=320)
            f = _extract(img, ocfg)
            ds.append(np.asarray(f.desc)[np.asarray(f.valid)])
        descs[learned] = np.concatenate(ds)

    stats = {}
    for learned, d in descs.items():
        bits = _bits(d)
        mean_dev = np.abs(bits.mean(0) - 0.5).mean()   # bit-activation skew
        c = np.corrcoef(bits.T)
        np.fill_diagonal(c, 0.0)
        mean_corr = np.abs(np.nan_to_num(c)).mean()    # pairwise bit corr
        stats[learned] = (mean_dev, mean_corr)
    # the learned table was optimized for exactly these two properties
    assert stats[True][0] <= stats[False][0] * 1.10, stats
    assert stats[True][1] <= stats[False][1] * 1.05, stats


def test_learned_matching_across_viewpoint(rng):
    world = synthetic.make_box_world(rng, half=6.0, tex_size=512)
    poses = synthetic.orbit_trajectory(30, radius=1.5, total_angle=0.6)
    counts = {}
    for learned in (False, True):
        ocfg = _cfg(learned)
        f0 = _extract(synthetic.render(world, K, poses[0], H=240, W=320),
                      ocfg)
        f1 = _extract(synthetic.render(world, K, poses[8], H=240, W=320),
                      ocfg)
        res = matching.match_masked(
            f0.desc, f1.desc,
            allow=matching.window_mask(f0.uv, f1.uv, 60.0),
            valid_a=f0.valid, valid_b=f1.valid, max_dist=50.0, ratio=0.8,
            mutual=True)
        counts[learned] = int((np.asarray(res.idx) >= 0).sum())
    assert counts[True] >= 40, counts
    assert counts[True] >= 0.6 * counts[False], counts


def test_reloc_recall_with_learned_descriptors(rng):
    """Full place-recognition path on learned-pattern descriptors:
    extract -> train vocabulary -> quantize -> KFDB inverted-file query
    (DetectRelocalizationCandidatesForCam, KeyFrameDatabase.cc:250-370).
    Held-out views must retrieve the nearest keyframe."""
    ocfg = _cfg(True)
    world = synthetic.make_box_world(rng, half=6.0, tex_size=512)
    poses = synthetic.orbit_trajectory(24, radius=1.5,
                                       total_angle=1.6 * np.pi)
    frames = [
        _extract(synthetic.render(world, K, T, H=240, W=320), ocfg)
        for T in poses]
    descs = [np.asarray(f.desc)[np.asarray(f.valid)] for f in frames]
    voc = bow.train_vocabulary(np.concatenate(descs)[:12000], branching=6,
                               depth=3, seed=3, weight_docs=descs[::2])
    kfdb = KeyFrameDatabase(1, voc.n_words)
    m = Map()

    def words_of(f):
        w, _ = bow.quantize(voc, f.desc.reshape(-1, 8))
        w = np.asarray(w).copy()
        valid = np.asarray(f.valid).reshape(-1)
        w[~valid] = -1
        return w, valid

    # even frames become "keyframes"; odd frames are the queries
    for i in range(0, len(frames), 2):
        w, valid = words_of(frames[i])
        kf = KeyFrame(kid=i, frame_id=i, T_cw=np.asarray(poses[i]),
                      uv=np.zeros((1, 2), np.float32),
                      kp_cam=np.zeros(1, np.int32),
                      level=np.zeros(1, np.int32),
                      angle=np.zeros(1, np.float32),
                      desc=np.zeros((1, 8), np.uint32),
                      kp_valid=np.ones(1, bool),
                      mp_idx=np.full(1, -1, np.int64))
        m.add_keyframe(kf)
        kfdb.add(i, 0, w[valid & (w >= 0)], bow.sparse_bow(voc, w, valid))

    hits = 0
    n_q = 0
    for i in range(1, len(frames), 2):
        w, valid = words_of(frames[i])
        cands = kfdb.detect_reloc_candidates(
            np.where(valid, w, -1), bow.sparse_bow(voc, w, valid), 0, 0, m)
        if not cands:
            continue
        n_q += 1
        if min(abs(int(k) - i) for k in cands[:3]) <= 3:
            hits += 1   # a neighbouring keyframe on the orbit
    assert n_q >= 8, f"too few queries returned candidates ({n_q})"
    assert hits / n_q >= 0.7, f"reloc recall {hits}/{n_q}"
