"""Oracle-anchor cross-check of the leading-regime scale-observability claim.

tests/test_dual_slam.py gates the harsh 180-deg / 10 cm rig at a measured
scale floor (s up to ~3x) and RESULTS.md argues this is an INFORMATION
limit of the fixture — the per-anchor baseline signal sits below the mono
map's own pose drift — not an estimator gap.  This experiment removes the
estimator's two failure modes one at a time by feeding it GROUND TRUTH:

  A. oracle ASSOCIATION + oracle cam-1 pose: the secondary camera's
     center is placed exactly where ground truth says (in map units, via
     the true Sim3 alignment).  The scale estimate still uses the MAP's
     drifty rig centers — the reference's formula
     s_i = |t_extrinsic| / |dC_map| (Tracking.cc:1014-1029).
     If the estimate is still wrong, no recognition/matching improvement
     could ever fix it: the map-side center error dominates.

  B. full oracle (BOTH centers from ground truth): must recover the true
     alpha exactly — methodology sanity check.

Also prints the per-keyframe map drift |C_map - align^-1(C_gt)| against
the per-anchor signal |baseline| / alpha, the two numbers whose ratio IS
the observability argument.

Run: python examples/exp_oracle_scale.py   (forced CPU, ~6 min)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orbslam2_dualcam_tpu.ops import lie, orb
    from orbslam2_dualcam_tpu.pipeline.system import System
    from orbslam2_dualcam_tpu.utils import metrics, synthetic
    from orbslam2_dualcam_tpu.vocab import bow
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_dual_slam import dual_cfg

    rng = np.random.default_rng(3)
    cfg = dual_cfg()
    world = synthetic.make_box_world(rng, half=6.0)
    K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]])
    descs = []
    for T in synthetic.orbit_trajectory(10, radius=1.0):
        img = synthetic.render(world, K, T, H=240, W=320)
        f = orb.extract_orb(jnp.asarray(img), cfg.orb, 400)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = bow.train_vocabulary(np.concatenate(descs), branching=8, depth=3,
                               seed=9, weight_docs=descs)

    # mono-only run of the dual fixture trajectory: disable the dual
    # bootstrap so the map stays in its arbitrary mono scale
    sys_ = System(cfg, voc=voc, enable_loop_closing=False)
    sys_.tracker.next_cross_try = 10 ** 9
    poses = synthetic.out_and_back_trajectory(n_out=26, n_turn=30,
                                              n_back=26)
    Ks = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    for k, T_cw in enumerate(poses):
        imgs = synthetic.render_rig(world, Ks, T_sc, T_cw, H=240, W=320)
        sys_.track(imgs, k / 30.0)
    m = sys_.map
    print(f"mono map: {m.n_keyframes} KFs, {m.n_points} points, "
          f"events LOST={sum(1 for e in sys_.tracker.events if 'LOST' in e)}")

    # true Sim3 alignment map -> metric (alpha_true = map->metric scale)
    kids = sorted(m.keyframes.keys())
    est, gt = [], []
    for kid in kids:
        kf = m.keyframes[kid]
        est.append(kf.center())
        Tg = poses[kf.frame_id]
        gt.append(-Tg[:3, :3].T @ Tg[:3, 3])
    est = np.asarray(est)
    gt = np.asarray(gt)
    R, t, s_true = metrics.align_umeyama(est, gt, with_scale=True)
    # the dual bootstrap estimates alpha = metric->map (applied to the
    # map); report in the same convention as the fixture: map->metric
    print(f"alpha_true (map->metric, Umeyama): {s_true:.3f}")

    def to_map(x_metric):
        return R.T @ (x_metric - t) / s_true

    drift = np.linalg.norm(est - np.stack([to_map(g) for g in gt]), axis=1)
    baseline = np.linalg.norm(np.asarray(sys_.rig.T_sc)[1][:3, 3])
    print(f"per-KF map drift |C_map - oracle|: median "
          f"{np.median(drift):.4f}, p90 {np.percentile(drift, 90):.4f} "
          f"(map units)")
    print(f"per-anchor signal |baseline|/alpha = "
          f"{baseline / s_true:.4f} (map units)")

    # --- A: oracle association + oracle cam-1 center, MAP rig center
    T_sc1 = np.asarray(sys_.rig.T_sc)[1]
    sA, sB = [], []
    for kid in kids:
        kf = m.keyframes[kid]
        Tg = poses[kf.frame_id]                 # true rig pose (metric)
        T_c1 = T_sc1 @ Tg
        c1_metric = -T_c1[:3, :3].T @ T_c1[:3, 3]
        c1_map = to_map(c1_metric)
        c0_map_est = kf.center()                # drifty map estimate
        dA = np.linalg.norm(c0_map_est - c1_map)
        if dA > 1e-9:
            sA.append(baseline / dA)
        # B: both centers oracle
        c0_metric = -Tg[:3, :3].T @ Tg[:3, 3]
        dB = np.linalg.norm(to_map(c0_metric) - c1_map)
        if dB > 1e-9:
            sB.append(baseline / dB)
    sA = np.asarray(sA)
    sB = np.asarray(sB)
    print(f"A (oracle cam-1, map rig center): median s = "
          f"{np.median(sA):.3f}  IQR [{np.percentile(sA, 25):.3f}, "
          f"{np.percentile(sA, 75):.3f}]  vs alpha_true {s_true:.3f}")
    print(f"B (full oracle, sanity):          median s = "
          f"{np.median(sB):.3f}  (must equal alpha_true)")
    rel = np.median(sA) / s_true
    noise = np.median(drift) / (baseline / s_true)
    if not 0.5 < rel < 2.0:
        verdict = (f"INFORMATION LIMIT: oracle anchors still off {rel:.2f}x"
                   f" — map drift (median {np.median(drift):.3f} units) "
                   f"swamps the {baseline / s_true:.3f}-unit baseline.")
    elif not 0.8 < rel < 1.25:
        verdict = (
            f"PARTIAL: oracle association + oracle cam-1 pose recovers "
            f"scale to {abs(rel - 1) * 100:.0f}% (drift/signal = "
            f"{noise:.2f}) — the information IS in a clean mono map at "
            f"this accuracy; the pipeline's larger floor comes from the "
            f"parts the oracle replaced (the PnP cross-reloc pose of the "
            f"secondary camera) plus bootstrap-time map perturbation, "
            f"NOT from map geometry alone.")
    else:
        verdict = ("ESTIMATOR GAP: oracle anchors recover the scale — "
                   "the pipeline's estimate should too; investigate.")
    print(verdict)


if __name__ == "__main__":
    main()
