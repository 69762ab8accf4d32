"""Essential-graph (Sim3 pose graph) solver in isolation: a drifted loop
with one correct loop edge must redistribute the drift."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.ops import lie
from orbslam2_dualcam_tpu.optim import pose_graph


def make_drifted_loop(rng, n=24, drift_scale=1.01, drift_rot=0.01):
    """Ground truth: poses around a circle. Estimated: same relative motions
    but each step multiplied by a small drift (in rotation and scale)."""
    gt = []
    for k in range(n):
        a = 2 * np.pi * k / n
        R_wc = np.asarray(lie.so3_exp(jnp.asarray([0.0, a, 0.0])))
        T_wc = np.eye(4)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = [2 * np.sin(a), 0.0, -2 * np.cos(a)]
        gt.append(np.linalg.inv(T_wc))
    est = [gt[0]]
    for k in range(1, n):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        # inject drift: scale the translation, perturb rotation slightly
        d = np.eye(4)
        d[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(
            [0.0, drift_rot, 0.0])))
        rel = d @ rel
        rel[:3, 3] *= drift_scale
        est.append(rel @ est[-1])
    return np.stack(gt), np.stack(est)


def test_pose_graph_closes_drift(rng):
    n = 24
    gt, est = make_drifted_loop(rng, n)
    # edges: odometry chain measured from the DRIFTED estimates (consistent
    # with est), plus one loop edge 0<->n-1 measured from ground truth
    e_i, e_j, S_meas = [], [], []
    for k in range(1, n):
        e_i.append(k)
        e_j.append(k - 1)
        S_meas.append(est[k] @ np.linalg.inv(est[k - 1]))
    e_i.append(n - 1)
    e_j.append(0)
    S_meas.append(gt[n - 1] @ np.linalg.inv(gt[0]))

    fixed = np.zeros(n, bool)
    fixed[0] = True
    S_opt, cost = pose_graph.optimize_pose_graph(
        jnp.asarray(np.stack(est), jnp.float32),
        jnp.asarray(e_i, jnp.int32), jnp.asarray(e_j, jnp.int32),
        jnp.asarray(np.stack(S_meas), jnp.float32),
        jnp.ones(len(e_i), bool), jnp.asarray(fixed), iters=40)
    S_opt = np.asarray(S_opt)

    # drift error before vs after, against ground truth centers
    def centers(Ts):
        out = []
        for T in Ts:
            sR = T[:3, :3]
            s = np.cbrt(np.linalg.det(sR))
            out.append(-(sR / s).T @ (T[:3, 3] / s))
        return np.asarray(out)

    err_before = np.linalg.norm(centers(est) - centers(gt), axis=1)
    err_after = np.linalg.norm(centers(S_opt) - centers(gt), axis=1)
    assert err_before.max() > 0.4            # the drift is substantial
    assert err_after.max() < 0.35 * err_before.max(), (
        err_before.max(), err_after.max())
    assert err_after.mean() < 0.5 * err_before.mean()


def test_pose_graph_consistent_input_is_fixed_point(rng):
    """With measurements exactly matching the estimates, optimization must
    not move anything."""
    n = 10
    gt, est = make_drifted_loop(rng, n, drift_scale=1.0, drift_rot=0.0)
    e_i = jnp.asarray(np.arange(1, n), jnp.int32)
    e_j = jnp.asarray(np.arange(0, n - 1), jnp.int32)
    S_meas = jnp.asarray(np.stack(
        [gt[k] @ np.linalg.inv(gt[k - 1]) for k in range(1, n)]), jnp.float32)
    fixed = jnp.zeros(n, bool).at[0].set(True)
    S_opt, cost = pose_graph.optimize_pose_graph(
        jnp.asarray(gt, jnp.float32), e_i, e_j, S_meas,
        jnp.ones(n - 1, bool), fixed, iters=10)
    np.testing.assert_allclose(np.asarray(S_opt), gt, atol=1e-3)
