"""Motion-only pose optimization (frame-to-map).

TPU re-design of Optimizer::PoseOptimization (src/Optimizer.cc:250-405):
unary EdgeSE3ProjectXYZOnlyPose edges with the extrinsic-adjoint factor, run
as `rounds` x `iters` Levenberg-Marquardt with Huber weights and chi-square
inlier re-classification between rounds; the robust kernel is dropped in the
final round (Optimizer.cc:388-390).

Everything is one jitted program with static shapes: the edge set is padded
to N and masked, rounds/iters are unrolled lax loops, and the 6x6 normal
system is solved in closed form.  Returns (pose, inlier_mask, n_inliers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orbslam2_dualcam_tpu.ops import lie
from orbslam2_dualcam_tpu.optim import factors
from orbslam2_dualcam_tpu.utils.config import BAConfig


def chol_solve6(H: jax.Array, b: jax.Array) -> jax.Array:
    """Unrolled 6x6 Cholesky solve for the damped SPD normal system.

    jnp.linalg.solve lowers to pivoted LU through a general linalg path;
    for the 6x6 system inside the per-frame LM loop the fixed-size
    unrolled Cholesky + two triangular substitutions emit only simple
    scalar HLOs, which matters because the motion-only optimizer is
    serial-latency-bound, not FLOP-bound (RESULTS.md roofline)."""
    L = [[None] * 6 for _ in range(6)]
    for j in range(6):
        s = H[j, j] - sum((L[j][k] * L[j][k] for k in range(j)),
                          start=jnp.float32(0.0))
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        for i in range(j + 1, 6):
            s2 = H[i, j] - sum((L[i][k] * L[j][k] for k in range(j)),
                               start=jnp.float32(0.0))
            L[i][j] = s2 / d
    y = [None] * 6
    for i in range(6):
        y[i] = (b[i] - sum((L[i][k] * y[k] for k in range(i)),
                           start=jnp.float32(0.0))) / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        x[i] = (y[i] - sum((L[k][i] * x[k] for k in range(i + 1, 6)),
                           start=jnp.float32(0.0))) / L[i][i]
    return jnp.stack(x)


def optimize_pose(T_cw0: jax.Array, X: jax.Array, uv: jax.Array,
                  cam: jax.Array, inv_sigma2: jax.Array, valid: jax.Array,
                  T_sc: jax.Array, adj_sc: jax.Array, Ks: jax.Array,
                  cfg: BAConfig = BAConfig()):
    """Optimize one rig pose against fixed 3D points.

    T_cw0 [4,4]; X [N,3] world points; uv [N,2]; cam [N] camera index;
    inv_sigma2 [N]; valid [N] bool; T_sc/adj_sc/Ks [ncam,...] rig tables.
    """
    N = X.shape[0]
    Tsc_e = T_sc[cam]
    Adj_e = adj_sc[cam]
    K_e = Ks[cam]
    delta2 = cfg.huber_delta ** 2
    fx = K_e[:, 0, 0]
    fy = K_e[:, 1, 1]
    cx = K_e[:, 0, 2]
    cy = K_e[:, 1, 2]
    R_sc = Tsc_e[:, :3, :3]
    t_sc = Tsc_e[:, :3, 3]

    # the pose is SHARED by all edges: express residual/Jacobian math as
    # whole-array einsums against one 3x3/3 pose instead of vmapping 4x4
    # matmuls per edge (TPU hates batched tiny matmuls)
    def resid_xs(T):
        """Residuals and sibling-camera points at pose T — ONE pass."""
        x_c = X @ T[:3, :3].T + T[:3, 3]                       # [N,3]
        x_s = jnp.einsum('nij,nj->ni', R_sc, x_c) + t_sc       # [N,3]
        z = jnp.where(jnp.abs(x_s[:, 2]) > 1e-9, x_s[:, 2], 1e-9)
        u = fx * x_s[:, 0] / z + cx
        v = fy * x_s[:, 1] / z + cy
        return uv - jnp.stack([u, v], -1), x_s

    def jac_from_xs(x_s):
        """Pose Jacobian from cached sibling-camera points (no second
        pose application)."""
        z = jnp.where(jnp.abs(x_s[:, 2]) > 1e-9, x_s[:, 2], 1e-9)
        iz = 1.0 / z
        iz2 = iz * iz
        zeros = jnp.zeros_like(iz)
        Jpi = jnp.stack([
            jnp.stack([fx * iz, zeros, -fx * x_s[:, 0] * iz2], -1),
            jnp.stack([zeros, fy * iz, -fy * x_s[:, 1] * iz2], -1)], 1)
        # J_std = -Jpi @ [I | -hat(x_s)]; then right-multiplied by Adj
        hat_xs = jnp.zeros((N, 3, 3), X.dtype)
        hat_xs = hat_xs.at[:, 0, 1].set(-x_s[:, 2]).at[:, 0, 2].set(x_s[:, 1])
        hat_xs = hat_xs.at[:, 1, 0].set(x_s[:, 2]).at[:, 1, 2].set(-x_s[:, 0])
        hat_xs = hat_xs.at[:, 2, 0].set(-x_s[:, 1]).at[:, 2, 1].set(x_s[:, 0])
        J_std = jnp.concatenate(
            [-Jpi, jnp.einsum('nri,nij->nrj', Jpi, hat_xs)], -1)  # [N,2,6]
        return jnp.einsum('nri,nij->nrj', J_std, Adj_e)

    def chi2_of(r, mask):
        c = jnp.sum(r * r, -1) * inv_sigma2
        return c, jnp.where(mask, c, 0.0).sum()

    def step_from(T_b, x_s, c, r, lam, inlier, robust):
        """One damped normal-equation step from the current best state."""
        w = inv_sigma2 * jnp.where(
            robust, factors.huber_weight(c, delta2), 1.0)
        w = jnp.where(inlier, w, 0.0)
        J = jac_from_xs(x_s)
        H = jnp.einsum('nri,n,nrj->ij', J, w, J)
        b = jnp.einsum('nri,n,nr->i', J, w, r)
        dx = -chol_solve6(H + lam * jnp.diag(jnp.diag(H)) +
                          1e-9 * jnp.eye(6), b)
        return lie.se3_exp(dx) @ T_b

    def lm_round(T, r0, xs0, c0, cost0, inlier, robust):
        """One LM round of cfg.pose_iters trial evaluations on current
        inliers.  Deferred-acceptance structure: each iteration evaluates
        residuals ONCE (at the trial pose) and reuses the cached best-state
        residuals/points for the Jacobian when the trial is rejected — the
        classic LM loop evaluates the error twice per iteration (once for
        the linearization, once for the accept test), which doubles the
        serial small-op latency this optimizer is bound by."""

        def body(_, carry):
            T_b, r_b, xs_b, c_b, cost_b, lam, T_t = carry
            r, x_s = resid_xs(T_t)
            c, cost = chi2_of(r, inlier)
            accept = cost < cost_b
            T_b = jnp.where(accept, T_t, T_b)
            r_b = jnp.where(accept, r, r_b)
            xs_b = jnp.where(accept, x_s, xs_b)
            c_b = jnp.where(accept, c, c_b)
            cost_b = jnp.where(accept, cost, cost_b)
            lam = jnp.where(accept, lam / cfg.lm_lambda_factor,
                            lam * cfg.lm_lambda_factor)
            lam = jnp.clip(lam, 1e-8, 1e6)
            T_t = step_from(T_b, xs_b, c_b, r_b, lam, inlier, robust)
            return T_b, r_b, xs_b, c_b, cost_b, lam, T_t

        lam0 = jnp.float32(cfg.lm_lambda_init)
        # first trial outside the loop so every loop iteration is exactly
        # one residual evaluation + one step
        T_t = step_from(T, xs0, c0, r0, lam0, inlier, robust)
        T_b, r_b, xs_b, c_b, cost_b, _, _ = jax.lax.fori_loop(
            0, cfg.pose_iters, body,
            (T, r0, xs0, c0, cost0, lam0, T_t))
        return T_b, r_b, xs_b, c_b

    # unrolled rounds (pose_rounds is small & static)
    T = T_cw0
    inlier = valid
    r, x_s = resid_xs(T)
    for i in range(cfg.pose_rounds):
        robust = jnp.bool_(i < cfg.pose_rounds - 1)
        c, cost = chi2_of(r, inlier)
        T, r, x_s, c = lm_round(T, r, x_s, c, cost, inlier, robust)
        # re-classify against the full valid set each round
        # (Optimizer.cc:361-384 flips outliers back if they pass again)
        inlier = valid & (c <= cfg.chi2_mono)

    return T, inlier, jnp.sum(inlier)
