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
    def cam_points(T):
        x_c = X @ T[:3, :3].T + T[:3, 3]                       # [N,3]
        x_s = jnp.einsum('nij,nj->ni', R_sc, x_c) + t_sc       # [N,3]
        return x_c, x_s

    def residuals(T):
        _, x_s = cam_points(T)
        z = jnp.where(jnp.abs(x_s[:, 2]) > 1e-9, x_s[:, 2], 1e-9)
        u = fx * x_s[:, 0] / z + cx
        v = fy * x_s[:, 1] / z + cy
        return uv - jnp.stack([u, v], -1)

    def jacobians(T):
        _, x_s = cam_points(T)
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

    def chi2_of(T, mask):
        r = residuals(T)
        c = jnp.sum(r * r, -1) * inv_sigma2
        return c, jnp.where(mask, c, 0.0).sum()

    def lm_round(T, inlier, robust):
        """One LM round of cfg.pose_iters iterations on current inliers."""

        def body(_, carry):
            T, lam, cost = carry
            r = residuals(T)                        # [N,2]
            J = jacobians(T)                        # [N,2,6]
            c = jnp.sum(r * r, -1) * inv_sigma2
            w = inv_sigma2 * jnp.where(
                robust, factors.huber_weight(c, delta2), 1.0)
            w = jnp.where(inlier, w, 0.0)
            H = jnp.einsum('nri,n,nrj->ij', J, w, J)
            b = jnp.einsum('nri,n,nr->i', J, w, r)
            dx = -jnp.linalg.solve(H + lam * jnp.diag(jnp.diag(H)) +
                                   1e-9 * jnp.eye(6), b)
            T_new = lie.se3_exp(dx) @ T
            _, new_cost = chi2_of(T_new, inlier)
            accept = new_cost < cost
            T = jnp.where(accept, T_new, T)
            lam = jnp.where(accept, lam / cfg.lm_lambda_factor,
                            lam * cfg.lm_lambda_factor)
            lam = jnp.clip(lam, 1e-8, 1e6)
            cost = jnp.where(accept, new_cost, cost)
            return T, lam, cost

        _, cost0 = chi2_of(T, inlier)
        T, _, _ = jax.lax.fori_loop(
            0, cfg.pose_iters, body, (T, jnp.float32(cfg.lm_lambda_init), cost0))
        return T

    # unrolled rounds (pose_rounds is small & static)
    T = T_cw0
    inlier = valid
    for i in range(cfg.pose_rounds):
        robust = jnp.bool_(i < cfg.pose_rounds - 1)
        T = lm_round(T, inlier, robust)
        c, _ = chi2_of(T, inlier)
        # re-classify against the full valid set each round
        # (Optimizer.cc:361-384 flips outliers back if they pass again)
        inlier = valid & (c <= cfg.chi2_mono)

    return T, inlier, jnp.sum(inlier)
