"""Sim3 refinement between two keyframes (loop-closure geometry).

TPU re-design of Optimizer::OptimizeSim3 (src/Optimizer.cc:976-1178): a
single Sim3 vertex with paired forward/inverse projection edges — point j
of KF2 projected into KF1 through S12, and point i of KF1 projected into
KF2 through S12^-1 — optimized in two stages with a chi2 outlier pass in
between (th2 = 9.210 sigma^2, bFixScale for stereo rigs).

One 7-parameter vertex: Jacobians come from vmapped forward-mode autodiff
of the exact residual; the 7x7 normal system solves in closed form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orbslam2_dualcam_tpu.ops import lie


def _project(K, x):
    z = jnp.where(jnp.abs(x[..., 2]) > 1e-9, x[..., 2], 1e-9)
    return jnp.stack([K[0, 0] * x[..., 0] / z + K[0, 2],
                      K[1, 1] * x[..., 1] / z + K[1, 2]], -1)


def optimize_sim3(S12_0: jax.Array, P1: jax.Array, P2: jax.Array,
                  uv1: jax.Array, uv2: jax.Array, inv_sigma2_1: jax.Array,
                  inv_sigma2_2: jax.Array, valid: jax.Array, K1: jax.Array,
                  K2: jax.Array, fix_scale: bool = False,
                  iters: int = 10, chi2_th: float = 9.210):
    """Refine S12 (maps KF2-camera points into KF1's camera frame).

    P1/P2 [N,3] matched map points in the two camera frames; uv1/uv2 their
    pixel measurements.  Returns (S12, inlier_mask, n_inliers)."""
    N = P1.shape[0]
    fs = jnp.bool_(fix_scale)

    def residuals(xi, S0):
        xi = jnp.where(fs, xi.at[6].set(0.0), xi)
        S = lie.sim3_exp(xi) @ S0
        Sinv = lie.sim3_inv(S)
        r1 = _project(K1, lie.sim3_apply(S, P2)) - uv1     # [N,2]
        r2 = _project(K2, lie.sim3_apply(Sinv, P1)) - uv2
        return r1, r2

    jac = jax.jacfwd(lambda xi, S0: residuals(xi, S0), argnums=0)

    def chi2_of(S0, mask):
        r1, r2 = residuals(jnp.zeros(7), S0)
        c1 = jnp.sum(r1 * r1, -1) * inv_sigma2_1
        c2 = jnp.sum(r2 * r2, -1) * inv_sigma2_2

        def rho(c):  # Huber cost for step acceptance
            return jnp.where(c <= chi2_th, c,
                             2.0 * jnp.sqrt(chi2_th * jnp.maximum(c, 0.0))
                             - chi2_th)

        cost = jnp.where(mask, rho(c1) + rho(c2), 0.0).sum()
        return c1, c2, cost

    def lm_stage(S0, mask, n_iters):
        def body(_, carry):
            S, lam, cost = carry
            r1, r2 = residuals(jnp.zeros(7), S)
            J1, J2 = jac(jnp.zeros(7), S)                   # [N,2,7] each
            # Huber weights (deltaHuber = sqrt(th2), Optimizer.cc:1054)
            c1 = jnp.sum(r1 * r1, -1) * inv_sigma2_1
            c2 = jnp.sum(r2 * r2, -1) * inv_sigma2_2
            h1 = jnp.where(c1 <= chi2_th, 1.0,
                           jnp.sqrt(chi2_th / jnp.maximum(c1, 1e-12)))
            h2 = jnp.where(c2 <= chi2_th, 1.0,
                           jnp.sqrt(chi2_th / jnp.maximum(c2, 1e-12)))
            w1 = jnp.where(mask, inv_sigma2_1 * h1, 0.0)
            w2 = jnp.where(mask, inv_sigma2_2 * h2, 0.0)
            H = (jnp.einsum('nri,n,nrj->ij', J1, w1, J1) +
                 jnp.einsum('nri,n,nrj->ij', J2, w2, J2))
            b = (jnp.einsum('nri,n,nr->i', J1, w1, r1) +
                 jnp.einsum('nri,n,nr->i', J2, w2, r2))
            dx = -jnp.linalg.solve(
                H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(7), b)
            dx = jnp.where(fs, dx.at[6].set(0.0), dx)
            S_new = lie.sim3_exp(dx) @ S
            _, _, new_cost = chi2_of(S_new, mask)
            accept = new_cost < cost
            S = jnp.where(accept, S_new, S)
            lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0),
                           1e-9, 1e6)
            cost = jnp.where(accept, new_cost, cost)
            return S, lam, cost

        _, _, cost0 = chi2_of(S0, mask)
        S, _, _ = jax.lax.fori_loop(0, n_iters, body,
                                    (S0, jnp.float32(1e-5), cost0))
        return S

    # stage 1 on all matches, outlier pass, stage 2 on survivors
    # (Optimizer.cc:1100-1160)
    S = lm_stage(S12_0, valid, iters)
    c1, c2, _ = chi2_of(S, valid)
    inl = valid & (c1 < chi2_th) & (c2 < chi2_th)
    S = lm_stage(S, inl, iters)
    c1, c2, _ = chi2_of(S, inl)
    inl = valid & (c1 < chi2_th) & (c2 < chi2_th)
    return S, inl, jnp.sum(inl)
