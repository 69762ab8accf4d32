"""Two-view epipolar geometry: triangulation, fundamental matrices,
epipolar checks.

Replaces the reference's per-point cv::SVD DLT triangulation
(Initializer.cc:752-765, LocalMapping.cc:384-420) and the cross-keyframe,
cross-camera fundamental-matrix composition ComputeF12
(LocalMapping.cc:812-873) with batched closed-form JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orbslam2_dualcam_tpu.ops import lie


def triangulate_dlt(P1: jax.Array, P2: jax.Array, uv1: jax.Array,
                    uv2: jax.Array) -> jax.Array:
    """Linear DLT triangulation for point batches.

    P1, P2: (3, 4) projection matrices (K [R|t]); uv1, uv2: (..., 2) pixels.
    Returns (..., 3) world points.  Uses a batched SVD of the row-normalized
    4x4 DLT system (the reference does per-point cv::SVD in float64 at
    Initializer.cc:761; in float32 the normal-equation shortcut A^T A
    squares the condition number and loses ~5px of accuracy, so we keep the
    direct factorization and normalize rows)."""
    def row(P, u, axis):
        return u[..., None] * P[2] - P[axis]

    A = jnp.stack([
        row(P1, uv1[..., 0], 0),
        row(P1, uv1[..., 1], 1),
        row(P2, uv2[..., 0], 0),
        row(P2, uv2[..., 1], 1),
    ], axis=-2)                                   # (..., 4, 4)
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    _, _, Vt = jnp.linalg.svd(A)
    X = Vt[..., 3, :]                             # smallest singular vector
    wcomp = X[..., 3]
    return X[..., :3] / jnp.where(jnp.abs(wcomp) > 1e-12, wcomp, 1e-12)[..., None]


def projection_matrix(K: jax.Array, T_cw: jax.Array) -> jax.Array:
    """K [R|t] from intrinsics and world->camera transform."""
    return K @ T_cw[:3, :4]


def fundamental_from_poses(K1: jax.Array, T_1w: jax.Array, K2: jax.Array,
                           T_2w: jax.Array) -> jax.Array:
    """F12 such that x1^T F12 x2 = 0 for corresponding pixels.

    Matches LocalMapping::ComputeF12 (LocalMapping.cc:812-873): with
    T_12 = T_1w inv(T_2w), F12 = K1^-T [t12]x R12 K2^-1."""
    T_12 = T_1w @ lie.se3_inv(T_2w)
    R12 = T_12[:3, :3]
    t12 = T_12[:3, 3]
    E = lie.hat(t12) @ R12
    return jnp.linalg.inv(K1).T @ E @ jnp.linalg.inv(K2)


def epipolar_dist2(F12: jax.Array, uv1: jax.Array, uv2: jax.Array) -> jax.Array:
    """Squared distance of x2 to the epipolar line of x1 (ORBmatcher.cc
    CheckDistEpipolarLine semantics, def near :1982)."""
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], axis=-1)
    line = x1 @ F12                                  # l2 = F12^T x1  (a,b,c)
    num = (line[..., 0] * uv2[..., 0] + line[..., 1] * uv2[..., 1] + line[..., 2])
    den = line[..., 0] ** 2 + line[..., 1] ** 2
    return num * num / jnp.where(den > 1e-12, den, 1e-12)


def triangulation_checks(T_1w: jax.Array, T_2w: jax.Array, X: jax.Array,
                         K1: jax.Array, K2: jax.Array, uv1: jax.Array,
                         uv2: jax.Array, sigma2_1: jax.Array,
                         sigma2_2: jax.Array, chi2: float = 5.991,
                         min_parallax_cos: float = 0.9998):
    """Cheirality, parallax, and reprojection gates used when creating new
    map points (LocalMapping.cc:384-470).  Returns a bool mask."""
    c1 = -T_1w[:3, :3].T @ T_1w[:3, 3]
    c2 = -T_2w[:3, :3].T @ T_2w[:3, 3]
    ray1 = X - c1
    ray2 = X - c2
    cosp = jnp.sum(ray1 * ray2, -1) / (
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1) + 1e-12)
    x1 = lie.se3_apply(T_1w, X)
    x2 = lie.se3_apply(T_2w, X)
    z1 = x1[..., 2]
    z2 = x2[..., 2]

    def reproj_err2(K, xc, uv):
        u = K[0, 0] * xc[..., 0] / jnp.where(xc[..., 2] > 1e-9, xc[..., 2], 1e-9) + K[0, 2]
        v = K[1, 1] * xc[..., 1] / jnp.where(xc[..., 2] > 1e-9, xc[..., 2], 1e-9) + K[1, 2]
        return (u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2

    ok = (z1 > 0) & (z2 > 0)
    ok &= cosp < min_parallax_cos
    ok &= reproj_err2(K1, x1, uv1) < chi2 * sigma2_1
    ok &= reproj_err2(K2, x2, uv2) < chi2 * sigma2_2
    return ok
