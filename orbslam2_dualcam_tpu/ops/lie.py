"""SO3 / SE3 / Sim3 Lie-group operations, pure JAX.

Replaces the reference's g2o SE3Quat (Thirdparty/g2o/g2o/types/se3quat.h) and
Sim3 (sim3.h) plus the Eigen quaternion handling in Tracking.cc:147-170 and
Converter.cc.  Everything here is unbatched on the trailing axes and written
to be `jax.vmap`-able over leading axes; all shapes static.

Conventions
-----------
* Rigid transforms are 4x4 homogeneous matrices ``T``; ``T @ [x;1]`` maps a
  point from the source frame into the destination frame (same convention as
  the reference: ``Tcw`` maps world -> camera, Frame.cc:222-234).
* Quaternions are (w, x, y, z), matching the YAML extrinsic parsing order
  (Tracking.cc:147-155).
* se3 tangent vectors are ``[rho(3), phi(3)]`` (translation first), matching
  g2o's SE3Quat::exp layout so iteration budgets / damping transfer.
* sim3 tangent vectors are ``[rho(3), phi(3), sigma(1)]`` with scale
  ``s = exp(sigma)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------

def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector: hat(v) @ x == cross(v, x)."""
    z = jnp.zeros((), v.dtype)
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z]),
    ])


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues: axis-angle 3-vector -> rotation matrix (Taylor-safe)."""
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi)
    # sin(t)/t and (1-cos t)/t^2 with small-angle series fallback
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    return jnp.eye(3, dtype=phi.dtype) + a * K + b * (K @ K)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle 3-vector (principal branch).

    cos is clipped strictly inside (-1, 1): at exactly 1 the arccos
    derivative is -inf, which poisons autodiff for identity rotations (the
    pose-graph chain edges hit this exactly)."""
    cos_t = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    w = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    # theta/(2 sin theta), series-safe near 0; near pi fall back to the
    # diagonal-based extraction.
    sin_t = jnp.sin(theta)
    scale = jnp.where(jnp.abs(sin_t) > 1e-5,
                      theta / (2.0 * sin_t + _EPS),
                      0.5 + theta * theta / 12.0)
    small = scale * w
    # near-pi branch: |w| ~ 0 but rotation is large.  R + R^T =
    # 2cos(t) I + 2(1-cos t) nn^T, so the off-diagonal sums give the sign
    # pattern n_i n_j: anchor the largest-magnitude component positive and
    # read the other signs from its row of (R + R^T).
    diag = jnp.clip((jnp.diagonal(R) - cos_t) / (1.0 - cos_t + _EPS), 0.0, None)
    axis_mag = jnp.sqrt(diag + _EPS)
    k = jnp.argmax(diag)
    offsum = R + R.T
    signs = jnp.sign(offsum[k] + _EPS)
    signs = signs.at[k].set(1.0)
    big = theta * axis_mag * signs
    return jnp.where(theta < 3.0, small, big)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion (w,x,y,z) -> rotation matrix."""
    q = q / (jnp.linalg.norm(q) + _EPS)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
    ])


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (w,x,y,z), branchless Shepperd."""
    # four candidate constructions, pick numerically-largest pivot
    t = jnp.trace(R)
    qw = jnp.sqrt(jnp.clip(1.0 + t, _EPS, None)) * 0.5
    qx = jnp.sqrt(jnp.clip(1.0 + R[0, 0] - R[1, 1] - R[2, 2], _EPS, None)) * 0.5
    qy = jnp.sqrt(jnp.clip(1.0 - R[0, 0] + R[1, 1] - R[2, 2], _EPS, None)) * 0.5
    qz = jnp.sqrt(jnp.clip(1.0 - R[0, 0] - R[1, 1] + R[2, 2], _EPS, None)) * 0.5
    qx = qx * jnp.sign(R[2, 1] - R[1, 2] + _EPS)
    qy = qy * jnp.sign(R[0, 2] - R[2, 0] + _EPS)
    qz = qz * jnp.sign(R[1, 0] - R[0, 1] + _EPS)
    q = jnp.stack([qw, qx, qy, qz])
    return q / (jnp.linalg.norm(q) + _EPS)


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------

def se3(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble a 4x4 transform from R (3,3) and t (3,)."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R).at[:3, 3].set(t)
    return T


def se3_inv(T: jax.Array) -> jax.Array:
    R = T[:3, :3]
    t = T[:3, 3]
    return se3(R.T, -R.T @ t)


def se3_apply(T: jax.Array, x: jax.Array) -> jax.Array:
    """Apply to points with trailing dim 3; x may be (..., 3)."""
    return x @ T[:3, :3].T + T[:3, 3]


def _V_matrix(phi: jax.Array) -> jax.Array:
    """Left Jacobian of SO3 (the 'V' in se3 exp)."""
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    c = jnp.where(theta2 > _EPS, (theta - jnp.sin(theta)) / (theta2 * theta),
                  1.0 / 6.0 - theta2 / 120.0)
    return jnp.eye(3, dtype=phi.dtype) + b * K + c * (K @ K)


def se3_exp(xi: jax.Array) -> jax.Array:
    """se3 tangent [rho, phi] -> 4x4 transform (g2o SE3Quat::exp layout)."""
    rho, phi = xi[:3], xi[3:6]
    R = so3_exp(phi)
    t = _V_matrix(phi) @ rho
    return se3(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    phi = so3_log(T[:3, :3])
    V = _V_matrix(phi)
    rho = jnp.linalg.solve(V, T[:3, 3])
    return jnp.concatenate([rho, phi])


def se3_adjoint(T: jax.Array) -> jax.Array:
    """6x6 adjoint with the reference's block layout.

    The reference precomputes per-camera ``Adj = [[R, hat(t) R], [0, R]]``
    (Cameras.cc:17-52, with rows/cols ordered [trans, rot] to match g2o's
    [rho, phi] tangent convention) and right-multiplies the standard SE3
    reprojection Jacobian by it (types_six_dof_expmap.cpp:144-159) so that a
    measurement in sibling camera ``s`` differentiates w.r.t. the *rig* pose.
    Satisfies se3_exp(Adj(T) @ xi) == T @ se3_exp(xi) @ inv(T).
    """
    R = T[:3, :3]
    t = T[:3, 3]
    top = jnp.concatenate([R, hat(t) @ R], axis=1)
    bot = jnp.concatenate([jnp.zeros((3, 3), T.dtype), R], axis=1)
    return jnp.concatenate([top, bot], axis=0)


# ---------------------------------------------------------------------------
# Sim3
# ---------------------------------------------------------------------------

def sim3(R: jax.Array, t: jax.Array, s: jax.Array) -> jax.Array:
    """Pack a similarity transform as a 4x4 matrix [[sR, t], [0, 1]]."""
    T = jnp.eye(4, dtype=R.dtype)
    return T.at[:3, :3].set(s * R).at[:3, 3].set(t)


def sim3_parts(S: jax.Array):
    """Unpack [[sR, t],[0,1]] -> (R, t, s)."""
    sR = S[:3, :3]
    s = jnp.exp(jnp.log(jnp.linalg.det(sR) + _EPS) / 3.0)
    return sR / s, S[:3, 3], s


def sim3_inv(S: jax.Array) -> jax.Array:
    R, t, s = sim3_parts(S)
    return sim3(R.T, -(R.T @ t) / s, 1.0 / s)


def sim3_apply(S: jax.Array, x: jax.Array) -> jax.Array:
    return x @ S[:3, :3].T + S[:3, 3]


def sim3_exp(xi: jax.Array) -> jax.Array:
    """sim3 tangent [rho, phi, sigma] -> 4x4 similarity.

    Uses the closed-form W matrix (Ethan Eade's Lie-group notes)."""
    rho, phi, sigma = xi[:3], xi[3:6], xi[6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi)
    # coefficients of W = a I + b K + c K^2 s.t. t = W rho
    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-4
    small_th = theta2 < _EPS

    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / jnp.where(small_sig, 1.0, sigma))
    # b,c terms mixing sigma and theta (series-safe):
    denom = sig2 + theta2 + _EPS * _EPS
    esin = s * jnp.sin(theta)
    ecos = s * jnp.cos(theta)
    b_big = (sigma * esin + theta * (1.0 - ecos)) / (theta * denom + _EPS)
    c_big = (A - (ecos - 1.0) * sigma / denom - esin * theta / denom) / (theta2 + _EPS)
    b_small = jnp.where(small_sig, 0.5 + sigma / 3.0, (sigma * s - s + 1.0) / jnp.where(small_sig, 1.0, sig2))
    c_small = jnp.where(small_sig, 1.0 / 6.0 + sigma / 8.0,
                        (s * (0.5 * sig2 - sigma + 1.0) - 1.0) / jnp.where(small_sig, 1.0, sig2 * sigma + _EPS))
    b = jnp.where(small_th, b_small, b_big)
    c = jnp.where(small_th, c_small, c_big)
    W = A * jnp.eye(3, dtype=phi.dtype) + b * K + c * (K @ K)
    return sim3(R, W @ rho, s)


def sim3_log(S: jax.Array) -> jax.Array:
    """Inverse of sim3_exp via solving for rho (W is invertible)."""
    R, t, s = sim3_parts(S)
    phi = so3_log(R)
    sigma = jnp.log(s)
    # rebuild W from (phi, sigma) exactly as in sim3_exp, then solve.
    eye = jnp.eye(3, dtype=S.dtype)
    cols = []
    for i in range(3):
        e = eye[i]
        Ti = sim3_exp(jnp.concatenate([e, phi, sigma[None]]))
        cols.append(Ti[:3, 3])
    W = jnp.stack(cols, axis=1)
    rho = jnp.linalg.solve(W, t)
    return jnp.concatenate([rho, phi, sigma[None]])
