"""Camera rig model: intrinsics, distortion, extrinsics, projection.

TPU-native equivalent of the reference's ``Cameras`` class (Cameras.cc:17-52)
which precomputes per-camera K, distCoeffs, T_sc (sibling <- capture), their
inverses, and 6x6 SE3 adjoints for BA Jacobians; plus the per-frame
undistortion done with cv::undistortPoints (Frame.cc:410-442).

The rig is a registered pytree of stacked per-camera arrays ``[ncam, ...]``
so every projection/undistortion batches over cameras as a vmap axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.ops import lie
from orbslam2_dualcam_tpu.utils.config import SystemConfig


class CameraRig(NamedTuple):
    """Stacked rig calibration. All leaves have leading dim ncam.

    T_sc maps rig-capture-frame (camera 0) points into sibling camera s:
    ``x_s = T_sc[s] @ x_c`` — so for a rig pose T_cw (world->capture), camera
    s's world pose is ``T_sw = T_sc[s] @ T_cw`` (Frame.cc:222-234).
    """

    K: jax.Array          # [ncam, 3, 3] intrinsics
    K_inv: jax.Array      # [ncam, 3, 3]
    dist: jax.Array       # [ncam, 5] k1 k2 p1 p2 k3
    T_sc: jax.Array       # [ncam, 4, 4] capture -> sibling
    T_cs: jax.Array       # [ncam, 4, 4] sibling -> capture (inverse)
    adj_sc: jax.Array     # [ncam, 6, 6] Adjoint(T_sc) (Cameras.cc:34-41)
    bounds: jax.Array     # [ncam, 4] undistorted (min_x, max_x, min_y, max_y)
    wh: jax.Array         # [ncam, 2] pixel width,height

    @property
    def n_cameras(self) -> int:
        return self.K.shape[0]

    def fxy(self):
        return self.K[:, 0, 0], self.K[:, 1, 1]


def make_rig(cfg: SystemConfig, dtype=jnp.float32) -> CameraRig:
    Ks, dists, Tscs, whs = [], [], [], []
    for cam in cfg.cameras:
        K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float64)
        Ks.append(K)
        dists.append(np.asarray(cam.dist, np.float64))
        q = np.asarray(cam.q_sc, np.float64)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = cam.t_sc
        Tscs.append(T)
        whs.append((cam.width, cam.height))
    K = jnp.asarray(np.stack(Ks), dtype)
    dist = jnp.asarray(np.stack(dists), dtype)
    T_sc = jnp.asarray(np.stack(Tscs), dtype)
    T_cs = jax.vmap(lie.se3_inv)(T_sc)
    adj = jax.vmap(lie.se3_adjoint)(T_sc)
    wh = jnp.asarray(np.stack(whs), dtype)
    rig = CameraRig(K=K, K_inv=jnp.linalg.inv(K), dist=dist, T_sc=T_sc,
                    T_cs=T_cs, adj_sc=adj, bounds=jnp.zeros((K.shape[0], 4), dtype),
                    wh=wh)
    bounds = _compute_bounds(rig)
    return rig._replace(bounds=bounds)


# ---------------------------------------------------------------------------
# distortion
# ---------------------------------------------------------------------------

def distort(xn: jax.Array, dist: jax.Array) -> jax.Array:
    """Apply radial-tangential distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort(xd: jax.Array, dist: jax.Array, iters: int = 8) -> jax.Array:
    """Invert `distort` by fixed-point iteration (cv::undistortPoints-style,
    Frame.cc:410-442). Fixed iteration count keeps the shape static."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        xs = (xd[..., 0] - dx) / radial
        ys = (xd[..., 1] - dy) / radial
        return jnp.stack([xs, ys], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xd)


def undistort_pixels(uv: jax.Array, K: jax.Array, K_inv: jax.Array,
                     dist: jax.Array) -> jax.Array:
    """Pixel coords (..., 2) -> undistorted pixel coords under the same K."""
    xn = uv @ K_inv[:2, :2].T + K_inv[:2, 2]
    xu = undistort(xn, dist)
    return xu @ K[:2, :2].T + K[:2, 2]


def _compute_bounds(rig: CameraRig) -> jax.Array:
    """Undistorted image bounds per camera (Frame.cc:454-484)."""
    out = []
    for c in range(rig.n_cameras):
        w = rig.wh[c, 0]
        h = rig.wh[c, 1]
        corners = jnp.stack([
            jnp.stack([0.0, 0.0]), jnp.stack([w, 0.0]),
            jnp.stack([0.0, h]), jnp.stack([w, h])])
        cu = undistort_pixels(corners, rig.K[c], rig.K_inv[c], rig.dist[c])
        out.append(jnp.stack([cu[:, 0].min(), cu[:, 0].max(),
                              cu[:, 1].min(), cu[:, 1].max()]))
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# projection
# ---------------------------------------------------------------------------

def project(K: jax.Array, x_cam: jax.Array) -> jax.Array:
    """Pinhole projection of camera-frame points (..., 3) -> pixels (..., 2).

    No distortion: the engine works in undistorted pixel space throughout
    (keypoints are undistorted once at extraction, as the reference does)."""
    z = x_cam[..., 2:3]
    xy = x_cam[..., :2] / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([fx * xy[..., 0] + cx, fy * xy[..., 1] + cy], axis=-1)


def project_rig(rig: CameraRig, cam: jax.Array, T_cw: jax.Array,
                x_world: jax.Array):
    """Project world points through rig pose into camera `cam` (int array).

    Returns (uv, z) where z is the depth in the sibling camera frame.
    ``cam`` may be a scalar or broadcastable int array selecting per-point
    cameras (gathered, so it stays jittable)."""
    T_sc = rig.T_sc[cam]                      # (..., 4, 4)
    T_sw = T_sc @ T_cw
    x_cam = jnp.einsum('...ij,...j->...i', T_sw[..., :3, :3], x_world) + T_sw[..., :3, 3]
    K = rig.K[cam]
    z = x_cam[..., 2]
    zc = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    u = fx * x_cam[..., 0] / zc + cx
    v = fy * x_cam[..., 1] / zc + cy
    return jnp.stack([u, v], axis=-1), z


def in_image(rig: CameraRig, cam: jax.Array, uv: jax.Array) -> jax.Array:
    """Inside undistorted image bounds (Frame.cc:265-272 semantics)."""
    b = rig.bounds[cam]
    return ((uv[..., 0] >= b[..., 0]) & (uv[..., 0] <= b[..., 1]) &
            (uv[..., 1] >= b[..., 2]) & (uv[..., 1] <= b[..., 3]))


def backproject(K_inv: jax.Array, uv: jax.Array, z: jax.Array) -> jax.Array:
    """Undistorted pixels + depth -> camera-frame 3D points."""
    ones = jnp.ones_like(uv[..., :1])
    xn = jnp.concatenate([uv, ones], axis=-1) @ K_inv.T
    return xn * z[..., None]
