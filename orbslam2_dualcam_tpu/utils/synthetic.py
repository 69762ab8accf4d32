"""Synthetic dual-camera world renderer for tests and benchmarks.

Replaces the reference's reliance on recorded video (indoor_lab_loop.avi,
README.md:19) with a procedurally generated textured box room, rendered by
a tiny numpy raycaster with bilinear texture sampling.  Every image region
is corner-rich AND unique (smoothed noise), and sampling is subpixel-exact,
so the full pipeline (extraction -> matching -> SLAM) sees consistent,
trackable scenes with exact ground-truth poses.

(Two earlier designs failed instructively: integer-pixel box splats make
the world non-rigid below pixel scale (~1-3 deg/frame systematic pose
error), and identical gaussian dots give near-duplicate BRIEF descriptors
that poison data association.)"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from orbslam2_dualcam_tpu.ops import lie


@dataclass
class World:
    """A textured box room: 6 inward-facing planes with noise textures."""

    half: float
    height: float
    origins: np.ndarray    # [6,3] face corner P0
    e1: np.ndarray         # [6,3] face axis 1 (world units)
    e2: np.ndarray         # [6,3] face axis 2
    normals: np.ndarray    # [6,3]
    offsets: np.ndarray    # [6] plane offsets (n.x = off)
    textures: list         # 6 float32 [Th,Tw] textures
    tex_scale: np.ndarray  # [6,2] texels per world unit along e1/e2


def _noise_texture(rng: np.random.Generator, size: int = 512,
                   lo: float = 25.0, hi: float = 230.0) -> np.ndarray:
    """Corner-rich, locally UNIQUE texture: multi-octave noise plus sparse
    high-contrast shapes.  Pure octave noise is statistically self-similar
    everywhere — ratio-test matching collapses to ~10 matches/view-pair;
    the distinct shapes give BRIEF patches identity."""
    import cv2
    # no octave finer than ~4 texels: sub-pixel texture aliases under
    # minification (no mipmapping in the raycaster) and reads as ~20%
    # descriptor bit noise across views
    img = np.zeros((size, size), np.float32)
    for octave, amp in [(16, 0.5), (64, 1.0), (128, 0.5)]:
        n = rng.uniform(0, 1, (octave, octave)).astype(np.float32)
        img += amp * cv2.resize(n, (size, size),
                                interpolation=cv2.INTER_CUBIC)
    img -= img.min()
    img /= max(img.max(), 1e-9)
    img = (lo + (hi - lo) * img).astype(np.float32)
    # sparse distinctive structures: rectangles, ellipses, lines
    for _ in range(150):
        v = float(rng.uniform(lo, hi))
        x, y = int(rng.integers(0, size)), int(rng.integers(0, size))
        kind = rng.integers(0, 3)
        if kind == 0:
            w, h = int(rng.integers(6, 40)), int(rng.integers(6, 40))
            ang = float(rng.uniform(0, 180))
            box = cv2.boxPoints(((x, y), (w, h), ang)).astype(np.int32)
            cv2.fillConvexPoly(img, box, v)
        elif kind == 1:
            axes = (int(rng.integers(4, 30)), int(rng.integers(4, 30)))
            cv2.ellipse(img, (x, y), axes, float(rng.uniform(0, 180)),
                        0, 360, v, -1)
        else:
            x2, y2 = int(rng.integers(0, size)), int(rng.integers(0, size))
            cv2.line(img, (x, y), (x2, y2), v, int(rng.integers(2, 6)))
    return img


def make_box_world(rng: np.random.Generator, n_points: int = 4000,
                   half: float = 8.0, height: float = 3.0,
                   tex_size: int = 512) -> World:
    """Box room around the origin. `n_points` kept for API compatibility
    (controls nothing now — texture provides unlimited corners)."""
    del n_points
    h, y = half, height
    faces = []
    # (P0, e1, e2) per face, inward-facing
    faces.append(([-h, -y, h], [2 * h, 0, 0], [0, 2 * y, 0]))    # z=+h wall
    faces.append(([h, -y, -h], [-2 * h, 0, 0], [0, 2 * y, 0]))   # z=-h wall
    faces.append(([h, -y, h], [0, 0, -2 * h], [0, 2 * y, 0]))    # x=+h wall
    faces.append(([-h, -y, -h], [0, 0, 2 * h], [0, 2 * y, 0]))   # x=-h wall
    faces.append(([-h, y, h], [2 * h, 0, 0], [0, 0, -2 * h]))    # ceiling y=+y
    faces.append(([-h, -y, -h], [2 * h, 0, 0], [0, 0, 2 * h]))   # floor y=-y
    origins = np.asarray([f[0] for f in faces], np.float64)
    e1 = np.asarray([f[1] for f in faces], np.float64)
    e2 = np.asarray([f[2] for f in faces], np.float64)
    normals = np.cross(e1, e2)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    offsets = np.einsum('ij,ij->i', normals, origins)
    textures = [_noise_texture(rng, tex_size) for _ in range(6)]
    tex_scale = np.stack([
        [tex_size / np.linalg.norm(e1[i]), tex_size / np.linalg.norm(e2[i])]
        for i in range(6)])
    return World(half=half, height=height, origins=origins, e1=e1, e2=e2,
                 normals=normals, offsets=offsets, textures=textures,
                 tex_scale=tex_scale)


def render(world: World, K: np.ndarray, T_cam_w: np.ndarray,
           H: int = 480, W: int = 640, background: float = 35.0) -> np.ndarray:
    """Raycast-render one camera (T_cam_w: world->camera) with bilinear
    texture sampling: subpixel-exact, viewpoint-consistent."""
    R = T_cam_w[:3, :3]
    t = T_cam_w[:3, 3]
    c = -R.T @ t                                      # camera center (world)
    Kinv = np.linalg.inv(K)
    us, vs = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    rays = np.stack([us.ravel(), vs.ravel(), np.ones(H * W)], 1) @ Kinv.T
    d = rays @ R                                      # R^T * ray, world dirs
    img = np.full(H * W, background, np.float32)
    best_t = np.full(H * W, np.inf)
    for i in range(6):
        n = world.normals[i]
        dn = d @ n
        tt = (world.offsets[i] - c @ n) / np.where(np.abs(dn) > 1e-12, dn, 1e-12)
        hit = (tt > 0.05) & (tt < best_t)
        if not hit.any():
            continue
        X = c + tt[:, None] * d                      # world hit points
        rel = X - world.origins[i]
        a1 = world.e1[i]
        a2 = world.e2[i]
        u1 = (rel @ a1) / (a1 @ a1)
        u2 = (rel @ a2) / (a2 @ a2)
        inb = hit & (u1 >= 0) & (u1 < 1) & (u2 >= 0) & (u2 < 1)
        if not inb.any():
            continue
        tex = world.textures[i]
        Th, Tw = tex.shape
        tx = np.clip(u1[inb] * (Tw - 1), 0, Tw - 1.001)
        ty = np.clip(u2[inb] * (Th - 1), 0, Th - 1.001)
        x0 = tx.astype(np.int64)
        y0 = ty.astype(np.int64)
        fx = (tx - x0).astype(np.float32)
        fy = (ty - y0).astype(np.float32)
        v00 = tex[y0, x0]
        v01 = tex[y0, x0 + 1]
        v10 = tex[y0 + 1, x0]
        v11 = tex[y0 + 1, x0 + 1]
        val = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) +
               v10 * (1 - fx) * fy + v11 * fx * fy)
        img[inb] = val
        best_t[inb] = tt[inb]
    return img.reshape(H, W)


def render_rig(world: World, rig_K: np.ndarray, rig_T_sc: np.ndarray,
               T_cw: np.ndarray, H: int = 480, W: int = 640) -> np.ndarray:
    """Render all rig cameras: [ncam, H, W]."""
    ncam = rig_K.shape[0]
    out = np.zeros((ncam, H, W), np.float32)
    for c in range(ncam):
        T_sw = rig_T_sc[c] @ T_cw
        out[c] = render(world, rig_K[c], T_sw, H, W)
    return out


def out_and_back_trajectory(n_out: int = 30, n_turn: int = 30,
                            n_back: int = 30, x0: float = -3.0,
                            x1: float = 3.0,
                            turn_radius: float = 1.0,
                            n_turn2: int = 0,
                            n_out2: int = 0) -> list[np.ndarray]:
    """Dual-camera bootstrap scenario: crab-walk along x facing the +z wall,
    U-turn (an arc — rotation WITH baseline, since pure in-place rotation
    is untriangulatable for a monocular front end), crab-walk back.  On the
    return leg the BACK camera faces +z and re-sees, from nearby spots and
    the same direction, what the front camera mapped on the way out — the
    cross-camera relocalization setting of the reference's demo sequence.

    With `n_turn2`/`n_out2` the rig makes a second U-turn at the far end
    and heads out again.  The second turn pans the back camera across the
    already-mapped walls through a full half-circle of rig orientations —
    the orientation diversity that makes the metric scale observable to
    the bootstrap pair-LS (scale_opt.bootstrap_scale): the extrinsic
    offset o(R) rotates with the rig while odometry fixes the center
    displacements, so anchor pairs far apart in yaw carry the strongest
    scale signal."""
    import jax.numpy as jnp
    poses = []

    def pose(x, z, yaw):
        R_wc = np.asarray(lie.so3_exp(jnp.asarray([0.0, yaw, 0.0])))
        T_wc = np.eye(4)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = [x, 0.0, z]
        return np.linalg.inv(T_wc)

    for k in range(n_out):
        poses.append(pose(x0 + (x1 - x0) * k / max(n_out - 1, 1), 0.0, 0.0))
    r = turn_radius
    for k in range(1, n_turn + 1):
        th = np.pi * k / n_turn
        poses.append(pose(x1 + r * np.sin(th), r * (1 - np.cos(th)), th))
    for k in range(1, n_back + 1):
        poses.append(pose(x1 + (x0 - x1) * k / n_back, 2 * r, np.pi))
    for k in range(1, n_turn2 + 1):
        th = np.pi * k / n_turn2
        poses.append(pose(x0 - r * np.sin(th), 2 * r + r * (1 - np.cos(th)),
                          np.pi + th))
    for k in range(1, n_out2 + 1):
        poses.append(pose(x0 + (x1 - x0) * k / n_out2, 4 * r, 0.0))
    return poses


def orbit_trajectory(n_frames: int, radius: float = 2.0,
                     total_angle: float = 2 * np.pi,
                     wobble: float = 0.0) -> list[np.ndarray]:
    """Rig poses T_cw moving on a circle, looking tangentially (a loop).
    Returns list of 4x4 world->capture transforms."""
    import jax.numpy as jnp
    poses = []
    for k in range(n_frames):
        a = total_angle * k / n_frames
        # camera center on the circle
        c = np.array([radius * np.sin(a), wobble * np.sin(3 * a),
                      -radius * np.cos(a)])
        # yaw so the camera looks along the tangent
        yaw = a
        R_wc = np.asarray(lie.so3_exp(jnp.asarray([0.0, yaw, 0.0])))
        T_wc = np.eye(4)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = c
        poses.append(np.linalg.inv(T_wc))
    return poses
