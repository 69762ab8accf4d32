"""Two-view visual-odometry demo: the minimum end-to-end slice.

Renders a synthetic textured scene from two rig poses, then runs the real
pipeline ops: ORB extraction -> masked Hamming matching -> DLT triangulation
-> motion-only pose optimization -> two-view bundle adjustment, and reports
the recovered pose against ground truth.

Run:  python examples/two_view_demo.py
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

import jax

# default to CPU — the axon TPU tunnel has very slow first-compiles; set
# SLAM_TPU=1 to run on the chip.
if os.environ.get("SLAM_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.ops import camera, epipolar, lie, matching, orb
from orbslam2_dualcam_tpu.optim import ba, pose_opt
from orbslam2_dualcam_tpu.optim.factors import Edges
from orbslam2_dualcam_tpu.utils.config import OrbConfig, SystemConfig


def render_plane_scene(rng, T_cw, K, H=480, W=640, n_dots=600):
    """Project a fixed random dot pattern on the z=6 plane into the camera.
    Crude splat renderer — enough texture for FAST/BRIEF."""
    pts = rng.uniform([-8, -6, 6.0], [8, 6, 6.0], size=(n_dots, 3)).astype(np.float32)
    inten = rng.uniform(80, 200, size=n_dots).astype(np.float32)
    uv = np.asarray(camera.project(K, lie.se3_apply(jnp.asarray(T_cw), jnp.asarray(pts))))
    img = np.full((H, W), 40.0, np.float32)
    for (u, v), it in zip(uv, inten):
        iu, iv = int(round(u)), int(round(v))
        s = 3
        if 0 <= iu < W - s and 0 <= iv < H - s:
            img[iv:iv + s, iu:iu + s] = it
    return img


def main():
    rng = np.random.default_rng(11)
    cfg = SystemConfig()
    rig = camera.make_rig(cfg)
    ocfg = OrbConfig(n_features=500)
    K = rig.K[0]

    T1 = jnp.eye(4)
    T2 = lie.se3_exp(jnp.asarray([0.4, 0.05, 0.02, 0.01, -0.03, 0.005], jnp.float32))

    scene_rng = np.random.default_rng(5)
    img1 = render_plane_scene(scene_rng, T1, K)
    scene_rng = np.random.default_rng(5)   # same scene, new view
    img2 = render_plane_scene(scene_rng, T2, K)

    f1 = orb.extract_orb(jnp.asarray(img1), ocfg, 600)
    f2 = orb.extract_orb(jnp.asarray(img2), ocfg, 600)
    print(f"extracted: {int(f1.valid.sum())} / {int(f2.valid.sum())} features")

    res = matching.match_masked(
        f1.desc, f2.desc,
        allow=matching.window_mask(f1.uv, f2.uv, 120.0),
        valid_a=f1.valid, valid_b=f2.valid,
        max_dist=60, ratio=0.8, angle_a=f1.angle, angle_b=f2.angle)
    n_match = int(res.count())
    print(f"matches: {n_match}")

    m = np.asarray(res.matched)
    i1 = np.nonzero(m)[0]
    i2 = np.asarray(res.idx)[i1]
    uv1 = f1.uv[i1]
    uv2 = f2.uv[i2]

    P1 = epipolar.projection_matrix(K, T1)
    P2 = epipolar.projection_matrix(K, T2)
    X = epipolar.triangulate_dlt(P1, P2, uv1, uv2)
    ok = epipolar.triangulation_checks(T1, T2, X, K, K, uv1, uv2,
                                       jnp.ones(len(i1)), jnp.ones(len(i1)),
                                       min_parallax_cos=1.0)
    print(f"triangulated inliers: {int(ok.sum())}")

    # motion-only: recover T2 from scratch perturbation using the map
    T0 = lie.se3_exp(jnp.asarray([0.05, -0.04, 0.03, 0.02, 0.01, -0.01], jnp.float32)) @ T2
    cams = jnp.zeros(len(i1), jnp.int32)
    T_opt, inl, cnt = pose_opt.optimize_pose(
        T0, X, uv2, cams, jnp.ones(len(i1)), ok,
        rig.T_sc, rig.adj_sc, rig.K)
    err = np.asarray(lie.se3_log(T_opt @ lie.se3_inv(T2)))
    print(f"pose-opt inliers {int(cnt)}, pose err |xi|={np.abs(err).max():.2e}")

    # two-view BA polishing both pose and structure
    E = len(i1)
    edges = Edges(
        kf=jnp.concatenate([jnp.zeros(E, jnp.int32), jnp.ones(E, jnp.int32)]),
        mp=jnp.concatenate([jnp.arange(E, dtype=jnp.int32)] * 2),
        cam=jnp.zeros(2 * E, jnp.int32),
        uv=jnp.concatenate([uv1, uv2]),
        inv_sigma2=jnp.ones(2 * E),
        valid=jnp.concatenate([ok, ok]),
    )
    prob = ba.BAProblem(
        poses=jnp.stack([T1, T_opt]), points=X, edges=edges,
        pose_valid=jnp.ones(2, bool),
        pose_fixed=jnp.asarray([True, False]),
        point_valid=ok)
    out = ba.solve_ba(prob, rig.T_sc, rig.adj_sc, rig.K, iters=10)
    # mono scale gauge: compare translation direction + rotation only
    T2_hat = out.poses[1]
    dt = np.asarray(T2_hat[:3, 3])
    dt_true = np.asarray(T2[:3, 3])
    cos = float(dt @ dt_true / (np.linalg.norm(dt) * np.linalg.norm(dt_true)))
    rot_err = np.abs(np.asarray(lie.so3_log(T2_hat[:3, :3] @ T2[:3, :3].T))).max()
    print(f"BA: cost {float(out.cost):.1f}, translation direction cos={cos:.6f}, "
          f"rot err {rot_err:.2e}")
    # the 3x3-px splat renderer gives ~0.5px keypoint noise; these bounds
    # are the corresponding noise floor
    assert n_match > 100 and cos > 0.999 and rot_err < 5e-3
    print("two-view slice OK")


if __name__ == "__main__":
    main()
