import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.ops import camera, lie
from orbslam2_dualcam_tpu.optim import ba, factors, pose_opt
from orbslam2_dualcam_tpu.optim.factors import Edges
from orbslam2_dualcam_tpu.utils.config import (BAConfig, CameraConfig,
                                               SystemConfig)


def rig2():
    cam0 = CameraConfig()
    cam1 = CameraConfig(q_sc=(0.0, 0.0, 1.0, 0.0), t_sc=(0.05, 0.0, 0.10))
    return camera.make_rig(SystemConfig(cameras=(cam0, cam1)))


def test_jacobians_match_autodiff(rng):
    """The extrinsic-adjoint analytic Jacobian vs jax.jacfwd — the property
    the whole dual-camera BA correctness rests on."""
    rig = rig2()
    for c in range(2):
        for _ in range(5):
            T = lie.se3_exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.3))
            X = jnp.asarray(rng.uniform([-1, -1, 3], [1, 1, 8], size=3).astype(np.float32))
            if c == 1:   # point must be in front of the BACK camera
                X = X * jnp.asarray([1.0, 1.0, -1.0])
            uv = jnp.asarray(rng.uniform(0, 480, size=2).astype(np.float32))
            Tsc = rig.T_sc[c]
            Adj = rig.adj_sc[c]
            K = rig.K[c]

            Jp_ana, Jx_ana = factors.reproject_jacobians(T, X, Tsc, Adj, K)

            def err_of_xi(xi):
                return factors.reproject_error(lie.se3_exp(xi) @ T, X, uv, Tsc, K)

            def err_of_X(Xv):
                return factors.reproject_error(T, Xv, uv, Tsc, K)

            Jp_num = jax.jacfwd(err_of_xi)(jnp.zeros(6))
            Jx_num = jax.jacfwd(err_of_X)(X)
            np.testing.assert_allclose(np.asarray(Jp_ana), np.asarray(Jp_num),
                                       rtol=1e-3, atol=1e-3)
            np.testing.assert_allclose(np.asarray(Jx_ana), np.asarray(Jx_num),
                                       rtol=1e-3, atol=1e-3)


def _synthetic_pose_problem(rng, rig, n=150, outliers=0, cam_mix=True):
    ncam = rig.n_cameras
    X0 = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3)).astype(np.float32)
    cam = (rng.integers(0, ncam, size=n) if cam_mix else np.zeros(n)).astype(np.int32)
    # flip z for back-camera points so they are visible
    X0[cam == 1, 2] *= -1
    X = jnp.asarray(X0)
    T_true = lie.se3_exp(jnp.asarray([0.1, -0.05, 0.02, 0.03, -0.02, 0.01], jnp.float32))
    uv, z = camera.project_rig(rig, jnp.asarray(cam), T_true, X)
    uv = np.array(uv)
    if outliers:
        idx = rng.choice(n, size=outliers, replace=False)
        uv[idx] += rng.uniform(30, 80, size=(outliers, 2)) * rng.choice([-1, 1], size=(outliers, 2))
    return T_true, X, jnp.asarray(uv), jnp.asarray(cam)


def test_pose_optimization_converges(rng):
    rig = rig2()
    T_true, X, uv, cam = _synthetic_pose_problem(rng, rig)
    T0 = lie.se3_exp(jnp.asarray([0.05, 0.05, -0.05, 0.02, 0.02, -0.02], jnp.float32)) @ T_true
    n = X.shape[0]
    T, inl, cnt = pose_opt.optimize_pose(
        T0, X, uv, cam, jnp.ones(n), jnp.ones(n, bool),
        rig.T_sc, rig.adj_sc, rig.K)
    err = np.asarray(lie.se3_log(T @ lie.se3_inv(T_true)))
    assert np.abs(err).max() < 1e-3, err
    assert int(cnt) == n


def test_pose_optimization_rejects_outliers(rng):
    rig = rig2()
    T_true, X, uv, cam = _synthetic_pose_problem(rng, rig, outliers=30)
    T0 = lie.se3_exp(jnp.asarray([0.03, -0.03, 0.03, 0.01, 0.01, 0.01], jnp.float32)) @ T_true
    n = X.shape[0]
    T, inl, cnt = pose_opt.optimize_pose(
        T0, X, uv, cam, jnp.ones(n), jnp.ones(n, bool),
        rig.T_sc, rig.adj_sc, rig.K)
    err = np.asarray(lie.se3_log(T @ lie.se3_inv(T_true)))
    assert np.abs(err).max() < 5e-3, err
    assert 100 <= int(cnt) <= 130   # 120 inliers expected


def test_pose_optimization_jits(rng):
    rig = rig2()
    T_true, X, uv, cam = _synthetic_pose_problem(rng, rig)
    n = X.shape[0]
    f = jax.jit(lambda T0: pose_opt.optimize_pose(
        T0, X, uv, cam, jnp.ones(n), jnp.ones(n, bool),
        rig.T_sc, rig.adj_sc, rig.K))
    T, _, cnt = f(T_true)
    assert int(cnt) == n


def _synthetic_ba_problem(rng, rig, n_kf=6, n_mp=120, dual=True):
    """Keyframes on an arc viewing a cloud of points, dual-camera obs."""
    ncam = rig.n_cameras if dual else 1
    points = rng.uniform([-3, -3, 5], [3, 3, 12], size=(n_mp, 3)).astype(np.float32)
    # half the points behind (for the back camera)
    points[n_mp // 2:, 2] = -points[n_mp // 2:, 2] - 2.0
    poses = []
    for k in range(n_kf):
        xi = np.array([0.25 * k, 0.02 * k, 0.01 * k, 0.0, 0.04 * k, 0.0], np.float32)
        poses.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
    poses = np.stack(poses)

    ekf, emp, ecam, euv = [], [], [], []
    for k in range(n_kf):
        for c in range(ncam):
            uv, z = camera.project_rig(rig, jnp.asarray(c), jnp.asarray(poses[k]),
                                       jnp.asarray(points))
            uv = np.asarray(uv)
            z = np.asarray(z)
            vis = (z > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & \
                  (uv[:, 1] > 0) & (uv[:, 1] < 480)
            for m in np.nonzero(vis)[0]:
                ekf.append(k)
                emp.append(m)
                ecam.append(c)
                euv.append(uv[m] + rng.normal(0, 0.3, size=2))
    E = len(ekf)
    pad = 8 - E % 8
    edges = Edges(
        kf=jnp.asarray(np.array(ekf + [0] * pad, np.int32)),
        mp=jnp.asarray(np.array(emp + [0] * pad, np.int32)),
        cam=jnp.asarray(np.array(ecam + [0] * pad, np.int32)),
        uv=jnp.asarray(np.array(euv + [[0, 0]] * pad, np.float32)),
        inv_sigma2=jnp.ones(E + pad, jnp.float32),
        valid=jnp.asarray([True] * E + [False] * pad),
    )
    return jnp.asarray(poses), jnp.asarray(points), edges


def test_ba_converges_dual(rng):
    rig = rig2()
    poses_t, points_t, edges = _synthetic_ba_problem(rng, rig)
    n_kf, n_mp = poses_t.shape[0], points_t.shape[0]
    # perturb
    dp = rng.normal(0, 0.02, size=(n_kf, 6)).astype(np.float32)
    dp[0] = 0
    dp[1] = 0
    poses0 = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(jnp.asarray(dp), poses_t)
    points0 = points_t + jnp.asarray(rng.normal(0, 0.05, size=(n_mp, 3)).astype(np.float32))

    prob = ba.BAProblem(
        poses=poses0, points=points0, edges=edges,
        pose_valid=jnp.ones(n_kf, bool),
        pose_fixed=jnp.zeros(n_kf, bool).at[0].set(True).at[1].set(True),
        point_valid=jnp.ones(n_mp, bool))
    res = ba.solve_ba(prob, rig.T_sc, rig.adj_sc, rig.K, iters=15)

    pose_err = np.asarray(jax.vmap(lambda a, b: lie.se3_log(a @ lie.se3_inv(b)))(
        res.poses, poses_t))
    # noise sigma 0.3px limits accuracy; poses should come back to ~mm level
    assert np.abs(pose_err).max() < 5e-3, np.abs(pose_err).max()
    # 0.3px noise at fx=500 with ~1m baselines and 5-12m depths puts the
    # triangulation floor at ~5cm; require the noise-consistent level and a
    # noise-consistent reprojection chi2 (E[chi2] = 2 sigma^2 = 0.18)
    pt_err = np.linalg.norm(np.asarray(res.points - points_t), axis=1)
    assert np.median(pt_err) < 8e-2, np.median(pt_err)
    emask = np.asarray(edges.valid)
    assert np.asarray(res.edge_chi2)[emask].mean() < 0.5
    assert float(res.cost) < float(
        ba.solve_ba(prob, rig.T_sc, rig.adj_sc, rig.K, iters=0).cost)


def test_ba_respects_fixed_poses(rng):
    rig = rig2()
    poses_t, points_t, edges = _synthetic_ba_problem(rng, rig, n_kf=4, n_mp=60)
    prob = ba.BAProblem(
        poses=poses_t, points=points_t, edges=edges,
        pose_valid=jnp.ones(4, bool),
        pose_fixed=jnp.asarray([True, False, False, True]),
        point_valid=jnp.ones(60, bool))
    res = ba.solve_ba(prob, rig.T_sc, rig.adj_sc, rig.K, iters=5)
    np.testing.assert_array_equal(np.asarray(res.poses[0]), np.asarray(poses_t[0]))
    np.testing.assert_array_equal(np.asarray(res.poses[3]), np.asarray(poses_t[3]))
