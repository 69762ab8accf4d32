import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.ops import camera, lie, ransac
from orbslam2_dualcam_tpu.utils.config import CameraConfig, SystemConfig


K = jnp.asarray([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])


def project(K, T, X):
    xc = lie.se3_apply(T, X)
    z = xc[..., 2:]
    return (xc[..., :2] / z) * jnp.asarray([K[0, 0], K[1, 1]]) + jnp.asarray([K[0, 2], K[1, 2]])


def make_two_view(rng, n=200, planar=False, outlier_frac=0.2, baseline=0.3):
    if planar:
        X = rng.uniform([-3, -2, 6], [3, 2, 6.0001], size=(n, 3)).astype(np.float32)
    else:
        X = rng.uniform([-3, -2, 4], [3, 2, 10], size=(n, 3)).astype(np.float32)
    T1 = jnp.eye(4)
    T2 = lie.se3(lie.so3_exp(jnp.asarray([0.01, -0.06, 0.02])),
                 jnp.asarray([baseline, 0.02, 0.05]))
    X = jnp.asarray(X)
    uv1 = np.array(project(K, T1, X)) + rng.normal(0, 0.5, (n, 2))
    uv2 = np.array(project(K, T2, X)) + rng.normal(0, 0.5, (n, 2))
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    uv2[out_idx] += rng.uniform(20, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return X, T2, jnp.asarray(uv1.astype(np.float32)), jnp.asarray(uv2.astype(np.float32)), out_idx


def _check_motion(T_est, T_true, atol_rot=0.02, atol_dir=0.02):
    R_err = np.asarray(lie.so3_log(T_est[:3, :3] @ T_true[:3, :3].T))
    t_est = np.asarray(T_est[:3, 3])
    t_true = np.asarray(T_true[:3, 3])
    cos = t_est @ t_true / (np.linalg.norm(t_est) * np.linalg.norm(t_true))
    assert np.abs(R_err).max() < atol_rot, R_err
    assert cos > 1 - atol_dir, cos


def test_two_view_init_general(rng):
    X, T2, uv1, uv2, _ = make_two_view(rng, planar=False)
    res = ransac.two_view_init(jax.random.PRNGKey(0), uv1, uv2,
                               jnp.ones(len(uv1), bool), K)
    assert bool(res.success)
    assert not bool(res.is_h)      # general scene -> fundamental
    _check_motion(res.T_21, T2)
    assert int(res.inliers.sum()) > 100


def test_two_view_init_planar(rng):
    X, T2, uv1, uv2, _ = make_two_view(rng, planar=True, outlier_frac=0.1)
    res = ransac.two_view_init(jax.random.PRNGKey(1), uv1, uv2,
                               jnp.ones(len(uv1), bool), K)
    assert bool(res.success)
    assert bool(res.is_h)          # planar scene -> homography
    _check_motion(res.T_21, T2, atol_rot=0.05, atol_dir=0.05)


def test_two_view_scale_convention(rng):
    """Triangulated points must be consistent with T_21's unit-norm t."""
    X, T2, uv1, uv2, out_idx = make_two_view(rng, outlier_frac=0.0)
    res = ransac.two_view_init(jax.random.PRNGKey(2), uv1, uv2,
                               jnp.ones(len(uv1), bool), K)
    s = float(jnp.linalg.norm(T2[:3, 3]))   # true baseline length
    inl = np.asarray(res.inliers)
    ratio = np.asarray(res.points)[inl, 2] * s / np.asarray(X)[inl, 2]
    assert np.abs(np.median(ratio) - 1.0) < 0.05


def test_pnp_ransac(rng):
    n = 150
    X = jnp.asarray(rng.uniform([-3, -2, 4], [3, 2, 10], size=(n, 3)).astype(np.float32))
    T = lie.se3_exp(jnp.asarray([0.2, -0.1, 0.05, 0.05, -0.03, 0.1], jnp.float32))
    uv = np.array(project(K, T, X)) + rng.normal(0, 0.5, (n, 2))
    out = rng.choice(n, 40, replace=False)
    uv[out] += rng.uniform(25, 100, (40, 2)) * rng.choice([-1, 1], (40, 2))
    T_est, inl, cnt, ok = ransac.pnp_ransac(
        jax.random.PRNGKey(3), X, jnp.asarray(uv.astype(np.float32)),
        jnp.ones(n, bool), K)
    assert bool(ok)
    assert int(cnt) > 90
    err = np.asarray(lie.se3_log(T_est @ lie.se3_inv(T)))
    assert np.abs(err).max() < 0.02, err


def test_pnp_ransac_planar_wall(rng):
    """Coplanar world points (a wall — the common relocalization case) are
    rank-degenerate for the linear DLT; the homography-decomposition
    hypothesis path must handle them."""
    from orbslam2_dualcam_tpu.ops import lie as L
    n = 60
    X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-2, 2, n),
                  np.full(n, 6.0)], 1).astype(np.float32)
    T = L.se3_exp(jnp.asarray([0.3, -0.1, 0.2, 0.05, -0.2, 0.1], jnp.float32))
    uv = np.array(project(K, T, jnp.asarray(X))) + rng.normal(0, 0.6, (n, 2))
    bad = rng.choice(n, 20, replace=False)
    uv[bad] += rng.uniform(30, 90, (20, 2)) * rng.choice([-1, 1], (20, 2))
    T_est, inl, cnt, ok = ransac.pnp_ransac(
        jax.random.PRNGKey(0), jnp.asarray(X),
        jnp.asarray(uv.astype(np.float32)), jnp.ones(n, bool), K)
    assert bool(ok)
    assert int(cnt) >= 35
    err = np.abs(np.asarray(L.se3_log(T_est @ L.se3_inv(T)))).max()
    assert err < 0.05, err


def test_horn_sim3_exact(rng):
    P2 = jnp.asarray(rng.uniform(-3, 3, (30, 3)).astype(np.float32))
    R_t = lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5]))
    s_t = 1.7
    t_t = jnp.asarray([0.4, -1.0, 2.0])
    P1 = s_t * (P2 @ R_t.T) + t_t
    R, t, s = ransac.horn_sim3(P1, P2)
    np.testing.assert_allclose(float(s), s_t, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_t), atol=1e-3)
    # fixed-scale mode
    R2, t2, s2 = ransac.horn_sim3(P1, P2, fix_scale=True)
    assert float(s2) == 1.0


def test_sim3_ransac(rng):
    n = 80
    # points in camera-2 frame, in front of camera
    P2 = jnp.asarray(rng.uniform([-2, -2, 3], [2, 2, 8], size=(n, 3)).astype(np.float32))
    R_t = lie.so3_exp(jnp.asarray([0.05, 0.3, -0.1]))
    s_t = 1.4
    t_t = jnp.asarray([0.5, 0.1, 0.3])
    P1 = s_t * (P2 @ R_t.T) + t_t
    # corrupt 25%
    P2n = np.array(P2)
    bad = rng.choice(n, 20, replace=False)
    P2n[bad] += rng.uniform(1, 3, (20, 3))
    P2n = jnp.asarray(P2n)

    def proj(K, X):
        z = X[:, 2:]
        return X[:, :2] / z * jnp.asarray([K[0, 0], K[1, 1]]) + jnp.asarray([K[0, 2], K[1, 2]])

    uv1 = proj(K, P1)
    uv2 = proj(K, P2n)
    R, t, s, inl, cnt, ok = ransac.sim3_ransac(
        jax.random.PRNGKey(5), P1, P2n, jnp.ones(n, bool), uv1, uv2, K, K,
        jnp.ones(n), jnp.ones(n))
    assert bool(ok)
    assert int(cnt) >= 55
    np.testing.assert_allclose(float(s), s_t, rtol=0.02)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_t), atol=0.02)
