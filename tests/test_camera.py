import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.ops import camera, epipolar, lie
from orbslam2_dualcam_tpu.utils.config import CameraConfig, SystemConfig, dual_default


def make_test_rig():
    cam0 = CameraConfig(dist=(-0.1, 0.05, 0.001, -0.002, 0.0))
    cam1 = CameraConfig(q_sc=(0.0, 0.0, 1.0, 0.0), t_sc=(0.0, 0.0, 0.10))
    return camera.make_rig(SystemConfig(cameras=(cam0, cam1)))


def test_distort_undistort_roundtrip(rng):
    rig = make_test_rig()
    xn = jnp.asarray(rng.uniform(-0.4, 0.4, size=(100, 2)).astype(np.float32))
    xd = camera.distort(xn, rig.dist[0])
    xu = camera.undistort(xd, rig.dist[0])
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-4)


def test_undistort_matches_opencv(rng):
    import cv2
    rig = make_test_rig()
    uv = rng.uniform([50, 50], [590, 430], size=(200, 2)).astype(np.float32)
    K = np.asarray(rig.K[0])
    dist = np.asarray(rig.dist[0])
    ours = np.asarray(camera.undistort_pixels(
        jnp.asarray(uv), rig.K[0], rig.K_inv[0], rig.dist[0]))
    cv = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
    np.testing.assert_allclose(ours, cv, atol=0.05)


def test_project_backproject(rng):
    rig = make_test_rig()
    x = rng.uniform([-1, -1, 2], [1, 1, 8], size=(50, 3)).astype(np.float32)
    uv = camera.project(rig.K[0], jnp.asarray(x))
    back = camera.backproject(rig.K_inv[0], uv, jnp.asarray(x[:, 2]))
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-3)


def test_project_rig_sibling():
    """A point in front of the back camera projects correctly through the
    composed extrinsic (Frame.cc:222-234 semantics)."""
    rig = make_test_rig()
    T_cw = jnp.eye(4)
    # point behind the rig: back camera (rotated 180deg about y) sees it
    x_w = jnp.asarray([[0.0, 0.0, -5.0]])
    uv, z = camera.project_rig(rig, jnp.asarray([1]), T_cw, x_w)
    assert float(z[0]) > 0
    # on the optical axis of cam1 -> principal point
    np.testing.assert_allclose(np.asarray(uv[0]), [320.0, 240.0], atol=1e-3)
    # front camera sees it behind
    uv0, z0 = camera.project_rig(rig, jnp.asarray([0]), T_cw, x_w)
    assert float(z0[0]) < 0


def test_triangulate_exact(rng):
    rig = make_test_rig()
    K = rig.K[0]
    T1 = jnp.eye(4)
    T2 = lie.se3(lie.so3_exp(jnp.asarray([0.0, 0.05, 0.0])),
                 jnp.asarray([0.3, 0.0, 0.0]))
    X = jnp.asarray(rng.uniform([-1, -1, 3], [1, 1, 9], size=(64, 3)).astype(np.float32))
    P1 = epipolar.projection_matrix(K, T1)
    P2 = epipolar.projection_matrix(K, T2)
    uv1 = camera.project(K, lie.se3_apply(T1, X))
    uv2 = camera.project(K, lie.se3_apply(T2, X))
    Xt = epipolar.triangulate_dlt(P1, P2, uv1, uv2)
    np.testing.assert_allclose(np.asarray(Xt), np.asarray(X), atol=5e-2)
    ok = epipolar.triangulation_checks(
        T1, T2, Xt, K, K, uv1, uv2, jnp.ones(64), jnp.ones(64))
    assert bool(ok.all())


def test_fundamental_epipolar_constraint(rng):
    rig = make_test_rig()
    K = rig.K[0]
    T1 = lie.se3_exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1))
    T2 = lie.se3_exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1)) @ \
        lie.se3(jnp.eye(3), jnp.asarray([0.5, 0.0, 0.0]))
    X = jnp.asarray(rng.uniform([-1, -1, 3], [1, 1, 9], size=(32, 3)).astype(np.float32))
    uv1 = camera.project(K, lie.se3_apply(T1, X))
    uv2 = camera.project(K, lie.se3_apply(T2, X))
    F12 = epipolar.fundamental_from_poses(K, T1, K, T2)
    d2 = epipolar.epipolar_dist2(F12, uv1, uv2)
    assert float(jnp.max(d2)) < 1e-2


def test_rig_bounds_no_distortion():
    rig = camera.make_rig(dual_default())
    np.testing.assert_allclose(np.asarray(rig.bounds[0]), [0, 640, 0, 480],
                               atol=1e-3)
