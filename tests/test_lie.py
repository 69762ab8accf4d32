import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_dualcam_tpu.ops import lie


def rand_rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(lie.quat_to_rot(jnp.asarray(q, jnp.float32)))


def test_so3_exp_log_roundtrip(rng):
    for _ in range(20):
        phi = rng.normal(size=3).astype(np.float32)
        phi *= rng.uniform(0.01, 3.0) / np.linalg.norm(phi)  # |phi| < pi
        R = lie.so3_exp(jnp.asarray(phi))
        phi2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(phi2), phi, atol=1e-4)


def test_so3_exp_small_angle():
    phi = jnp.asarray([1e-9, 0, 0], jnp.float32)
    R = lie.so3_exp(phi)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_quat_rot_roundtrip(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = lie.quat_to_rot(jnp.asarray(q, jnp.float32))
        q2 = lie.rot_to_quat(R)
        np.testing.assert_allclose(np.asarray(q2), q, atol=1e-4)


def test_se3_exp_log_roundtrip(rng):
    for _ in range(20):
        xi = rng.normal(size=6).astype(np.float32)
        T = lie.se3_exp(jnp.asarray(xi))
        xi2 = lie.se3_log(T)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-3)


def test_se3_inv(rng):
    xi = rng.normal(size=6).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    I = T @ lie.se3_inv(T)
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)


def test_se3_adjoint_identity(rng):
    """Adj satisfies exp(Adj(T) xi) = T exp(xi) T^-1 — the property the
    reference's BA extrinsic factor relies on (Cameras.cc:34-41)."""
    for _ in range(10):
        xiT = rng.normal(size=6).astype(np.float32)
        xi = (rng.normal(size=6) * 0.1).astype(np.float32)
        T = lie.se3_exp(jnp.asarray(xiT))
        lhs = lie.se3_exp(lie.se3_adjoint(T) @ jnp.asarray(xi))
        rhs = T @ lie.se3_exp(jnp.asarray(xi)) @ lie.se3_inv(T)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=2e-3)


def test_sim3_exp_log_roundtrip(rng):
    for _ in range(20):
        xi = rng.normal(size=7).astype(np.float32)
        xi[6] = np.clip(xi[6], -1.0, 1.0)
        S = lie.sim3_exp(jnp.asarray(xi))
        xi2 = lie.sim3_log(S)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=2e-3)


def test_sim3_parts(rng):
    R = rand_rot(rng).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    s = 2.5
    S = lie.sim3(jnp.asarray(R), jnp.asarray(t), s)
    R2, t2, s2 = lie.sim3_parts(S)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-5)
    assert abs(float(s2) - s) < 1e-4


def test_sim3_inv(rng):
    xi = rng.normal(size=7).astype(np.float32) * 0.5
    S = lie.sim3_exp(jnp.asarray(xi))
    I = np.asarray(S @ lie.sim3_inv(S))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-4)


def test_vmap_batching(rng):
    xs = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
    Ts = jax.vmap(lie.se3_exp)(xs)
    assert Ts.shape == (32, 4, 4)
    back = jax.vmap(lie.se3_log)(Ts)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xs), atol=1e-3)
