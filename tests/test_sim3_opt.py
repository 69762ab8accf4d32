import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.ops import lie
from orbslam2_dualcam_tpu.optim import sim3_opt

K = jnp.asarray([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])


def _proj(K, X):
    z = X[:, 2:]
    return X[:, :2] / z * jnp.asarray([K[0, 0], K[1, 1]]) + \
        jnp.asarray([K[0, 2], K[1, 2]])


def test_optimize_sim3_converges(rng):
    n = 60
    P2 = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 9],
                                 (n, 3)).astype(np.float32))
    R_t = lie.so3_exp(jnp.asarray([0.1, -0.2, 0.05]))
    s_t = 1.3
    t_t = jnp.asarray([0.3, -0.1, 0.4])
    S_true = lie.sim3(R_t, t_t, s_t)
    P1 = lie.sim3_apply(S_true, P2)
    uv1 = _proj(K, P1) + jnp.asarray(rng.normal(0, 0.3, (n, 2)).astype(np.float32))
    uv2 = _proj(K, P2) + jnp.asarray(rng.normal(0, 0.3, (n, 2)).astype(np.float32))
    # corrupt some matches
    P2n = np.array(P2)
    bad = rng.choice(n, 10, replace=False)
    P2n[bad] += rng.uniform(0.5, 1.5, (10, 3))
    # perturbed initial guess
    S0 = jnp.asarray(np.asarray(
        lie.sim3_exp(jnp.asarray([0.05, -0.03, 0.08, 0.02, 0.03, -0.02, 0.08],
                                 jnp.float32))) @ np.asarray(S_true),
        jnp.float32)
    S, inl, cnt = sim3_opt.optimize_sim3(
        S0, P1, jnp.asarray(P2n), uv1, uv2, jnp.ones(n), jnp.ones(n),
        jnp.ones(n, bool), K, K)
    assert int(cnt) >= 45
    R, t, s = lie.sim3_parts(S)
    assert abs(float(s) - s_t) < 0.02
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_t), atol=0.01)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_t), atol=0.05)


def test_optimize_sim3_fix_scale(rng):
    n = 40
    P2 = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 9],
                                 (n, 3)).astype(np.float32))
    R_t = lie.so3_exp(jnp.asarray([0.0, 0.1, 0.0]))
    S_true = lie.sim3(R_t, jnp.asarray([0.2, 0.0, 0.1]), 1.0)
    P1 = lie.sim3_apply(S_true, P2)
    uv1 = _proj(K, P1)
    uv2 = _proj(K, P2)
    S0 = jnp.asarray(np.asarray(S_true), jnp.float32)
    S, inl, cnt = sim3_opt.optimize_sim3(
        S0, P1, P2, uv1, uv2, jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
        K, K, fix_scale=True)
    _, _, s = lie.sim3_parts(S)
    assert abs(float(s) - 1.0) < 1e-4
