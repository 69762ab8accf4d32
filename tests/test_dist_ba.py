"""Distributed BA on the 8-device virtual CPU mesh: must match the
single-device solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from orbslam2_dualcam_tpu.optim import ba
from orbslam2_dualcam_tpu.parallel import dist_ba
from tests.test_optim import _synthetic_ba_problem, rig2


@pytest.fixture(scope="module")
def problem(  ):
    rng = np.random.default_rng(1)
    rig = rig2()
    poses_t, points_t, edges = _synthetic_ba_problem(rng, rig, n_kf=6,
                                                     n_mp=120)
    n_kf, n_mp = poses_t.shape[0], points_t.shape[0]
    dp = rng.normal(0, 0.02, size=(n_kf, 6)).astype(np.float32)
    dp[:2] = 0
    from orbslam2_dualcam_tpu.ops import lie
    poses0 = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(jnp.asarray(dp),
                                                       poses_t)
    points0 = points_t + jnp.asarray(
        rng.normal(0, 0.05, size=(n_mp, 3)).astype(np.float32))
    prob = ba.BAProblem(
        poses=poses0, points=points0, edges=edges,
        pose_valid=jnp.ones(n_kf, bool),
        pose_fixed=jnp.zeros(n_kf, bool).at[0].set(True).at[1].set(True),
        point_valid=jnp.ones(n_mp, bool))
    return rig, prob, poses_t


def _pad_edges_to(prob: ba.BAProblem, mult: int) -> ba.BAProblem:
    e = prob.edges
    E = e.kf.shape[0]
    pad = (-E) % mult
    if pad == 0:
        return prob
    f = lambda x, v: jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], v,
                                                  x.dtype)])
    edges = e._replace(
        kf=f(e.kf, 0), mp=f(e.mp, 0), cam=f(e.cam, 0),
        uv=jnp.concatenate([e.uv, jnp.zeros((pad, 2))]),
        inv_sigma2=f(e.inv_sigma2, 0.0), valid=f(e.valid, False))
    return prob._replace(edges=edges)


def test_matches_single_device(problem):
    rig, prob, poses_t = problem
    devs = jax.devices()
    assert len(devs) == 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(np.asarray(devs), ("data",))
    prob8 = _pad_edges_to(prob, 8)

    res_s = ba.solve_ba(prob, rig.T_sc, rig.adj_sc, rig.K, iters=8)
    res_d = dist_ba.solve_ba_distributed(prob8, rig.T_sc, rig.adj_sc, rig.K,
                                         mesh, iters=8)
    # identical math, identical reductions -> near-identical results
    np.testing.assert_allclose(np.asarray(res_d.cost), np.asarray(res_s.cost),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res_d.poses), np.asarray(res_s.poses),
                               atol=5e-4)
    # and it actually converged toward ground truth
    from orbslam2_dualcam_tpu.ops import lie
    err = np.asarray(jax.vmap(lambda a, b: lie.se3_log(a @ lie.se3_inv(b)))(
        res_d.poses, poses_t))
    assert np.abs(err).max() < 1e-2


def test_sharded_points_matches_single_device(problem):
    """Point-sharded layout (edges partitioned by point owner, landmark
    system fully local per device) must reproduce the single-device
    solve: same math, same reductions, different collective schedule."""
    rig, prob, poses_t = problem
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    res_s = ba.solve_ba(prob, rig.T_sc, rig.adj_sc, rig.K, iters=8)
    res_p = dist_ba.solve_ba_distributed(prob, rig.T_sc, rig.adj_sc,
                                         rig.K, mesh, iters=8,
                                         shard_points=True)
    np.testing.assert_allclose(np.asarray(res_p.cost),
                               np.asarray(res_s.cost), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(res_p.poses),
                               np.asarray(res_s.poses), atol=5e-4)
    np.testing.assert_allclose(np.asarray(res_p.points),
                               np.asarray(res_s.points), atol=5e-3)
    # per-edge chi2 comes back in the CALLER's edge order
    res_r = dist_ba.solve_ba_distributed(
        _pad_edges_to(prob, 8), rig.T_sc, rig.adj_sc, rig.K, mesh, iters=8)
    E = prob.edges.kf.shape[0]
    np.testing.assert_allclose(np.asarray(res_p.edge_chi2),
                               np.asarray(res_r.edge_chi2)[:E], atol=1e-2)
