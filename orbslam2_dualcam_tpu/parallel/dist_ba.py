"""Distributed global bundle adjustment over a device mesh.

The reference has NO distributed path (single process, pthreads —
SURVEY §2.3); this is the capability the TPU build adds: global BA whose
observation set is sharded across devices, with the landmark and reduced
camera systems assembled by `psum` over ICI.

Design (scaling-book style):
* mesh axis ``"data"`` shards the EDGE table (observations) — the only
  O(n)-growing axis.  Poses [K,6] are always replicated (K is small and
  every pose couples to every device's edges through the Schur system).
* Two point layouts:
  - **replicated** (default, `shard_points=False`): points [M,3] live on
    every device; landmark reductions (g_l, H_ll, and the W-products
    inside the Schur CG matvec) are psum'd.  Simplest; right for local
    BA-sized M.
  - **point-sharded** (`shard_points=True`): edges are PARTITIONED BY
    POINT OWNER (host-side, round-robin over devices), so each device
    holds only its M/n_dev landmark block — positions, H_ll, H_ll^-1 —
    and every landmark-sized reduction becomes a LOCAL segment-sum with
    NO collective.  Only the pose-sized (K*6) psums remain per CG
    iteration, which is the scaling-book ideal: shard the O(n) axis,
    replicate the small one, reduce only over the small one.  This is
    what scales GBA past a single chip's HBM for both edges AND points.
* each device computes its shard's residuals/Jacobians and partial
  segment-sums; `jax.lax.psum` over "data" completes the pose-sized
  reductions, after which every device runs the identical (replicated)
  CG update — no host round trips inside the solve.
* built on `shard_map` so the collective schedule is explicit; the outer
  jit partitions inputs via NamedSharding.

Exercised (8 virtual devices) by tests/test_dist_ba.py and the driver's
dryrun_multichip contract; scaling measured by examples/bench_dist_ba.py.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orbslam2_dualcam_tpu.optim import factors
from orbslam2_dualcam_tpu.optim.ba import BAProblem, BAResult
from orbslam2_dualcam_tpu.utils.config import BAConfig


def _psum(x):
    return jax.lax.psum(x, axis_name="data")


def _build_local(poses, points, edges, pose_valid, pose_fixed, point_valid,
                 T_sc, adj_sc, Ks, robust, delta2):
    r, Jp, Jx = factors.edge_residuals_jacobians(poses, points, edges, T_sc,
                                                 adj_sc, Ks)
    chi2 = jnp.sum(r * r, -1) * edges.inv_sigma2
    w = edges.inv_sigma2 * jnp.where(robust,
                                     factors.huber_weight(chi2, delta2), 1.0)
    emask = (edges.valid & pose_valid[edges.kf] & point_valid[edges.mp])
    w = jnp.where(emask, w, 0.0)
    Jp = jnp.where(pose_fixed[edges.kf, None, None], 0.0, Jp)
    return r, Jp, Jx, w, chi2


def partition_by_point(prob: BAProblem, n_dev: int):
    """Host-side repartition for the point-sharded layout: edges grouped
    by their point's owner device (round-robin by point id), point ids
    localized, points restacked [n_dev * M_loc].

    Returns (prob_partitioned, point_map [M] global->stacked index,
    edge_perm [n_dev*E_pad] original edge row or -1 for padding)."""
    e = prob.edges
    M = int(prob.points.shape[0])
    M_loc = -(-M // n_dev)
    mp = np.asarray(e.mp)
    valid = np.asarray(e.valid)
    owner = mp % n_dev
    local = mp // n_dev
    per_dev = [np.nonzero((owner == d))[0] for d in range(n_dev)]
    E_pad = max(8, max(len(ix) for ix in per_dev))
    E_pad = -(-E_pad // 8) * 8

    def pad_rows(ix):
        out = np.full(E_pad, -1, np.int64)
        out[:len(ix)] = ix
        return out

    rows = np.concatenate([pad_rows(ix) for ix in per_dev])   # [n_dev*E_pad]
    sel = np.where(rows >= 0, rows, 0)
    pad_mask = rows >= 0
    edges = factors.Edges(
        kf=jnp.asarray(np.asarray(e.kf)[sel]),
        mp=jnp.asarray(local[sel].astype(np.int32)),
        cam=jnp.asarray(np.asarray(e.cam)[sel]),
        uv=jnp.asarray(np.asarray(e.uv)[sel]),
        inv_sigma2=jnp.asarray(np.asarray(e.inv_sigma2)[sel]),
        valid=jnp.asarray(valid[sel] & pad_mask))
    # stacked points: device d's block holds globals {m : m % n_dev == d}
    point_map = (np.arange(M) % n_dev) * M_loc + np.arange(M) // n_dev
    pts = np.zeros((n_dev * M_loc, 3), np.float32)
    pts[point_map] = np.asarray(prob.points)
    pvalid = np.zeros(n_dev * M_loc, bool)
    pvalid[point_map] = np.asarray(prob.point_valid)
    prob_p = prob._replace(points=jnp.asarray(pts), edges=edges,
                           point_valid=jnp.asarray(pvalid))
    return prob_p, point_map, rows


def solve_ba_distributed(prob: BAProblem, T_sc, adj_sc, Ks, mesh: Mesh,
                         iters: int = 10, cg_iters: int = 24,
                         cfg: BAConfig = BAConfig(),
                         robust: bool = True,
                         shard_points: bool = False) -> BAResult:
    """Distributed LM/Schur/PCG global BA.

    shard_points=False: edge arrays must have length divisible by the
    mesh's "data" axis size; points replicated.
    shard_points=True: edges+points are repartitioned by point owner
    (partition_by_point) and the landmark system stays fully local per
    device; results are returned in the caller's original layout."""
    if shard_points:
        return _solve_sharded_points(prob, T_sc, adj_sc, Ks, mesh, iters,
                                     cg_iters, cfg, robust)
    return _solve(prob, T_sc, adj_sc, Ks, mesh, iters, cg_iters, cfg,
                  robust, point_sharded=False)


def _solve_sharded_points(prob, T_sc, adj_sc, Ks, mesh, iters, cg_iters,
                          cfg, robust) -> BAResult:
    n_dev = mesh.shape["data"]
    prob_p, point_map, rows = partition_by_point(prob, n_dev)
    res = _solve(prob_p, T_sc, adj_sc, Ks, mesh, iters, cg_iters, cfg,
                 robust, point_sharded=True)
    points = np.asarray(res.points)[point_map]
    chi2 = np.zeros(prob.edges.kf.shape[0], np.float32)
    ok = rows >= 0
    chi2[rows[ok]] = np.asarray(res.edge_chi2)[ok]
    return BAResult(poses=res.poses, points=jnp.asarray(points),
                    edge_chi2=jnp.asarray(chi2), cost=res.cost)


def _solve(prob: BAProblem, T_sc, adj_sc, Ks, mesh: Mesh, iters: int,
           cg_iters: int, cfg: BAConfig, robust: bool,
           point_sharded: bool) -> BAResult:
    K = prob.poses.shape[0]
    M = prob.points.shape[0]
    delta2 = cfg.huber_delta ** 2
    robust_flag = jnp.bool_(robust)
    n_dev = mesh.shape["data"]
    E = prob.edges.kf.shape[0]
    assert E % n_dev == 0, f"edge count {E} not divisible by mesh size {n_dev}"
    # per-device landmark block size
    M_loc = M // n_dev if point_sharded else M
    if point_sharded:
        assert M % n_dev == 0

    edge_spec = P("data")
    rep = P()
    pt_spec = P("data") if point_sharded else rep

    def seg_psum(data, ids, num):
        return _psum(jax.ops.segment_sum(data, ids, num_segments=num))

    def seg_point(data, ids):
        """Landmark-sized reduction: local when points are sharded (each
        edge lives with its point's owner), psum when replicated."""
        s = jax.ops.segment_sum(data, ids, num_segments=M_loc)
        return s if point_sharded else _psum(s)

    def step_fn(poses, points, edges, pose_valid, pose_fixed, point_valid,
                lam, cost):
        """One LM step on this device's edge shard; replicated updates."""
        r, Jp, Jx, w, chi2 = _build_local(
            poses, points, edges, pose_valid, pose_fixed, point_valid,
            T_sc, adj_sc, Ks, robust_flag, delta2)
        ekf = edges.kf
        emp = edges.mp

        g_p = seg_psum(jnp.einsum('eri,e,er->ei', Jp, w, r), ekf, K)
        g_l = seg_point(jnp.einsum('eri,e,er->ei', Jx, w, r), emp)
        Hpp = seg_psum(jnp.einsum('eri,e,erj->eij', Jp, w, Jp), ekf, K)
        Hll = seg_point(jnp.einsum('eri,e,erj->eij', Jx, w, Jx), emp)

        def damp(H, l):
            d = jnp.diagonal(H, axis1=-2, axis2=-1)
            return H + jax.vmap(jnp.diag)(l * d + 1e-8)

        Hpp_d = damp(Hpp, lam)
        Hll_inv = jnp.linalg.inv(damp(Hll, lam) + 1e-9 * jnp.eye(3))
        W_e = jnp.einsum('eri,e,erj->eij', Jp, w, Jx)     # local shard

        def S_matvec(v):
            u = seg_point(jnp.einsum('eij,ei->ej', W_e, v[ekf]), emp)
            y = jnp.einsum('mij,mj->mi', Hll_inv, u)
            zz = seg_psum(jnp.einsum('eij,ej->ei', W_e, y[emp]), ekf, K)
            out = jnp.einsum('kij,kj->ki', Hpp_d, v) - zz
            return jnp.where(pose_fixed[:, None], 0.0, out)

        y0 = jnp.einsum('mij,mj->mi', Hll_inv, g_l)
        rhs = -g_p + seg_psum(jnp.einsum('eij,ej->ei', W_e, y0[emp]), ekf, K)
        rhs = jnp.where(pose_fixed[:, None], 0.0, rhs)
        P_inv = jnp.linalg.inv(Hpp_d + 1e-6 * jnp.eye(6))

        def precond(v):
            return jnp.where(pose_fixed[:, None], 0.0,
                             jnp.einsum('kij,kj->ki', P_inv, v))

        def cg_body(_, st):
            x, rr, p, rz = st
            Ap = S_matvec(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Ap
            zz = precond(rr)
            rz2 = jnp.vdot(rr, zz)
            p = zz + (rz2 / jnp.maximum(rz, 1e-20)) * p
            return x, rr, p, rz2

        z0 = precond(rhs)
        dx_p, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (jnp.zeros_like(rhs), rhs, z0,
                                   jnp.vdot(rhs, z0)))

        u = seg_point(jnp.einsum('eij,ei->ej', W_e, dx_p[ekf]), emp)
        dx_l = -jnp.einsum('mij,mj->mi', Hll_inv, g_l + u)
        dx_l = jnp.where(point_valid[:, None], dx_l, 0.0)

        from orbslam2_dualcam_tpu.ops import lie
        new_poses = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dx_p, poses)
        new_poses = jnp.where(pose_fixed[:, None, None], poses, new_poses)
        new_points = points + dx_l

        # replicated robust cost of the trial point
        def cost_of(ps, xs):
            rr, _, _, ww, c2 = _build_local(
                ps, xs, edges, pose_valid, pose_fixed, point_valid,
                T_sc, adj_sc, Ks, jnp.bool_(False), delta2)
            emask = (edges.valid & pose_valid[edges.kf] &
                     point_valid[edges.mp])
            rho = jnp.where(robust_flag & (c2 > delta2),
                            2.0 * jnp.sqrt(delta2 * jnp.maximum(c2, 0.0)) -
                            delta2, c2)
            return _psum(jnp.where(emask, rho, 0.0).sum())

        new_cost = cost_of(new_poses, new_points)
        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.clip(jnp.where(accept, lam / cfg.lm_lambda_factor,
                                 lam * cfg.lm_lambda_factor), 1e-8, 1e8)
        cost = jnp.where(accept, new_cost, cost)
        return poses, points, lam, cost

    def shard_body(poses, points, e_kf, e_mp, e_cam, e_uv, e_s2, e_valid,
                   pose_valid, pose_fixed, point_valid):
        from orbslam2_dualcam_tpu.optim.factors import Edges
        edges = Edges(kf=e_kf, mp=e_mp, cam=e_cam, uv=e_uv,
                      inv_sigma2=e_s2, valid=e_valid)

        def init_cost(ps, xs):
            r, _, _, w, c2 = _build_local(
                ps, xs, edges, pose_valid, pose_fixed, point_valid,
                T_sc, adj_sc, Ks, jnp.bool_(False), delta2)
            emask = (edges.valid & pose_valid[edges.kf] &
                     point_valid[edges.mp])
            rho = jnp.where(robust_flag & (c2 > delta2),
                            2.0 * jnp.sqrt(delta2 * jnp.maximum(c2, 0.0)) -
                            delta2, c2)
            return _psum(jnp.where(emask, rho, 0.0).sum())

        def body(carry, _):
            poses, points, lam, cost = carry
            poses, points, lam, cost = step_fn(
                poses, points, edges, pose_valid, pose_fixed, point_valid,
                lam, cost)
            return (poses, points, lam, cost), None

        c0 = init_cost(poses, points)
        (poses, points, _, cost), _ = jax.lax.scan(
            body, (poses, points, jnp.float32(cfg.lm_lambda_init), c0),
            None, length=iters)
        # final chi2 on the local shard (stays sharded)
        r, _, _, _, chi2 = _build_local(
            poses, points, edges, pose_valid, pose_fixed, point_valid,
            T_sc, adj_sc, Ks, jnp.bool_(False), delta2)
        return poses, points, chi2, cost

    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(rep, pt_spec, edge_spec, edge_spec, edge_spec, edge_spec,
                  edge_spec, edge_spec, rep, rep, pt_spec),
        out_specs=(rep, pt_spec, edge_spec, rep),
        check_vma=False)

    e = prob.edges
    # explicit global device_put: under multi-controller JAX
    # (jax.distributed across hosts) every process holds the same host
    # arrays and this scatters each one onto its (possibly remote) shards;
    # single-process it is a plain transfer
    specs = (rep, pt_spec, edge_spec, edge_spec, edge_spec, edge_spec,
             edge_spec, edge_spec, rep, rep, pt_spec)
    args = (prob.poses, prob.points, e.kf, e.mp, e.cam, e.uv, e.inv_sigma2,
            e.valid, prob.pose_valid, prob.pose_fixed, prob.point_valid)
    args = tuple(jax.device_put(a, NamedSharding(mesh, s))
                 for a, s in zip(args, specs))
    poses, points, chi2, cost = jax.jit(mapped)(*args)
    return BAResult(poses=poses, points=points, edge_chi2=chi2, cost=cost)
