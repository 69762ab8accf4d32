"""Bundle adjustment: Levenberg-Marquardt with landmark Schur elimination
and a matrix-free PCG solve of the reduced camera system.

TPU re-design of Optimizer::BundleAdjustment / LocalBundleAdjustment
(src/Optimizer.cc:62-248, 407-696), which build a fresh g2o SparseOptimizer
with BlockSolver_6_3 + sparse Cholesky per call.  Here the normal equations
are never materialized as sparse matrices:

* Landmark blocks H_ll are 3x3 — inverted in closed form, batched [M,3,3].
* The reduced camera system S = H_pp - W H_ll^-1 W^T is applied
  *matrix-free*: S v costs two edge-gathers + two segment-sums, so a PCG
  iteration is pure gather/scatter/einsum — no data-dependent sparsity.
* Block-Jacobi preconditioner from the 6x6 pose diagonal.
* Gauge/scale fixing: a boolean `fixed` mask per pose zeroes its updates
  (the reference fixes mnId==fixId / the first-scale KF, Optimizer.cc:99,
  LocalMapping.cc:100-103).

The same routine serves LocalBA (caller restricts the pose/point/edge sets)
and GlobalBA (everything), matching the reference where LocalBA is just BA
on the covisibility window with fixed spectators (Optimizer.cc:407-500).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_dualcam_tpu.ops import lie
from orbslam2_dualcam_tpu.optim import factors
from orbslam2_dualcam_tpu.optim.factors import Edges
from orbslam2_dualcam_tpu.utils.config import BAConfig


class BAProblem(NamedTuple):
    poses: jax.Array       # [K, 4, 4] T_cw rig poses
    points: jax.Array      # [M, 3] world points
    edges: Edges           # padded observation table
    pose_valid: jax.Array  # [K] bool — slot holds a real KF
    pose_fixed: jax.Array  # [K] bool — held constant (gauge/scale anchors)
    point_valid: jax.Array # [M] bool


class BAResult(NamedTuple):
    poses: jax.Array
    points: jax.Array
    edge_chi2: jax.Array   # [E] final per-edge chi2 (for outlier culling)
    cost: jax.Array


def _build_system(prob: BAProblem, T_sc, adj_sc, Ks, robust: jax.Array,
                  delta2: float):
    """Residuals, Jacobians, weights, and per-edge chi2."""
    r, Jp, Jx = factors.edge_residuals_jacobians(
        prob.poses, prob.points, prob.edges, T_sc, adj_sc, Ks)
    chi2 = jnp.sum(r * r, -1) * prob.edges.inv_sigma2
    w = prob.edges.inv_sigma2 * jnp.where(
        robust, factors.huber_weight(chi2, delta2), 1.0)
    emask = (prob.edges.valid & prob.pose_valid[prob.edges.kf] &
             prob.point_valid[prob.edges.mp])
    w = jnp.where(emask, w, 0.0)
    # fixed poses contribute residuals but no pose-block derivatives
    Jp = jnp.where(prob.pose_fixed[prob.edges.kf, None, None], 0.0, Jp)
    return r, Jp, Jx, w, chi2


def _segment_sum(data, ids, num):
    return jax.ops.segment_sum(data, ids, num_segments=num)


import functools


@functools.partial(jax.jit,
                   static_argnames=("iters", "cfg", "cg_iters", "robust"))
def solve_ba(prob: BAProblem, T_sc: jax.Array, adj_sc: jax.Array,
             Ks: jax.Array, iters: int, cfg: BAConfig = BAConfig(),
             cg_iters: int = 24, robust: bool = True) -> BAResult:
    """LM loop. `iters`/`cg_iters` are static; per-iteration accept/reject
    keeps the best state (no data-dependent control flow).

    Jitted at this boundary: ba_pack's shape buckets make the cache
    effective, and eager execution of the big scan primitive (one fresh
    standalone XLA computation per call) both recompiled wastefully and
    intermittently segfaulted XLA:CPU in long sessions."""
    K = prob.poses.shape[0]
    M = prob.points.shape[0]
    delta2 = cfg.huber_delta ** 2
    robust_flag = jnp.bool_(robust)

    def cost_of(poses, points):
        p2 = prob._replace(poses=poses, points=points)
        r, _, _, w0, chi2 = _build_system(p2, T_sc, adj_sc, Ks,
                                          jnp.bool_(False), delta2)
        emask = (prob.edges.valid & prob.pose_valid[prob.edges.kf] &
                 prob.point_valid[prob.edges.mp])
        # robust cost: Huber rho for comparison, matching what LM minimizes
        rho = jnp.where(robust_flag & (chi2 > delta2),
                        2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2,
                        chi2)
        return jnp.where(emask, rho, 0.0).sum()

    def lm_step(carry, _):
        poses, points, lam, cost = carry
        p2 = prob._replace(poses=poses, points=points)
        r, Jp, Jx, w, chi2 = _build_system(p2, T_sc, adj_sc, Ks,
                                           robust_flag, delta2)
        ekf = prob.edges.kf
        emp = prob.edges.mp

        # gradient blocks
        g_p = _segment_sum(jnp.einsum('eri,e,er->ei', Jp, w, r), ekf, K)  # [K,6]
        g_l = _segment_sum(jnp.einsum('eri,e,er->ei', Jx, w, r), emp, M)  # [M,3]

        # Hessian blocks
        Hpp = _segment_sum(jnp.einsum('eri,e,erj->eij', Jp, w, Jp), ekf, K)
        Hll = _segment_sum(jnp.einsum('eri,e,erj->eij', Jx, w, Jx), emp, M)
        # damping (Marquardt: scale diagonals)
        def damp(H, l):
            d = jnp.diagonal(H, axis1=-2, axis2=-1)
            dd = l * d + 1e-8
            return H + jax.vmap(jnp.diag)(dd)
        Hpp_d = damp(Hpp, lam)
        Hll_d = damp(Hll, lam)
        Hll_inv = jnp.linalg.inv(
            Hll_d + 1e-9 * jnp.eye(3))           # [M,3,3] (masked pts ~ eps I)

        # per-edge coupling W_e = Jp^T w Jx  (6x3); S v uses it matrix-free
        W_e = jnp.einsum('eri,e,erj->eij', Jp, w, Jx)   # [E,6,3]

        def S_matvec(v):                                 # v: [K,6]
            u = jnp.einsum('eij,ei->ej', W_e, v[ekf])            # [E,3]
            u = _segment_sum(u, emp, M)                          # [M,3] = W^T v
            y = jnp.einsum('mij,mj->mi', Hll_inv, u)             # H_ll^-1 W^T v
            z = jnp.einsum('eij,ej->ei', W_e, y[emp])            # [E,6]
            z = _segment_sum(z, ekf, K)                          # W H^-1 W^T v
            out = jnp.einsum('kij,kj->ki', Hpp_d, v) - z
            return jnp.where(prob.pose_fixed[:, None], 0.0, out)

        # rhs: -g_p + W Hll^-1 g_l
        y0 = jnp.einsum('mij,mj->mi', Hll_inv, g_l)
        rhs = -g_p + _segment_sum(jnp.einsum('eij,ej->ei', W_e, y0[emp]), ekf, K)
        rhs = jnp.where(prob.pose_fixed[:, None], 0.0, rhs)

        # block-Jacobi preconditioner
        P_inv = jnp.linalg.inv(Hpp_d + 1e-6 * jnp.eye(6))

        def precond(v):
            out = jnp.einsum('kij,kj->ki', P_inv, v)
            return jnp.where(prob.pose_fixed[:, None], 0.0, out)

        def cg_body(_, state):
            x, rr, p, rz = state
            Ap = S_matvec(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.vdot(rr, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = z + beta * p
            return x, rr, p, rz_new

        x0 = jnp.zeros_like(rhs)
        z0 = precond(rhs)
        dx_p, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (x0, rhs, z0, jnp.vdot(rhs, z0)))

        # back-substitute landmarks: dx_l = -Hll^-1 (g_l + W^T dx_p)
        u = _segment_sum(jnp.einsum('eij,ei->ej', W_e, dx_p[ekf]), emp, M)
        dx_l = -jnp.einsum('mij,mj->mi', Hll_inv, g_l + u)
        dx_l = jnp.where(prob.point_valid[:, None], dx_l, 0.0)

        new_poses = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dx_p, poses)
        new_poses = jnp.where(prob.pose_fixed[:, None, None], poses, new_poses)
        new_points = points + dx_l

        new_cost = cost_of(new_poses, new_points)
        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.clip(jnp.where(accept, lam / cfg.lm_lambda_factor,
                                 lam * cfg.lm_lambda_factor), 1e-8, 1e8)
        cost = jnp.where(accept, new_cost, cost)
        return (poses, points, lam, cost), None

    cost0 = cost_of(prob.poses, prob.points)
    (poses, points, _, cost), _ = jax.lax.scan(
        lm_step, (prob.poses, prob.points, jnp.float32(cfg.lm_lambda_init),
                  cost0), None, length=iters)

    # final per-edge chi2 for outlier erasure by the caller
    p2 = prob._replace(poses=poses, points=points)
    r, _, _, _, chi2 = _build_system(p2, T_sc, adj_sc, Ks, jnp.bool_(False),
                                     delta2)
    return BAResult(poses=poses, points=points, edge_chi2=chi2, cost=cost)


def solve_ba_chunked(prob: BAProblem, T_sc, adj_sc, Ks, iters: int,
                     chunk: int = 4, should_abort=None,
                     unlock=None, relock=None,
                     cfg: BAConfig = BAConfig(),
                     cg_iters: int = 24, robust: bool = True) -> BAResult:
    """Abortable LM: run `iters` in fixed-size jitted chunks, checking
    `should_abort()` between chunks (the reference's mbAbortBA flag that
    LocalMapping::InterruptBA raises when a new keyframe arrives,
    LocalMapping.cc:97-108, Optimizer.cc:483).  `unlock`/`relock` bracket
    the device solve so a concurrently-tracking thread can use the map
    while the chunk executes (pipeline/system.py passes the map lock).

    Chunk size is static so all chunks share one XLA executable; the LM
    damping restarts per chunk (accept/reject inside solve_ba keeps each
    chunk monotone, so a restart only costs a few extra inner iterations).
    """
    done = 0
    res = None
    cur = prob
    while done < iters:
        n = min(chunk, iters - done)
        if unlock is not None:
            unlock()
        try:
            step = solve_ba(cur, T_sc, adj_sc, Ks, iters=n, cfg=cfg,
                            cg_iters=cg_iters, robust=robust)
            jax.block_until_ready(step.poses)
        finally:
            if relock is not None:
                relock()
        res = step
        cur = cur._replace(poses=step.poses, points=step.points)
        done += n
        if should_abort is not None and done < iters and should_abort():
            break
    return res
