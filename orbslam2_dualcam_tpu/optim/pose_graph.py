"""Sim3 pose-graph (essential graph) optimization.

TPU re-design of Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:
699-974): 7-DoF similarity poses per keyframe, constrained by spanning-tree
edges, strong covisibility edges (weight >= 100), and loop edges; solved by
Gauss-Newton/LM with per-edge 7x7 Jacobians obtained by vmapped forward-mode
autodiff (the residual is exact, no Jacobian hand-derivation to go stale)
and a block-Jacobi PCG on the normal equations — the same matrix-free
pattern as optim/ba.py.

After optimization each keyframe pose becomes [R, t/s] (Optimizer.cc:
962-967) and map points are remapped through their reference keyframe's
old->new similarity (Optimizer.cc:969-974 equivalent, done by the host
wrapper)."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.models.map import Map
from orbslam2_dualcam_tpu.ops import lie


def _edge_residual(xi_i, xi_j, S_i0, S_j0, S_meas_inv, fix_scale):
    """r = log_sim3( S_meas^-1 * (exp(xi_i) S_i0) * (exp(xi_j) S_j0)^-1 )."""
    xi_i = jnp.where(fix_scale, xi_i.at[6].set(0.0), xi_i)
    xi_j = jnp.where(fix_scale, xi_j.at[6].set(0.0), xi_j)
    S_i = lie.sim3_exp(xi_i) @ S_i0
    S_j = lie.sim3_exp(xi_j) @ S_j0
    M = S_meas_inv @ S_i @ lie.sim3_inv(S_j)
    return lie.sim3_log(M)


def optimize_pose_graph(S0: jax.Array, e_i: jax.Array, e_j: jax.Array,
                        S_meas: jax.Array, e_valid: jax.Array,
                        fixed: jax.Array, iters: int = 40,
                        cg_iters: int = 32, fix_scale: bool = False):
    """Solve the Sim3 pose graph.

    S0 [K,4,4] initial sim3 node poses (world->kf), e_i/e_j [E] node ids,
    S_meas [E,4,4] measured S_i * S_j^-1, fixed [K] bool.
    Returns optimized [K,4,4]."""
    K = S0.shape[0]
    Em = S_meas.shape[0]
    S_meas_inv = jax.vmap(lie.sim3_inv)(S_meas)
    fs = jnp.bool_(fix_scale)

    res_fn = jax.vmap(
        lambda xi_i, xi_j, Si, Sj, Smi: _edge_residual(
            xi_i, xi_j, Si, Sj, Smi, fs))
    jac_fn = jax.vmap(
        jax.jacfwd(lambda a, b, Si, Sj, Smi: _edge_residual(
            a, b, Si, Sj, Smi, fs), argnums=(0, 1)))

    def total_cost(S):
        z = jnp.zeros((Em, 7))
        r = res_fn(z, z, S[e_i], S[e_j], S_meas_inv)
        return jnp.sum(jnp.where(e_valid[:, None], r * r, 0.0))

    def lm_step(carry, _):
        S, lam, cost = carry
        z = jnp.zeros((Em, 7))
        r = res_fn(z, z, S[e_i], S[e_j], S_meas_inv)        # [E,7]
        Ji, Jj = jac_fn(z, z, S[e_i], S[e_j], S_meas_inv)    # [E,7,7] each
        w = e_valid.astype(jnp.float32)
        # gradient
        g = jnp.zeros((K, 7))
        g = g.at[e_i].add(jnp.einsum('eri,er,e->ei', Ji, r, w))
        g = g.at[e_j].add(jnp.einsum('eri,er,e->ei', Jj, r, w))
        # block-diagonal
        H = jnp.zeros((K, 7, 7))
        H = H.at[e_i].add(jnp.einsum('eri,erj,e->eij', Ji, Ji, w))
        H = H.at[e_j].add(jnp.einsum('eri,erj,e->eij', Jj, Jj, w))
        H_d = H + lam * jax.vmap(jnp.diag)(
            jnp.diagonal(H, axis1=-2, axis2=-1)) + 1e-6 * jnp.eye(7)
        # off-diagonal edge blocks W_e = Ji^T Jj
        W_e = jnp.einsum('eri,erj,e->eij', Ji, Jj, w)

        free = ~fixed

        def matvec(v):
            out = jnp.einsum('kij,kj->ki', H_d, v)
            out = out.at[e_i].add(jnp.einsum('eij,ej->ei', W_e, v[e_j]))
            out = out.at[e_j].add(jnp.einsum('eij,ei->ej', W_e, v[e_i]))
            return jnp.where(free[:, None], out, 0.0)

        P_inv = jnp.linalg.inv(H_d)

        def precond(v):
            return jnp.where(free[:, None],
                             jnp.einsum('kij,kj->ki', P_inv, v), 0.0)

        rhs = jnp.where(free[:, None], -g, 0.0)

        def cg_body(_, st):
            x, rr, p, rz = st
            Ap = matvec(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Ap
            zz = precond(rr)
            rz2 = jnp.vdot(rr, zz)
            p = zz + (rz2 / jnp.maximum(rz, 1e-20)) * p
            return x, rr, p, rz2

        z0 = precond(rhs)
        dx, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (jnp.zeros_like(rhs), rhs, z0,
                                   jnp.vdot(rhs, z0)))
        dx = jnp.where(fs, dx.at[:, 6].set(0.0), dx)
        S_new = jax.vmap(lambda d, s: lie.sim3_exp(d) @ s)(dx, S)
        S_new = jnp.where(fixed[:, None, None], S, S_new)
        new_cost = total_cost(S_new)
        accept = new_cost < cost
        S = jnp.where(accept, S_new, S)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-8, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return (S, lam, cost), None

    (S, _, cost), _ = jax.lax.scan(
        lm_step, (S0, jnp.float32(1e-6), total_cost(S0)), None, length=iters)
    return S, cost


# ---------------------------------------------------------------------------
# host wrapper over the map
# ---------------------------------------------------------------------------

def optimize_essential_graph(m: Map, rig, loop_kid: int, cur_kid: int,
                             old_poses: Dict[int, np.ndarray] | None = None,
                             loop_connections: Dict[int, set] | None = None,
                             fix_scale: bool = False,
                             iters: int = 40,
                             corrected_sim: Dict[int, np.ndarray] | None = None,
                             corrected_mids: Dict[int, int] | None = None) -> None:
    """Build the essential graph from the map and solve it.

    Edge set (Optimizer.cc:757-860): spanning-tree edges, loop edges,
    covisibility edges with weight >= 100; measurements from `old_poses`
    (pre-correction) when provided, so the already-corrected window pulls
    the rest of the trajectory around the loop.

    `corrected_sim` maps window keyframes to their FULL corrected Sim3
    (scale included) — the reference's vScw/CorrectedSim3
    (Optimizer.cc:739-755): those nodes start at the corrected similarity
    (not the scale-stripped SE3 written into the map) and loop-edge
    measurements are taken from it, so the 7-DoF graph can redistribute
    monocular scale drift.  `corrected_mids` maps already-corrected map
    points to the window keyframe that corrected them — the reference's
    mnCorrectedByKF/mnCorrectedReference (Optimizer.cc:905-935) — so the
    remap below transforms each point exactly once."""
    kids = sorted(m.keyframes.keys())
    if len(kids) < 3:
        return
    slot = {kid: i for i, kid in enumerate(kids)}
    K = len(kids)
    corrected_sim = corrected_sim or {}
    corrected_mids = corrected_mids or {}

    def pose_of(kid) -> np.ndarray:
        if old_poses is not None and kid in old_poses:
            return old_poses[kid]
        return m.keyframes[kid].T_cw

    def current_sim(kid) -> np.ndarray:
        return corrected_sim.get(kid, m.keyframes[kid].T_cw)

    S0 = np.stack([current_sim(kid) for kid in kids]).astype(np.float32)

    edges: List[Tuple[int, int, np.ndarray]] = []
    seen = set()

    def add_edge(a: int, b: int, use_current: bool = False):
        if a not in slot or b not in slot or a == b:
            return
        kkey = (min(a, b), max(a, b))
        if kkey in seen:
            return
        seen.add(kkey)
        Sa = current_sim(a) if use_current else pose_of(a)
        Sb = current_sim(b) if use_current else pose_of(b)
        S_ab = Sa @ np.linalg.inv(Sb)
        edges.append((slot[a], slot[b], S_ab.astype(np.float32)))

    for kid in kids:
        kf = m.keyframes[kid]
        if kf.parent >= 0:
            add_edge(kid, kf.parent)
        for lk in kf.loop_edges:
            add_edge(kid, lk, use_current=True)
        for nkid, w in kf.covis.items():
            if w >= 100:
                add_edge(kid, nkid)
    if loop_connections:
        for a, bs in loop_connections.items():
            for b in bs:
                add_edge(a, b, use_current=True)

    E = len(edges)
    if E < 2:
        return
    e_i = np.asarray([e[0] for e in edges], np.int32)
    e_j = np.asarray([e[1] for e in edges], np.int32)
    S_meas = np.stack([e[2] for e in edges])
    fixed = np.zeros(K, bool)
    fixed[slot[loop_kid]] = True

    S_opt, cost = optimize_pose_graph(
        jnp.asarray(S0), jnp.asarray(e_i), jnp.asarray(e_j),
        jnp.asarray(S_meas), jnp.ones(E, bool), jnp.asarray(fixed),
        iters=iters, fix_scale=fix_scale)
    S_opt = np.asarray(S_opt, np.float64)

    # write back SE3 poses [R, t/s] and remap points via reference KF.
    # For a point already moved by the Sim3 window correction, "old" is the
    # corrected Sim3 of the keyframe that moved it (Optimizer.cc:905-920);
    # using the pre-correction pose there would transform it twice.
    old_sim: Dict[int, np.ndarray] = {kid: pose_of(kid).copy()
                                      for kid in kids}
    new_sim: Dict[int, np.ndarray] = {}
    for kid in kids:
        S = S_opt[slot[kid]]
        sR = S[:3, :3]
        s = float(np.cbrt(np.linalg.det(sR)))
        T = np.eye(4)
        T[:3, :3] = sR / s
        T[:3, 3] = S[:3, 3] / s
        new_sim[kid] = S
        m.keyframes[kid].T_cw = T
    for mp in m.points.values():
        corr_ref = corrected_mids.get(mp.mid, -1)
        if corr_ref >= 0 and corr_ref in slot:
            ref = corr_ref
            S_old = corrected_sim[ref]
        else:
            ref = mp.ref_kid if mp.ref_kid in slot else (
                next(iter(mp.obs)) if mp.obs else -1)
            if ref < 0 or ref not in slot:
                continue
            S_old = old_sim[ref]
        S_new = new_sim[ref]
        x = S_old[:3, :3] @ mp.pos + S_old[:3, 3]         # into old kf frame
        Sni = np.linalg.inv(S_new)
        mp.pos = Sni[:3, :3] @ x + Sni[:3, 3]
