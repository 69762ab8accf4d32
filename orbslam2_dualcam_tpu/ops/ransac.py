"""Batched RANSAC solvers: homography / fundamental two-view initialization,
PnP, and Horn similarity (Sim3) alignment.

TPU re-design of the reference's sequential adaptive RANSAC loops:
* Initializer.cc (949 LoC): H & F estimated in two *threads* with 200
  iterations each, model selected by score ratio RH>0.40, then
  ReconstructH/ReconstructF motion decomposition with cheirality tests.
* PnPsolver.cc (1058 LoC): EPnP + adaptive RANSAC.
* Sim3Solver.cc (453 LoC): 3-point Horn + RANSAC.

Here every hypothesis is a lane of a vmap: a fixed budget of minimal-set
samples is drawn with jax.random, ALL models are solved and scored in one
batched program, and the best model is argmax-selected on device.  The
reference's early-exit adaptivity is replaced by a fixed budget (hypothesis
count is the config knob), which is the TPU-idiomatic trade: more FLOPs,
zero divergence, one compiled program.

PnP divergence note: the reference uses EPnP (4 control points, Gauss-
Newton betas). We use 6-point DLT-PnP per hypothesis + orthonormalization,
followed by the LM pose refinement in optim/pose_opt — same role (absolute
pose from 3D-2D under outliers), simpler dense linear algebra.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_dualcam_tpu.ops import lie


def _sample_indices(key: jax.Array, n_hyp: int, k: int, n: int,
                    weights: jax.Array | None = None) -> jax.Array:
    """[n_hyp, k] random indices in [0, n). Sampling with replacement within
    a hypothesis is tolerated (degenerate samples score 0 inliers), matching
    fixed-shape requirements; `weights` biases sampling to valid rows."""
    if weights is None:
        return jax.random.randint(key, (n_hyp, k), 0, n)
    logits = jnp.log(jnp.maximum(weights, 1e-9))
    return jax.random.categorical(key, logits[None, :], axis=-1,
                                  shape=(n_hyp, k))


def _normalize_2d(uv: jax.Array, valid: jax.Array):
    """Hartley normalization (Initializer::Normalize, Initializer.cc:767+)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (uv * w[:, None]).sum(0) / n
    d = jnp.abs(uv - mean) * w[:, None]
    md = jnp.maximum(d.sum(0) / n, 1e-6)
    s = 1.0 / md
    T = jnp.array([[s[0], 0, -mean[0] * s[0]],
                   [0, s[1], -mean[1] * s[1]],
                   [0, 0, 1]], uv.dtype)
    uvn = (uv - mean) * s
    return uvn, T


# ---------------------------------------------------------------------------
# homography
# ---------------------------------------------------------------------------

def _h_from_4pts(uv1: jax.Array, uv2: jax.Array) -> jax.Array:
    """DLT homography from 4 correspondences (uv1 -> uv2), each (4,2)."""
    def rows(p, q):
        x, y = p
        u, v = q
        z = jnp.zeros(())
        o = jnp.ones(())
        r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u])
        r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v])
        return jnp.stack([r1, r2])

    A = jnp.concatenate([rows(uv1[i], uv2[i]) for i in range(4)])  # (8,9)
    AtA = A.T @ A
    w, v = jnp.linalg.eigh(AtA)
    return v[:, 0].reshape(3, 3)


def _h_transfer_err2(H: jax.Array, uv1: jax.Array, uv2: jax.Array):
    """Symmetric transfer errors (CheckHomography, Initializer.cc:142-238)."""
    def xfer(H, a, b):
        x = jnp.concatenate([a, jnp.ones_like(a[..., :1])], -1) @ H.T
        x = x[..., :2] / jnp.where(jnp.abs(x[..., 2:]) > 1e-9, x[..., 2:], 1e-9)
        return jnp.sum((x - b) ** 2, -1)

    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    return xfer(H, uv1, uv2), xfer(Hinv, uv2, uv1)


# ---------------------------------------------------------------------------
# fundamental
# ---------------------------------------------------------------------------

def _f_from_8pts(uv1: jax.Array, uv2: jax.Array) -> jax.Array:
    """8-point algorithm with rank-2 projection, inputs (8,2) each."""
    x1 = jnp.concatenate([uv1, jnp.ones((8, 1), uv1.dtype)], -1)
    x2 = jnp.concatenate([uv2, jnp.ones((8, 1), uv2.dtype)], -1)
    A = (x2[:, :, None] * x1[:, None, :]).reshape(8, 9)
    AtA = A.T @ A
    _, v = jnp.linalg.eigh(AtA)
    F = v[:, 0].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return U @ jnp.diag(S) @ Vt


def _h_refit(uv1n: jax.Array, uv2n: jax.Array, w: jax.Array) -> jax.Array:
    """Least-squares homography over all inliers (weighted 9x9 eigh).
    Normalized coords keep the normal equations well-conditioned."""
    x, y = uv1n[:, 0], uv1n[:, 1]
    u, v = uv2n[:, 0], uv2n[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]])
    AtA = A.T @ A
    _, vv = jnp.linalg.eigh(AtA)
    return vv[:, 0].reshape(3, 3)


def _f_refit(uv1n: jax.Array, uv2n: jax.Array, w: jax.Array) -> jax.Array:
    """Least-squares fundamental over all inliers + rank-2 projection.

    The 8-point minimal fit is too noisy to decompose into (R, t): its
    projection onto the essential manifold moves the epipolar geometry by
    several pixels.  Re-fitting on all RANSAC inliers fixes that (the
    reference gets away without it by running in double precision over
    the best minimal model; we measured ~21px^2 triangulation residuals
    without the refit in float32)."""
    x1 = jnp.concatenate([uv1n, jnp.ones_like(uv1n[:, :1])], -1)
    x2 = jnp.concatenate([uv2n, jnp.ones_like(uv2n[:, :1])], -1)
    A = (x2[:, :, None] * x1[:, None, :]).reshape(-1, 9) * w[:, None]
    AtA = A.T @ A
    _, vv = jnp.linalg.eigh(AtA)
    F = vv[:, 0].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    return U @ jnp.diag(S.at[2].set(0.0)) @ Vt


def _f_epipolar_err2(F: jax.Array, uv1: jax.Array, uv2: jax.Array):
    """Squared point-line distances both directions (CheckFundamental,
    Initializer.cc:240-330)."""
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], -1)
    x2 = jnp.concatenate([uv2, jnp.ones_like(uv2[..., :1])], -1)
    l2 = x1 @ F.T        # line in image 2
    l1 = x2 @ F
    d2 = (jnp.sum(l2 * x2, -1) ** 2) / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12)
    d1 = (jnp.sum(l1 * x1, -1) ** 2) / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)
    return d1, d2


class TwoViewResult(NamedTuple):
    success: jax.Array      # bool
    is_h: jax.Array         # bool — model chosen
    T_21: jax.Array         # (4,4) pose of view2 w.r.t. view1 (unit-norm t)
    points: jax.Array       # (N,3) triangulated in view-1 frame
    inliers: jax.Array      # (N,) bool — triangulated good points
    score_h: jax.Array
    score_f: jax.Array


def _score(err2_a, err2_b, valid, sigma2, th, th_score):
    """Initializer scoring: sum over inliers of (thScore - err2/sigma2),
    counting both directions (Initializer.cc:142-330)."""
    ca = err2_a / sigma2
    cb = err2_b / sigma2
    good = (ca < th) & (cb < th) & valid
    sa = jnp.where(ca < th_score, th_score - ca, 0.0)
    sb = jnp.where(cb < th_score, th_score - cb, 0.0)
    return jnp.where(valid & (ca < th_score), sa, 0.0).sum() + \
        jnp.where(valid & (cb < th_score), sb, 0.0).sum(), good


def two_view_init(key: jax.Array, uv1: jax.Array, uv2: jax.Array,
                  valid: jax.Array, K: jax.Array, n_hyp: int = 256,
                  sigma: float = 1.0, min_parallax_deg: float = 1.0,
                  min_triangulated: int = 50):
    """Full monocular two-view initialization (Initializer::Initialize).

    uv1/uv2 [N,2] matched undistorted pixels; valid [N].  Returns
    TwoViewResult with T_21 scaled to unit translation (the caller
    normalizes by median depth, as Tracking.cc:2063-2087 does)."""
    N = uv1.shape[0]
    sigma2 = sigma * sigma
    kh, kf2 = jax.random.split(key)
    w = valid.astype(jnp.float32)

    uv1n, T1 = _normalize_2d(uv1, valid)
    uv2n, T2 = _normalize_2d(uv2, valid)

    # ---- homography hypotheses (normalized coords) ----
    idx_h = _sample_indices(kh, n_hyp, 4, N, w)

    def solve_h(idx):
        Hn = _h_from_4pts(uv1n[idx], uv2n[idx])
        H = jnp.linalg.inv(T2) @ Hn @ T1
        e1, e2 = _h_transfer_err2(H, uv1, uv2)
        s, good = _score(e1, e2, valid, sigma2, 5.991, 5.991)
        return H, s, good

    Hs, h_scores, h_good = jax.vmap(solve_h)(idx_h)
    bh = jnp.argmax(h_scores)
    score_h, h_inl = h_scores[bh], h_good[bh]
    # refit on all inliers, re-derive the inlier set once
    Hn = _h_refit(uv1n, uv2n, h_inl.astype(uv1.dtype))
    H_best = jnp.linalg.inv(T2) @ Hn @ T1
    e1h, e2h = _h_transfer_err2(H_best, uv1, uv2)
    score_h, h_inl = _score(e1h, e2h, valid, sigma2, 5.991, 5.991)

    # ---- fundamental hypotheses ----
    idx_f = _sample_indices(kf2, n_hyp, 8, N, w)

    def solve_f(idx):
        Fn = _f_from_8pts(uv1n[idx], uv2n[idx])
        F = T2.T @ Fn @ T1
        e1, e2 = _f_epipolar_err2(F, uv1, uv2)
        s, good = _score(e1, e2, valid, sigma2, 3.841, 5.991)
        return F, s, good

    Fs, f_scores, f_good = jax.vmap(solve_f)(idx_f)
    bf = jnp.argmax(f_scores)
    score_f, f_inl = f_scores[bf], f_good[bf]
    Fn = _f_refit(uv1n, uv2n, f_inl.astype(uv1.dtype))
    F_best = T2.T @ Fn @ T1
    e1f, e2f = _f_epipolar_err2(F_best, uv1, uv2)
    score_f, f_inl = _score(e1f, e2f, valid, sigma2, 3.841, 5.991)

    # ---- model selection: RH = SH/(SH+SF) > 0.40 -> H (Initializer.cc:135)
    rh = score_h / jnp.maximum(score_h + score_f, 1e-9)
    use_h = rh > 0.40

    # ---- reconstruct both, select on device ----
    ok_h, T_h, P_h, inl3d_h = _reconstruct_h(H_best, K, uv1, uv2, h_inl,
                                             sigma2, min_parallax_deg,
                                             min_triangulated)
    ok_f, T_f, P_f, inl3d_f = _reconstruct_f(F_best, K, uv1, uv2, f_inl,
                                             sigma2, min_parallax_deg,
                                             min_triangulated)
    T_21 = jnp.where(use_h, T_h, T_f)
    pts = jnp.where(use_h, P_h, P_f)
    inl = jnp.where(use_h, inl3d_h, inl3d_f)
    success = jnp.where(use_h, ok_h, ok_f)
    return TwoViewResult(success=success, is_h=use_h, T_21=T_21, points=pts,
                         inliers=inl, score_h=score_h, score_f=score_f)


def _triangulate_and_check(R, t, K, uv1, uv2, match_inl, sigma2,
                           min_parallax_deg):
    """CheckRT (Initializer.cc:752-910): triangulate with candidate motion,
    count points passing cheirality/parallax/reprojection both views."""
    from orbslam2_dualcam_tpu.ops import epipolar as epi
    T1 = jnp.eye(4, dtype=R.dtype)
    T2 = lie.se3(R, t)
    P1 = K @ T1[:3, :4]
    P2 = K @ T2[:3, :4]
    X = epi.triangulate_dlt(P1, P2, uv1, uv2)
    finite = jnp.all(jnp.isfinite(X), -1)
    X = jnp.where(finite[:, None], X, 0.0)
    c2 = -R.T @ t
    ray1 = X
    ray2 = X - c2
    cosp = jnp.sum(ray1 * ray2, -1) / jnp.maximum(
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-12)
    x2 = lie.se3_apply(T2, X)
    z1 = X[:, 2]
    z2 = x2[:, 2]

    def reproj2(P, X, uv):
        Xh = jnp.concatenate([X, jnp.ones_like(X[:, :1])], -1)
        p = Xh @ P.T
        p = p[:, :2] / jnp.where(jnp.abs(p[:, 2:]) > 1e-9, p[:, 2:], 1e-9)
        return jnp.sum((p - uv) ** 2, -1)

    good_parallax = cosp < jnp.cos(jnp.deg2rad(min_parallax_deg))
    ok = match_inl & finite & (z1 > 0) & (z2 > 0)
    ok &= reproj2(P1, X, uv1) < 4.0 * sigma2
    ok &= reproj2(P2, X, uv2) < 4.0 * sigma2
    n_good = jnp.sum(ok & good_parallax)
    # parallax statistic: ~50th best parallax among good (Initializer takes
    # the 50th-smallest cos; we use median of good)
    cos_sorted = jnp.sort(jnp.where(ok, cosp, 1.0))
    idx50 = jnp.minimum(50, jnp.maximum(jnp.sum(ok) - 1, 0))
    parallax_cos = cos_sorted[idx50]
    return n_good, parallax_cos, X, ok & good_parallax


def _reconstruct_f(F, K, uv1, uv2, inl, sigma2, min_parallax_deg, min_tri):
    """ReconstructF (Initializer.cc:488-582): E = K'FK, 4 motions, pick the
    one with dominant cheirality."""
    E = K.T @ F @ K
    U, _, Vt = jnp.linalg.svd(E)
    W = jnp.array([[0., -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)

    def fixdet(R):
        return R * jnp.sign(jnp.linalg.det(R))

    R1 = fixdet(U @ W @ Vt)
    R2 = fixdet(U @ W.T @ Vt)
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    stats = [_triangulate_and_check(R, tt, K, uv1, uv2, inl, sigma2,
                                    min_parallax_deg) for R, tt in cands]
    n_goods = jnp.stack([s[0] for s in stats])
    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    n_total = jnp.sum(inl)
    # accept: clear winner (others < 0.75*best seen >1x), enough points,
    # enough parallax (Initializer.cc:540-575)
    n_second = jnp.sort(n_goods)[-2]
    cosp = jnp.stack([s[1] for s in stats])[best]
    ok = (n_best > jnp.maximum(0.9 * n_total, min_tri)) & \
         (n_second < 0.75 * n_best) & \
         (cosp < jnp.cos(jnp.deg2rad(min_parallax_deg)))
    Rb = jnp.stack([c[0] for c in cands])[best]
    tb = jnp.stack([c[1] for c in cands])[best]
    X = jnp.stack([s[2] for s in stats])[best]
    good = jnp.stack([s[3] for s in stats])[best]
    return ok, lie.se3(Rb, tb), X, good


def _reconstruct_h(H, K, uv1, uv2, inl, sigma2, min_parallax_deg, min_tri):
    """ReconstructH (Initializer.cc:584-750, Faugeras SVD decomposition,
    8 motion candidates)."""
    A = jnp.linalg.inv(K) @ H @ K
    U, S, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = S[0], S[1], S[2]
    # normalized by d2
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) /
                              jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) /
                              jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    st_pos = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) *
                                  (d2 * d2 - d3 * d3), 0.0)) / \
        jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = jnp.sqrt(jnp.maximum((d2 * d2 + d1 * d3) ** 2, 0.0)) / \
        jnp.maximum((d1 + d3) * d2, 1e-12)
    # 8 candidates: eps1, eps3 in {+,-}, d' = +-d2
    cands = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            # d' = +d2 case
            Rp = jnp.array([[ct, 0, -e1 * e3 * st_pos],
                            [0, 1, 0],
                            [e1 * e3 * st_pos, 0, ct]]).T  # careful below
            Rp = jnp.array([[ct, 0.0, -e1 * e3 * st_pos],
                            [0.0, 1.0, 0.0],
                            [e1 * e3 * st_pos, 0.0, ct]])
            tp = (d1 - d3) * jnp.stack([e1 * x1, 0.0, -e3 * x3])
            cands.append((Rp, tp))
            # d' = -d2 case
            sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) *
                                      (d2 * d2 - d3 * d3), 0.0)) / \
                jnp.maximum((d1 - d3) * d2, 1e-12)
            cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
            Rn = jnp.array([[cp, 0.0, e1 * e3 * sp],
                            [0.0, -1.0, 0.0],
                            [e1 * e3 * sp, 0.0, -cp]])
            tn = (d1 + d3) * jnp.stack([e1 * x1, 0.0, e3 * x3])
            cands.append((Rn, tn))

    stats = []
    mats = []
    for R_, t_ in cands:
        R = s * (U @ R_ @ Vt)
        t = U @ t_
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        mats.append((R, t))
        stats.append(_triangulate_and_check(R, t, K, uv1, uv2, inl, sigma2,
                                            min_parallax_deg))
    n_goods = jnp.stack([st[0] for st in stats])
    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    n_second = jnp.sort(n_goods)[-2]
    cosp = jnp.stack([st[1] for st in stats])[best]
    n_total = jnp.sum(inl)
    ok = (n_best > jnp.maximum(0.9 * n_total, min_tri)) & \
         (n_second < 0.75 * n_best) & \
         (cosp < jnp.cos(jnp.deg2rad(min_parallax_deg)))
    Rb = jnp.stack([m[0] for m in mats])[best]
    tb = jnp.stack([m[1] for m in mats])[best]
    X = jnp.stack([st[2] for st in stats])[best]
    good = jnp.stack([st[3] for st in stats])[best]
    return ok, lie.se3(Rb, tb), X, good


# ---------------------------------------------------------------------------
# PnP
# ---------------------------------------------------------------------------

def _pnp_dlt_core(X: jax.Array, uv_n: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted DLT absolute pose from world points X (n,3) and normalized
    image coords uv_n (n,2), weights w (n,).  3D points are Hartley-
    normalized before the solve — without it the f32 12-dim null-space
    extraction is too ill-conditioned to beat even a loose inlier gate."""
    wsum = jnp.maximum(w.sum(), 1e-9)
    c3 = (X * w[:, None]).sum(0) / wsum
    s3 = jnp.maximum(((jnp.linalg.norm(X - c3, axis=1) * w).sum() / wsum), 1e-6)
    Xn = (X - c3) / s3

    x, y, z3 = Xn[:, 0], Xn[:, 1], Xn[:, 2]
    u, v = uv_n[:, 0], uv_n[:, 1]
    zr = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, z3, o, zr, zr, zr, zr, -u * x, -u * y, -u * z3, -u], -1)
    r2 = jnp.stack([zr, zr, zr, zr, x, y, z3, o, -v * x, -v * y, -v * z3, -v], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]])
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    P = Vt[-1].reshape(3, 4)
    # denormalize 3D: X -> (X - c3)/s3
    P = jnp.concatenate([P[:, :3] / s3, (P[:, 3] - P[:, :3] @ c3 / s3)[:, None]], 1)
    # P = lambda [R|t]; force lambda > 0 (det(R_raw) = lambda^3)
    P = P * jnp.sign(jnp.linalg.det(P[:, :3]))
    R_raw = P[:, :3]
    U, S, Vt2 = jnp.linalg.svd(R_raw)
    d = jnp.sign(jnp.linalg.det(U @ Vt2))
    R = U @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0]) + jnp.asarray([0.0, 0.0, 1.0]) * d) @ Vt2
    scale = (2.0 + d) / jnp.maximum(S[0] + S[1] + d * S[2], 1e-12)
    t = P[:, 3] * scale
    return lie.se3(R, t)


def _pnp_dlt(X: jax.Array, uv_n: jax.Array) -> jax.Array:
    """Minimal 6-point DLT pose."""
    return _pnp_dlt_core(X, uv_n, jnp.ones(X.shape[0], X.dtype))


def _pnp_dlt_weighted(X: jax.Array, uv_n: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted DLT-PnP over all rows (overdetermined refit)."""
    return _pnp_dlt_core(X, uv_n, w)


def _pnp_planar_hypotheses(key: jax.Array, X: jax.Array, uv_n: jax.Array,
                           valid: jax.Array, n_hyp: int):
    """Pose hypotheses for (near-)planar point sets via plane-homography
    decomposition.

    The 6-point DLT is rank-degenerate when the sampled world points are
    coplanar — which is the COMMON case for wall-viewing relocalization
    (and why the dual bootstrap's cross-camera PnP returned 0 inliers on
    wall scenes).  Here: fit the dominant plane (weighted PCA), express
    points in plane coordinates (u, v), estimate the 2D->2D homography
    from 4-point samples, and decompose H = [R e1, R e2, R P0 + t] into a
    pose.  Returns [n_hyp, 4, 4] candidate transforms."""
    w = valid.astype(X.dtype)
    wsum = jnp.maximum(w.sum(), 1e-9)
    c = (X * w[:, None]).sum(0) / wsum
    Xc = (X - c) * w[:, None]
    C = Xc.T @ Xc / wsum
    evals, evecs = jnp.linalg.eigh(C)
    e1 = evecs[:, 2]
    e2 = evecs[:, 1]
    pu = (X - c) @ e1
    pv = (X - c) @ e2

    idx = _sample_indices(key, n_hyp, 4, X.shape[0], w)

    def solve(i):
        plane_pts = jnp.stack([pu[i], pv[i]], -1)      # (4,2)
        Hn = _h_from_4pts(plane_pts, uv_n[i])          # plane -> normalized
        a1 = Hn[:, 0]
        a2 = Hn[:, 1]
        lam = 0.5 * (jnp.linalg.norm(a1) + jnp.linalg.norm(a2))
        Hs = Hn / jnp.where(lam > 1e-12, lam, 1e-12)
        r1 = Hs[:, 0]
        r2 = Hs[:, 1]
        # orthonormalize r1, r2 symmetrically
        U, _, Vt = jnp.linalg.svd(jnp.stack([r1, r2], 1))
        R12 = U[:, :2] @ Vt
        r1o = R12[:, 0]
        r2o = R12[:, 1]
        r3 = jnp.cross(r1o, r2o)
        R_pc = jnp.stack([r1o, r2o, r3], 1)            # plane basis -> cam
        # world rotation: columns of R act on plane coords; world->cam
        B = jnp.stack([e1, e2, jnp.cross(e1, e2)], 1)  # world<-plane
        R = R_pc @ B.T
        t = Hs[:, 2] - R @ c
        T = lie.se3(R, t)
        # flip if cheirality majority fails (homography sign ambiguity)
        z = (X @ R.T + t)[:, 2]
        n_front = jnp.sum(jnp.where(w > 0, (z > 0).astype(X.dtype), 0.0))
        flip = n_front < 0.5 * wsum
        Rf = jnp.stack([-r1o, -r2o, jnp.cross(-r1o, -r2o)], 1) @ B.T
        tf = -Hs[:, 2] - Rf @ c
        return jnp.where(flip, lie.se3(Rf, tf), T)

    return jax.vmap(solve)(idx)


def pnp_ransac(key: jax.Array, X: jax.Array, uv: jax.Array, valid: jax.Array,
               K: jax.Array, n_hyp: int = 256, th_px: float = 5.991 ** 0.5,
               refine_rounds: int = 2, min_inliers: int = 12):
    """Batched DLT-PnP RANSAC (replaces PnPsolver::iterate,
    PnPsolver.cc:201-294).  X [N,3] world, uv [N,2] pixels (single camera).
    Minimal 6-point hypotheses pick the consensus set; the winner is then
    refit on all its inliers (`refine_rounds`x), replacing PnPsolver::Refine.
    Returns (T_cw, inliers, n_inliers, success: n_inliers >= min_inliers —
    callers with thin seeds (e.g. wide-yaw cross-camera reloc) may lower
    min_inliers; downstream gates must then carry the burden)."""
    N = X.shape[0]
    Kinv = jnp.linalg.inv(K)
    uv_n = (jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], -1) @ Kinv.T)[:, :2]
    idx = _sample_indices(key, n_hyp, 6, N, valid.astype(jnp.float32))

    def classify(T, th):
        xc = lie.se3_apply(T, X)
        z = jnp.where(jnp.abs(xc[:, 2]) > 1e-9, xc[:, 2], 1e-9)
        u = K[0, 0] * xc[:, 0] / z + K[0, 2]
        v = K[1, 1] * xc[:, 1] / z + K[1, 2]
        err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        inl = valid & (xc[:, 2] > 0) & (err2 < th * th)
        return inl, jnp.sum(inl)

    # LO-RANSAC schedule: minimal hypotheses are noise-amplified, so the
    # consensus search runs at a loose 4x gate; the winner is then refit on
    # its loose inliers and the gate annealed down to th_px.
    th_search = 4.0 * th_px

    def solve(i):
        T = _pnp_dlt(X[i], uv_n[i])
        inl, n = classify(T, th_search)
        return T, inl, n

    Ts, inls, counts = jax.vmap(solve)(idx)
    # planar-degenerate scenes: homography-decomposition hypotheses
    kp = jax.random.fold_in(key, 1)
    Ts_p = _pnp_planar_hypotheses(kp, X, uv_n, valid, n_hyp)
    inls_p, counts_p = jax.vmap(lambda T: classify(T, th_search))(Ts_p)
    Ts = jnp.concatenate([Ts, Ts_p])
    inls = jnp.concatenate([inls, inls_p])
    counts = jnp.concatenate([counts, counts_p])
    best = jnp.argmax(counts)
    T, inl = Ts[best], inls[best]
    # nonlinear refinement on the inlier set (replaces PnPsolver::Refine).
    # Gauss-Newton, not a DLT refit: the linear refit is rank-degenerate on
    # planar point sets.
    ths = [2.0 * th_px] + [th_px] * max(refine_rounds - 1, 1)
    for th in ths:
        T = _pnp_gn_refine(T, X, uv_n, inl.astype(X.dtype))
        inl, _ = classify(T, th)
    n = jnp.sum(inl)
    return T, inl, n, n >= min_inliers


def _pnp_gn_refine(T: jax.Array, X: jax.Array, uv_n: jax.Array,
                   w: jax.Array, iters: int = 8) -> jax.Array:
    """Weighted Gauss-Newton pose refinement in normalized image coords."""
    def body(_, T):
        xc = lie.se3_apply(T, X)
        z = jnp.where(jnp.abs(xc[:, 2]) > 1e-9, xc[:, 2], 1e-9)
        r = jnp.stack([xc[:, 0] / z, xc[:, 1] / z], -1) - uv_n   # [N,2]
        iz = 1.0 / z
        zeros = jnp.zeros_like(iz)
        Jpi = jnp.stack([
            jnp.stack([iz, zeros, -xc[:, 0] * iz * iz], -1),
            jnp.stack([zeros, iz, -xc[:, 1] * iz * iz], -1)], 1)  # [N,2,3]
        Jx = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), (X.shape[0], 3, 3)),
             -jax.vmap(lie.hat)(xc)], -1)                          # [N,3,6]
        J = jnp.einsum('nij,njk->nik', Jpi, Jx)                    # [N,2,6]
        H = jnp.einsum('nri,n,nrj->ij', J, w, J) + 1e-8 * jnp.eye(6)
        b = jnp.einsum('nri,n,nr->i', J, w, r)
        dx = -jnp.linalg.solve(H, b)
        return lie.se3_exp(dx) @ T

    return jax.lax.fori_loop(0, iters, body, T)


# ---------------------------------------------------------------------------
# Horn Sim3
# ---------------------------------------------------------------------------

def horn_sim3(P1: jax.Array, P2: jax.Array, fix_scale: bool = False):
    """Closed-form similarity aligning point sets: finds (R, t, s) minimizing
    ||P1 - (s R P2 + t)|| — Horn's quaternion method as in
    Sim3Solver::ComputeSim3 (Sim3Solver.cc:251-363). P1,P2 [n,3] (n>=3)."""
    c1 = P1.mean(0)
    c2 = P2.mean(0)
    Q1 = P1 - c1
    Q2 = P2 - c2
    M = Q2.T @ Q1   # correlation (note order: rotating P2 into P1)
    # Horn's 4x4 N matrix
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    Nm = jnp.array([
        [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
        [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
        [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
        [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz]])
    w, v = jnp.linalg.eigh(Nm)
    q = v[:, -1]     # max eigenvalue eigenvector = quaternion (w,x,y,z)
    R = lie.quat_to_rot(q)
    s = jnp.where(
        fix_scale, 1.0,
        jnp.sum(Q1 * (Q2 @ R.T)) / jnp.maximum(jnp.sum(Q2 * Q2), 1e-12))
    t = c1 - s * (R @ c2)
    return R, t, s


def sim3_ransac(key: jax.Array, P1: jax.Array, P2: jax.Array,
                valid: jax.Array, uv1: jax.Array, uv2: jax.Array,
                K1: jax.Array, K2: jax.Array, sigma2_1: jax.Array,
                sigma2_2: jax.Array, n_hyp: int = 128,
                fix_scale: bool = False, chi2: float = 9.210):
    """Batched 3-point Sim3 RANSAC (Sim3Solver::iterate, Sim3Solver.cc:
    158-232): candidate (R,t,s) from camera-frame point triples, inliers by
    mutual reprojection chi2 (9.210 sigma^2, Sim3Solver.cc:105-106).

    P1/P2 [N,3] matched points in the two *camera* frames; uv1/uv2 their
    pixel observations.  Returns (R,t,s mapping 2->1, inliers, count, ok)."""
    N = P1.shape[0]
    idx = _sample_indices(key, n_hyp, 3, N, valid.astype(jnp.float32))

    def project(K, X):
        z = jnp.where(jnp.abs(X[:, 2]) > 1e-9, X[:, 2], 1e-9)
        return jnp.stack([K[0, 0] * X[:, 0] / z + K[0, 2],
                          K[1, 1] * X[:, 1] / z + K[1, 2]], -1)

    def solve(i):
        R, t, s = horn_sim3(P1[i], P2[i], fix_scale)
        p2in1 = s * (P2 @ R.T) + t
        e1 = jnp.sum((project(K1, p2in1) - uv1) ** 2, -1)
        Rinv = R.T
        p1in2 = (P1 - t) @ jnp.linalg.inv(s * R).T
        e2 = jnp.sum((project(K2, p1in2) - uv2) ** 2, -1)
        inl = valid & (e1 < chi2 * sigma2_1) & (e2 < chi2 * sigma2_2)
        return R, t, s, inl, jnp.sum(inl)

    Rs, ts, ss, inls, counts = jax.vmap(solve)(idx)
    best = jnp.argmax(counts)
    return (Rs[best], ts[best], ss[best], inls[best], counts[best],
            counts[best] >= 6)
