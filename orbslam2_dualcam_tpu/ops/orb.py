"""ORB feature extraction, TPU-native.

Replaces the reference's ORBextractor (src/ORBextractor.cc): an 8-level
image pyramid (x1.2), per-cell FAST-9/16 with high/low thresholds 20/7,
quad-tree keypoint distribution, intensity-centroid orientation, and
Gaussian-blurred 256-bit BRIEF descriptors.

TPU redesign — everything is dense, fixed-shape tensor math:

* The pyramid is built with `jax.image.resize` (bilinear), batched over
  cameras: input ``[ncam, H, W]``.
* FAST corner response is computed for EVERY pixel at once as a dense
  vectorized test over the 16 Bresenham circle offsets (16 shifted views,
  pure VPU work) rather than a scalar per-pixel loop
  (ORBextractor.cc:765-829 uses cv::FAST per 30px cell).
* Keypoint selection replaces the quad-tree (`DistributeOctTree`,
  ORBextractor.cc:539) with an equivalent spatial-uniformity mechanism that
  is shape-static: 3x3 max-pool non-max suppression then per-grid-cell
  top-k via a single global sort with cell-rank penalties.  Both mechanisms
  enforce "strongest corner per neighbourhood, spatially spread budget".
* Orientation = intensity centroid over a radius-15 circular patch
  (IC_Angle, ORBextractor.cc:77), computed as two masked dense correlations.
* BRIEF = 256 pairwise intensity comparisons of the blurred image at
  rotated offsets (computeOrbDescriptor, ORBextractor.cc:103-144), gathered
  per keypoint and packed to ``uint32[8]``.

The sampling pattern is procedurally generated (seeded Gaussian, sigma =
patch/5 — the classic BRIEF construction) instead of copying the learned
256-pair table at ORBextractor.cc:150.  Within-system matching quality is
equivalent; descriptors are simply not bit-compatible with OpenCV's.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.utils.config import OrbConfig

# ---------------------------------------------------------------------------
# static pattern tables
# ---------------------------------------------------------------------------

# FAST-16 Bresenham circle of radius 3 (clockwise from 12 o'clock).
FAST_OFFSETS = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], np.int32)  # (dx, dy)


@functools.lru_cache()
def brief_pattern(seed: int, patch_size: int = 31, n_bits: int = 256) -> np.ndarray:
    """(n_bits, 2, 2) int offsets (pairs of (dx, dy)) — BRIEF-style isotropic
    Gaussian test pattern, clipped to the patch.

    seed < 0 selects the ORB paper's PUBLISHED learned pattern instead
    (ops/orb_pattern.py, the bit_pattern_31_ table of ORBextractor.cc:
    150-406) — use it (OrbConfig.brief_learned) when descriptors must be
    distributed like OpenCV-ORB's, e.g. to quantize against a pretrained
    ORBvoc vocabulary."""
    if seed < 0:
        from orbslam2_dualcam_tpu.ops.orb_pattern import learned_pattern
        return learned_pattern()
    rng = np.random.default_rng(seed)
    half = patch_size // 2
    sigma = patch_size / 5.0
    pts = rng.normal(0.0, sigma, size=(n_bits, 2, 2))
    pts = np.clip(np.round(pts), -half + 2, half - 2).astype(np.int32)
    # avoid degenerate identical pairs
    same = np.all(pts[:, 0] == pts[:, 1], axis=-1)
    pts[same, 1, 0] += 1
    return pts


@functools.lru_cache()
def ic_angle_masks(radius: int = 15):
    """Circular-patch coordinate grids for intensity-centroid orientation.
    Returns numpy constants (never cache traced jnp values: an lru_cache
    would leak tracers across jit scopes)."""
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    mask = (xs * xs + ys * ys) <= radius * radius
    return ((xs * mask).astype(np.float32), (ys * mask).astype(np.float32),
            mask.astype(np.float32))


# ---------------------------------------------------------------------------
# dense per-level FAST response
# ---------------------------------------------------------------------------

def _circle_views(img: jax.Array) -> jax.Array:
    """Stack the 16 circle-shifted copies of img: out[k, y, x] =
    img[y + dy_k, x + dx_k] (zero padding at borders). img: (H, W)."""
    pad = 3
    p = jnp.pad(img, pad)
    H, W = img.shape
    views = [p[pad + int(dy): pad + int(dy) + H, pad + int(dx): pad + int(dx) + W]
             for dx, dy in FAST_OFFSETS]
    return jnp.stack(views)  # (16, H, W)


def _arc_mask(flags16: jax.Array) -> jax.Array:
    """Cyclic run-of->=9 test on a 16-bit ring, bit-parallel per pixel.

    flags16: (16, H, W) bool.  Pack the ring into one int32 lane per pixel,
    then AND with 8 successive cyclic rotations: a bit survives iff it
    starts a run of 9.  24 integer ops replace the 16x9 boolean-AND sweep
    of the naive formulation (2.8x fewer VPU ops for the FAST gate)."""
    shifts = jnp.arange(16, dtype=jnp.uint32)
    m = jnp.sum(flags16.astype(jnp.uint32) << shifts[:, None, None], axis=0)
    x = m
    for _ in range(8):
        rot = ((x >> 1) | (x << 15)) & jnp.uint32(0xFFFF)
        x = x & rot
    return x > 0


def fast_scores2(img: jax.Array, th_hi: float, th_lo: float):
    """Dense FAST-9/16 corner responses at TWO thresholds in one pass.

    A pixel is a corner if >= 9 contiguous circle pixels are all brighter
    than p+t or all darker than p-t.  Score = sum-of-absolute-differences
    over the qualifying arc (the cv::FAST score the quad-tree ranks by).
    The reference runs FAST twice per cell (iniThFAST then minThFAST
    retry, ORBextractor.cc:791); here both thresholds share the circle
    views and differences.  Returns (score_hi, score_lo, sad_lo) (H, W)
    float32 — sad_lo is the UNGATED thresholded-SAD surface (the same
    sb+sd terms without the arc mask): dense and smooth around corners,
    which is what the sub-pixel quadratic fit needs (the arc-gated score
    is zero on most neighbours).  All three come from one set of circle
    views/differences; XLA fuses the extra sum for free."""
    c = _circle_views(img)                       # (16, H, W)
    d = c - img[None]                            # circle minus center

    def score_at(t):
        is_b = _arc_mask(d > t)
        is_d = _arc_mask(d < -t)
        sb = jnp.sum(jnp.maximum(d - t, 0.0), axis=0)
        sd = jnp.sum(jnp.maximum(-d - t, 0.0), axis=0)
        return jnp.where(is_b, sb, 0.0) + jnp.where(is_d, sd, 0.0), sb + sd

    s_hi, _ = score_at(th_hi)
    s_lo, sad_lo = score_at(th_lo)
    return s_hi, s_lo, sad_lo


def fast_score(img: jax.Array, threshold: float) -> jax.Array:
    """Dense FAST-9/16 corner response at one threshold (see fast_scores2)."""
    s, _, _ = fast_scores2(img, threshold, threshold)
    return s


def nms3x3(score: jax.Array) -> jax.Array:
    """Keep only local maxima in 3x3 neighbourhoods."""
    from jax import lax
    m = lax.reduce_window(score, -jnp.inf, lax.max, (3, 3), (1, 1), 'SAME')
    return jnp.where(score >= m, score, 0.0)


# ---------------------------------------------------------------------------
# spatially-uniform top-k selection (quad-tree replacement)
# ---------------------------------------------------------------------------

def select_keypoints(score: jax.Array, n_keep: int, cell: int = 30,
                     border: int = 16) -> tuple[jax.Array, jax.Array]:
    """Pick <= n_keep spatially-distributed maxima from a dense score map.

    Replacement for DistributeOctTree (ORBextractor.cc:539): every grid
    cell's BEST corner gets a large priority bonus, then a single
    `lax.top_k` takes the budget.  Cell winners always beat non-winners
    (the spatial-spread property of the quad tree); remaining slots fill by
    raw score.  One top_k of n_keep over H*W replaces two full sorts
    (a ~30ms-per-frame difference on TPU at 640x480x8 levels).

    Returns (yx int32 [n_keep, 2], score [n_keep]); invalid slots have
    score <= 0."""
    from jax import lax

    H, W = score.shape
    iy = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = ((iy >= border) & (iy < H - border) &
           (ix >= border) & (ix < W - border))
    score = jnp.where(inb, score, 0.0)

    # hierarchical cell-winner bonuses (quad-tree-like): being the best of
    # a coarse cell implies being the best of one's finer sub-cell, so the
    # bonuses stack into strictly ordered priority tiers
    def cell_best(c):
        pad_h = (-H) % c
        pad_w = (-W) % c
        sp = jnp.pad(score, ((0, pad_h), (0, pad_w)), constant_values=-1.0)
        cm = lax.reduce_window(sp, -jnp.inf, lax.max, (c, c), (c, c),
                               'VALID')
        cm = jnp.repeat(jnp.repeat(cm, c, 0), c, 1)[:H, :W]
        return (score >= cm) & (score > 0.0)

    bonus = (4e7 * cell_best(cell) + 2e7 * cell_best(cell // 2) +
             1e7 * cell_best(max(cell // 4, 4)))
    valid = score > 0.0
    key = jnp.where(valid, score + bonus, -jnp.inf)
    vals, top = lax.top_k(key.reshape(-1), n_keep)
    ky = top // W
    kx = top % W
    ksc = score.reshape(-1)[top]
    ksc = jnp.where(vals > -jnp.inf, ksc, 0.0)
    return jnp.stack([ky, kx], axis=-1).astype(jnp.int32), ksc


def subpixel_offsets(score: jax.Array, yx: jax.Array) -> jax.Array:
    """Sub-pixel keypoint refinement: quadratic fit on the corner-response
    surface.  The reference keeps integer FAST positions (OpenCV FAST has
    no subpixel either), which quantizes every reprojection residual by
    +-0.5 px * 1.2^level — a measurable drift floor.  Fitting the 3x3
    response neighbourhood with a 2-D quadratic and stepping to its
    maximum (offset = -H^-1 g, the standard corner interpolation) is a
    pure batched gather + closed-form 2x2 solve: negligible on the MXU
    budget, and it feeds straight into matching/triangulation/BA.

    score: dense response surface (H, W), NON-maximum-suppressed maps are
    unusable (neighbours zeroed).  yx: (N, 2) int.  Returns (N, 2) float
    dy/dx in [-0.6, 0.6]; 0 where the fit is invalid (flat/cliff/saddle).
    """
    p = _gather_patches(score, yx, 1)            # (N, 3, 3)
    return _subpixel_from_patches(p)


def _subpixel_from_patches(p: jax.Array) -> jax.Array:
    """Closed-form 2-D quadratic peak fit on (N, 3, 3) neighbourhoods."""
    gy = 0.5 * (p[:, 2, 1] - p[:, 0, 1])
    gx = 0.5 * (p[:, 1, 2] - p[:, 1, 0])
    hyy = p[:, 2, 1] - 2.0 * p[:, 1, 1] + p[:, 0, 1]
    hxx = p[:, 1, 2] - 2.0 * p[:, 1, 1] + p[:, 1, 0]
    hxy = 0.25 * (p[:, 2, 2] - p[:, 2, 0] - p[:, 0, 2] + p[:, 0, 0])
    det = hxx * hyy - hxy * hxy
    safe = jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
    dy = -(hxx * gy - hxy * gx) / safe
    dx = -(hyy * gx - hxy * gy) / safe
    # valid: a genuine interior maximum (negative-definite Hessian)
    ok = (hxx < 0) & (hyy < 0) & (det > 1e-9)
    off = jnp.stack([dy, dx], axis=-1)
    off = jnp.clip(off, -0.6, 0.6)
    return jnp.where(ok[:, None], off, 0.0)


# ---------------------------------------------------------------------------
# orientation + BRIEF
# ---------------------------------------------------------------------------

def _gather_patches(img: jax.Array, yx: jax.Array, radius: int) -> jax.Array:
    """Gather (2r+1)^2 patches around integer keypoints. img (H, W),
    yx (N, 2) -> (N, 2r+1, 2r+1). Out-of-bounds reads clamp (pad)."""
    p = jnp.pad(img, radius, mode='edge')
    size = 2 * radius + 1
    start = yx  # padded coords of the patch corner = yx - r + r
    def one(s):
        return jax.lax.dynamic_slice(p, (s[0], s[1]), (size, size))
    return jax.vmap(one)(start)


def _patches_onehot(img: jax.Array, yx: jax.Array, radius: int,
                    dtype=jnp.bfloat16) -> jax.Array:
    """Patch extraction on the MXU: (N, 2r+1, 2r+1) patches around integer
    keypoints via two one-hot contractions (row select, then column
    select) instead of a gather.

    XLA lowers the vmapped-dynamic_slice patch gather to a per-keypoint
    serial path on TPU — measured 6.1 ms for the IC-angle/sub-pixel
    gathers plus most of the 4.3 ms BRIEF stage at 2x1300 keypoints
    (examples/extract_profile.py); batching levels into one bigger gather
    made it WORSE (17 ms), so the cost is per-element latency, not op
    count.  The same one-hot-matmul trick that took steered BRIEF from
    44.5 to 28.7 ms/frame applies to the patch fetch itself: row/col
    one-hot matrices built on device turn the fetch into two dense
    contractions the MXU executes at matmul rate (~77 GFLOP bf16 per
    frame for all three patch sets — well under a millisecond of MXU
    time).

    dtype note: one-hot rows have exactly one nonzero, so each output
    element is a COPY of one image value — the only rounding is the
    initial `dtype` cast of the surface.  For u8-derived images in
    [0,255] the default bf16 rounds to +-0.5, which the brief_bf16
    experiment measured as descriptor-neutral.  For NON-integer surfaces
    (e.g. the SAD response fed to the cancellation-sensitive sub-pixel
    quadratic fit, magnitude ~4000 where bf16 ulp is ~8) callers must
    pass dtype=float32 — the copy is then exact (round-4 advisor
    finding).  Edge behavior matches _gather_patches (edge-clamp
    padding)."""
    p = jnp.pad(img, radius, mode='edge').astype(dtype)
    Hp, Wp = p.shape
    P = 2 * radius + 1
    ry = yx[:, 0, None] + jnp.arange(P)            # [N, P] padded row ids
    cx = yx[:, 1, None] + jnp.arange(P)
    R = jax.nn.one_hot(ry, Hp, dtype=dtype)                 # [N, P, Hp]
    C = jax.nn.one_hot(cx, Wp, dtype=dtype)                 # [N, P, Wp]
    rows = jnp.einsum('krh,hw->krw', R, p,
                      preferred_element_type=jnp.float32)
    return jnp.einsum('krw,kcw->krc', rows.astype(dtype), C,
                      preferred_element_type=jnp.float32)


def _ic_from_patches(patches: jax.Array, radius: int) -> jax.Array:
    """Intensity-centroid angle from pre-fetched (N, P, P) patches."""
    xs_np, ys_np, _ = ic_angle_masks(radius)
    xs, ys = jnp.asarray(xs_np), jnp.asarray(ys_np)
    m10 = jnp.sum(patches * xs, axis=(1, 2))
    m01 = jnp.sum(patches * ys, axis=(1, 2))
    return jnp.arctan2(m01, m10)


def ic_angles(img: jax.Array, yx: jax.Array, radius: int = 15) -> jax.Array:
    """Intensity-centroid orientation (IC_Angle, ORBextractor.cc:77) for a
    batch of keypoints; returns angle in radians (N,).

    (A dense-conv variant — moment maps via 31x31 cross-correlation — was
    tried and is 1.5x SLOWER end-to-end on this chip: single-channel 31x31
    convs don't map to the MXU.)"""
    return _ic_from_patches(_gather_patches(img, yx, radius), radius)


@functools.lru_cache()
def _blur_kernel(sigma: float = 2.0, r: int = 3) -> np.ndarray:
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@functools.lru_cache()
def _blur_matrix(n: int, sigma: float = 2.0, r: int = 3) -> np.ndarray:
    """[n, n] banded matrix applying a 1-D Gaussian with edge-clamp
    padding: out = B @ vec.  (Host reference; the jitted path builds the
    same matrix on device — see _blur_matrix_dev.)"""
    k = _blur_kernel(sigma, r)
    B = np.zeros((n, n), np.float32)
    for i in range(n):
        for t, w in zip(range(i - r, i + r + 1), k):
            B[i, min(max(t, 0), n - 1)] += w
    return B


def _blur_matrix_dev(n: int, sigma: float = 2.0, r: int = 3) -> jax.Array:
    """_blur_matrix built ON DEVICE from iotas + the 7-tap kernel.

    Embedding the [n, n] matrices as HLO literals put ~15 MB of dense
    constants into every extraction executable (per level, both axes);
    with the one-hot fold below they ballooned the fused tracking
    executable to 176 MB, which a remote-attached chip must upload on
    every process start (measured 40-420 s through the axon tunnel).
    The optimization_barrier on the kernel keeps XLA's constant folder
    from rebuilding the literal at compile time; constructing the band
    costs 7 masked [n, n] adds at runtime — microseconds, CSE'd once
    per level."""
    kb = jax.lax.optimization_barrier(jnp.asarray(_blur_kernel(sigma, r)))
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    B = jnp.zeros((n, n), jnp.float32)
    for o in range(-r, r + 1):
        t = jnp.clip(rows + o, 0, n - 1)
        B = B + kb[o + r] * (cols == t).astype(jnp.float32)
    return B


@functools.lru_cache()
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear-resize matrix with half-pixel centers and
    antialiasing on downscale (triangle kernel widened by the scale
    factor and weight-normalized — jax.image.resize semantics)."""
    R = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    s = max(scale, 1.0)          # kernel widening for antialias
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        lo = int(np.floor(x - s))
        hi = int(np.ceil(x + s))
        ts = np.arange(lo, hi + 1)
        w = np.maximum(0.0, 1.0 - np.abs(ts - x) / s)
        w = w / w.sum()
        for t, wt in zip(ts, w):
            R[i, min(max(t, 0), n_in - 1)] += wt
    return R


def _resize_matrix_dev(n_in: int, n_out: int) -> jax.Array:
    """_resize_matrix built ON DEVICE (same literal-bloat rationale as
    _blur_matrix_dev; numerics differ from the host build only in f32
    summation order, ~1 ulp).

    The triangle kernel's support is computed on an extended column range
    [-K, n_in+K); out-of-range columns fold into the edge columns exactly
    like the host loop's index clamp."""
    scale = n_in / n_out
    s = max(scale, 1.0)
    K = int(np.ceil(s)) + 2
    ncol = n_in + 2 * K
    # barrier on the scalar parameters so the whole construction stays a
    # runtime computation instead of a folded [n_out, n_in] literal
    sb = jax.lax.optimization_barrier(jnp.float32(s))
    i = jax.lax.broadcasted_iota(jnp.float32, (n_out, ncol), 0)
    t = jax.lax.broadcasted_iota(jnp.float32, (n_out, ncol), 1) - K
    x = (i + 0.5) * scale - 0.5
    w = jnp.maximum(0.0, 1.0 - jnp.abs(t - x) / sb)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    core = w[:, K:K + n_in]
    core = core.at[:, 0].add(jnp.sum(w[:, :K], axis=1))
    return core.at[:, n_in - 1].add(jnp.sum(w[:, K + n_in:], axis=1))


def gaussian_blur7(img: jax.Array, sigma: float = 2.0) -> jax.Array:
    """Separable 7x7 Gaussian blur (reference blurs with 7x7 sigma=2 before
    BRIEF, ORBextractor.cc:1084-1090).

    Ridden on the MXU: each 1-D pass is a banded [n, n] matmul
    (out = B_h @ img @ B_w^T).  H*W*(H+W) MAC at bf16 beats the VPU
    sliding-window form by ~20x on this chip (measured: the blur was the
    single largest extract stage as convolves)."""
    H, W = img.shape
    Bh = _blur_matrix_dev(H, sigma)
    Bw = _blur_matrix_dev(W, sigma)
    out = jnp.dot(Bh, img, preferred_element_type=jnp.float32)
    return jnp.dot(out, Bw.T, preferred_element_type=jnp.float32)


@functools.lru_cache()
def _steered_sampling_indices(seed: int, patch_size: int = 31,
                              n_bits: int = 256, n_bins: int = 30,
                              radius: int = 19) -> np.ndarray:
    """[n_bins, 2*n_bits] int32 flattened-patch indices: row b holds the
    2*n_bits BRIEF sample positions inside a flattened (2r+1)x(2r+1)
    patch under steering angle bin b (the ORB paper's 2*pi/30 pattern
    discretization).  radius=19 covers the rotated reach of offsets
    clipped to +-13.

    Sample order: all first test points, then all second test points —
    column q holds pt0 of bit q and column n_bits+q its pt1."""
    pat = brief_pattern(seed, patch_size)                  # (n_bits, 2, 2)
    size = 2 * radius + 1
    px = np.concatenate([pat[:, 0, 0], pat[:, 1, 0]]).astype(np.float64)
    py = np.concatenate([pat[:, 0, 1], pat[:, 1, 1]]).astype(np.float64)
    idx = np.zeros((n_bins, 2 * n_bits), np.int32)
    for b in range(n_bins):
        a = 2.0 * np.pi * b / n_bins
        ca, sa = np.cos(a), np.sin(a)
        rx = np.clip(np.round(px * ca - py * sa), -radius, radius)
        ry = np.clip(np.round(px * sa + py * ca), -radius, radius)
        idx[b] = ((ry + radius) * size + (rx + radius)).astype(np.int32)
    return idx


def brief_descriptors_matmul(img_blur: jax.Array, yx: jax.Array,
                             angles: jax.Array, seed: int,
                             patch_size: int = 31,
                             bf16: bool = False) -> jax.Array:
    """Steered BRIEF-256 via patch gather + per-bin index lookup.

    The ORB paper discretizes the steering angle to 2*pi/30; each bin's
    rotated sample positions become a small [30, 512] int32 index table.
    The descriptor stage is ONE patch gather (regular dynamic slices)
    plus a take_along_axis of each keypoint's OWN bin's samples —
    replacing per-sample scattered IMAGE gathers (computeOrbDescriptor's
    pattern walk, ORBextractor.cc:103-144) with patch-local gathers.

    The sampling runs as ONE [N, P^2] x [P^2, 30*512] matmul on the MXU
    (all bins computed, each keypoint's own bin selected after): the MXU
    eats the 30x redundant FLOPs far faster than the VPU executes the
    equivalent row-varying take_along_axis gather (measured on v5e:
    matmul path 28.7 ms/frame full pipeline vs 44.5 ms with the gather).
    The one-hot matrix is CONSTRUCTED ON DEVICE from the [30, 512] index
    table rather than embedded as a literal — as literals the per-level
    copies made the fused program 1.5 GB of HLO text, which a
    remote-compile backend must serialize (measured: minutes of compile,
    22x run-to-run variance; on-device construction keeps the program at
    ~31 MB and compile at ~35 s)."""
    patches = _gather_patches(img_blur, yx, 19)            # (N, P, P)
    return _brief_from_patches(patches, angles, seed, patch_size, bf16)


def _brief_from_patches(patches: jax.Array, angles: jax.Array, seed: int,
                        patch_size: int, bf16: bool) -> jax.Array:
    n_bins = 30
    # barrier: without it XLA constant-folds the one_hot of this table
    # into a dense [PP, 30*512] f32 literal (~93 MB) inside the compiled
    # executable — the single largest contributor to the 176 MB fused
    # tracking program a remote-attached chip had to upload per process
    # start.  Materializing S2 at runtime instead costs one 93 MB HBM
    # write per dispatch (~0.1 ms at 819 GB/s).
    idx = jax.lax.optimization_barrier(
        jnp.asarray(_steered_sampling_indices(seed, patch_size)))
    N = patches.shape[0]
    PP = patches.shape[1] * patches.shape[2]
    flat = patches.reshape(N, -1)
    two_pi = 2.0 * jnp.pi
    bins = jnp.round(jnp.mod(angles, two_pi) / two_pi * n_bins).astype(
        jnp.int32) % n_bins
    # [PP, n_bins * 2*n_bits] one-hot sampling matrix, built on device.
    # bf16=True runs the product at the MXU's bf16 rate (~4x the f32
    # rate on v5e): blurred intensities in [0,255] round to +-0.5 in the
    # 8-bit mantissa, a perturbation BRIEF's pairwise comparisons are
    # designed to tolerate (OrbConfig.brief_bf16; roofline follow-up #1)
    mm_dtype = jnp.bfloat16 if bf16 else flat.dtype
    S2 = jax.nn.one_hot(idx, PP, dtype=mm_dtype, axis=0).reshape(PP, -1)
    vals = jnp.dot(flat.astype(mm_dtype), S2,
                   preferred_element_type=jnp.float32)
    vals = vals.reshape(N, n_bins, idx.shape[1])
    v = jnp.take_along_axis(vals, bins[:, None, None], axis=1)[:, 0]
    n_bits = v.shape[-1] // 2
    bits = (v[:, :n_bits] < v[:, n_bits:]).astype(jnp.uint32)
    bits = bits.reshape(N, n_bits // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint32)


def brief_descriptors(img_blur: jax.Array, yx: jax.Array, angles: jax.Array,
                      pattern: jax.Array) -> jax.Array:
    """Rotated BRIEF-256 -> packed uint32[N, 8].

    For each keypoint the 256 test-pair offsets are rotated by the keypoint
    angle (steered BRIEF, computeOrbDescriptor ORBextractor.cc:103-144) and
    compared on the blurred image."""
    n_bits = pattern.shape[0]
    ca, sa = jnp.cos(angles), jnp.sin(angles)      # (N,)
    # pattern: (n_bits, 2, 2) as (dx, dy)
    px = pattern[..., 0].astype(jnp.float32)        # (n_bits, 2)
    py = pattern[..., 1].astype(jnp.float32)
    # rotate: x' = x ca - y sa ; y' = x sa + y ca   (image coords)
    rx = px[None] * ca[:, None, None] - py[None] * sa[:, None, None]
    ry = px[None] * sa[:, None, None] + py[None] * ca[:, None, None]
    sy = jnp.clip(jnp.round(yx[:, 0:1, None] + ry), 0, img_blur.shape[0] - 1).astype(jnp.int32)
    sx = jnp.clip(jnp.round(yx[:, 1:2, None] + rx), 0, img_blur.shape[1] - 1).astype(jnp.int32)
    vals = img_blur[sy, sx]                         # (N, n_bits, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (N, n_bits)
    bits = bits.reshape(bits.shape[0], n_bits // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# full extractor
# ---------------------------------------------------------------------------

class Features(NamedTuple):
    """Fixed-size feature set for one image (or [ncam, ...] for a rig frame).

    Replaces Frame's per-camera keypoint vectors (Frame.h:150-183) with SoA
    tensors; `valid` masks padding slots."""

    uv: jax.Array        # [N, 2] undistorted pixel coords (x, y), level-0 scale
    uv_raw: jax.Array    # [N, 2] distorted/raw pixel coords
    level: jax.Array     # [N] int32 pyramid level
    angle: jax.Array     # [N] float32 radians
    response: jax.Array  # [N] float32 FAST score
    desc: jax.Array      # [N, 8] uint32 packed 256-bit BRIEF
    valid: jax.Array     # [N] bool

    @property
    def n(self) -> int:
        return self.uv.shape[-2]


def _level_budget(n_total: int, n_levels: int, scale: float) -> list[int]:
    """Per-level feature budget, geometric in 1/scale (ORBextractor ctor
    logic, ORBextractor.cc:68-90)."""
    inv = 1.0 / scale
    w = np.array([inv ** i for i in range(n_levels)])
    w = w / w.sum()
    out = np.floor(w * n_total).astype(int)
    out[0] += n_total - out.sum()
    return out.tolist()


def build_pyramid(img: jax.Array, n_levels: int, scale: float) -> list[jax.Array]:
    """List of (Hl, Wl) images. Static shapes derived from level 0.

    Bilinear downscale as two banded matmuls (R_h @ img @ R_w^T) — the
    separable resize rides the MXU instead of the VPU gather path of
    jax.image.resize (numerically identical for factors < 2: the bilinear
    kernel spans two taps)."""
    H, W = img.shape
    pyr = [img]
    for l in range(1, n_levels):
        hp, wp = pyr[-1].shape
        h = int(round(H / scale ** l))
        w = int(round(W / scale ** l))
        Rh = _resize_matrix_dev(hp, h)
        Rw = _resize_matrix_dev(wp, w)
        out = jnp.dot(Rh, pyr[-1], preferred_element_type=jnp.float32)
        pyr.append(jnp.dot(out, Rw.T, preferred_element_type=jnp.float32))
    return pyr


def extract_orb(img: jax.Array, cfg: OrbConfig, n_out: int) -> Features:
    """Extract up to n_out ORB features from one grayscale image (H, W)
    float32 in [0, 255].  Fully jittable; fixed output shape."""
    n_levels = cfg.n_levels
    budgets = _level_budget(n_out, n_levels, cfg.scale_factor)
    pyr = build_pyramid(img, n_levels, cfg.scale_factor)

    brief_seed = -1 if cfg.brief_learned else cfg.brief_seed
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = cfg.pallas_fast and on_tpu
    # MXU one-hot patch fetch on TPU (see _patches_onehot); on CPU the
    # plain gather is faster than materializing the one-hot matrices
    fetch = _patches_onehot if on_tpu else _gather_patches
    ic_radius = (cfg.patch_size - 1) // 2

    # --- per level: dense FAST + NMS + spatial top-k, then the three
    # patch fetches (raw for IC angle, SAD for sub-pixel, blurred for
    # BRIEF) — collected and processed for all levels as one batch
    yxs, lvls, resps = [], [], []
    raw_ps, sad_ps, blur_ps = [], [], []
    for l, (im, budget) in enumerate(zip(pyr, budgets)):
        if budget == 0:
            continue
        if use_pallas:
            # fused FAST(two thresholds)+blend+NMS in one VMEM pass
            # (ops/pallas_kernels.fast_nms_pallas)
            from orbslam2_dualcam_tpu.ops.pallas_kernels import \
                fast_nms_pallas
            s, sad_lo = fast_nms_pallas(im, float(cfg.ini_th_fast),
                                        float(cfg.min_th_fast))
        else:
            s, s_lo, sad_lo = fast_scores2(im, float(cfg.ini_th_fast),
                                           float(cfg.min_th_fast))
            # high-threshold corners preferred; low-threshold fill-in at a
            # large score penalty (the per-cell retry, ORBextractor.cc:791)
            s = nms3x3(jnp.where(s > 0, s + 1e4, s_lo))
        yx, sc = select_keypoints(s, budget, cell=cfg.cell_size,
                                  border=cfg.edge_threshold)
        yxs.append(yx)
        lvls.append(jnp.full((budget,), l, jnp.int32))
        resps.append(jnp.where(sc > 1e4, sc - 1e4, sc))
        raw_ps.append(fetch(im, yx, ic_radius))
        # SAD surface is non-integer with magnitude ~4000 (bf16 ulp ~8
        # there) and feeds a cancellation-sensitive quadratic fit: fetch
        # in f32.  Only N x 9 elements — MXU cost negligible.
        if fetch is _patches_onehot:
            sad_ps.append(_patches_onehot(sad_lo, yx, 1, dtype=jnp.float32))
        else:
            sad_ps.append(fetch(sad_lo, yx, 1))
        blur_ps.append(fetch(gaussian_blur7(im), yx, 19))

    # --- sparse phase over the concatenated keypoint set: the S2 BRIEF
    # sampling matmul runs ONCE per camera over all levels (it reads the
    # ~46 MB sampling matrix from HBM once instead of once per level)
    yx = jnp.concatenate(yxs)                          # [N, 2] level-local
    lvl = jnp.concatenate(lvls)                        # [N] pyramid level
    resp = jnp.concatenate(resps)

    # quadratic sub-pixel refinement on the dense (arc-ungated) SAD
    # surface — the arc-gated score is zero on most neighbours, which
    # starves the fit (measured: 97% of offsets rejected)
    dyx = _subpixel_from_patches(jnp.concatenate(sad_ps))
    ang = _ic_from_patches(jnp.concatenate(raw_ps), ic_radius)
    desc = _brief_from_patches(jnp.concatenate(blur_ps), ang, brief_seed,
                               cfg.patch_size, bf16=cfg.brief_bf16)

    # pixel-center convention of jax.image.resize: x0 = (xl+0.5)*s - 0.5
    # (plain xl*s injects a level-dependent ~0.4px systematic bias).
    # Per-level scales come from a host-computed f64 table (rounded once
    # to f32), not a traced f32 pow — the pow's extra rounding shifted
    # every refined keypoint by ~1e-4 px vs the pre-batching code path
    scales = jnp.asarray(cfg.scale_factors, jnp.float32)[lvl]
    yx_f = yx.astype(jnp.float32) + dyx
    uv = (yx_f[:, ::-1] + 0.5) * scales[:, None] - 0.5
    feats = Features(
        uv=uv, uv_raw=uv, level=lvl, angle=ang, response=resp,
        desc=desc, valid=resp > 0)
    return feats


def extract_orb_rig(images: jax.Array, cfg: OrbConfig, n_out: int) -> Features:
    """Batched over cameras: images [ncam, H, W] -> Features with leading
    ncam axis.  The reference extracts per camera sequentially
    (Frame.cc:141-175); here cameras are a vmap axis."""
    return jax.vmap(lambda im: extract_orb(im, cfg, n_out))(images)
