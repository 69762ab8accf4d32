"""Descriptor matching as dense device linear algebra.

Replaces the reference's ORBmatcher (src/ORBmatcher.cc, 2033 LoC of scalar
Hamming loops over grids / BoW nodes / projection windows) with ONE core
primitive: a masked Hamming-distance matrix computed on the MXU, followed by
top-2 selection, Lowe ratio, absolute threshold, and rotation-consistency
filtering.  Every reference search variant becomes a different *mask* on the
same dense computation:

=============================  =============================================
reference variant              mask
=============================  =============================================
SearchByBoW(CrossCam)          equal vocabulary-node id (ORBmatcher.cc:162)
SearchByProjection (4 forms)   pixel window around projected map point,
                               radius scaled by level (ORBmatcher.cc:297+)
SearchForInitialization        fixed pixel window (ORBmatcher.cc:1117)
SearchForTriangulation         epipolar distance + epipole exclusion
                               (ORBmatcher.cc:1253)
Fuse                           projection window + depth/scale gates
=============================  =============================================

Hamming distance rides the MXU: with bit matrices A (N,256), B (M,256) in
bf16, ``H = popcnt(a xor b) = rowsum(A) + colsum(B) - 2 A B^T`` — one
matmul replaces all scalar popcount loops (ORBmatcher.cc:2015-2031).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

INF = jnp.float32(1e9)


def unpack_bits(desc: jax.Array) -> jax.Array:
    """uint32[..., 8] packed descriptors -> float bits [..., 256] (0/1)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> shifts[None, :]) & jnp.uint32(1)
    return bits.reshape(*desc.shape[:-1], desc.shape[-1] * 32).astype(jnp.bfloat16)


def hamming_matrix(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """Dense Hamming distances [N, M] from packed uint32[?,8] descriptors.

    bf16 matmul (exact: all values are small integers well inside the bf16
    integer range... popcounts <= 256 need 9 bits; bf16 has 8 mantissa bits,
    so accumulate in f32 via preferred_element_type)."""
    A = unpack_bits(desc_a)
    B = unpack_bits(desc_b)
    dots = jnp.dot(A, B.T, preferred_element_type=jnp.float32)
    na = jnp.sum(A.astype(jnp.float32), axis=-1, keepdims=True)
    nb = jnp.sum(B.astype(jnp.float32), axis=-1, keepdims=True)
    return na + nb.T - 2.0 * dots


class MatchResult(NamedTuple):
    """Per-row (query) match into the column (train) set."""

    idx: jax.Array    # [N] int32 best column, -1 if unmatched
    dist: jax.Array   # [N] float32 best Hamming distance (INF if unmatched)

    @property
    def matched(self) -> jax.Array:
        return self.idx >= 0

    def count(self) -> jax.Array:
        return jnp.sum(self.idx >= 0)


def _rotation_consistency(angle_a: jax.Array, angle_b: jax.Array,
                          idx: jax.Array, histo_length: int) -> jax.Array:
    """ORBmatcher::ComputeThreeMaxima (ORBmatcher.cc:1986-2013): bin the
    per-match angle difference into `histo_length` bins, keep matches in the
    3 most-populated bins. Returns keep mask aligned with idx."""
    matched = idx >= 0
    d = angle_a - angle_b[jnp.clip(idx, 0, None)]
    two_pi = 2.0 * jnp.pi
    d = jnp.mod(d, two_pi)
    bins = jnp.clip((d * histo_length / two_pi).astype(jnp.int32), 0,
                    histo_length - 1)
    counts = jnp.zeros((histo_length,), jnp.int32).at[bins].add(
        matched.astype(jnp.int32))
    top3 = jnp.sort(counts)[-3:]
    v1, v2, v3 = top3[2], top3[1], top3[0]
    # drop 2nd/3rd maxima below 0.1*max (ORBmatcher.cc:2002-2010)
    min_keep = jnp.where(v3 >= 0.1 * v1, v3,
                         jnp.where(v2 >= 0.1 * v1, v2, v1))
    keep_bin = counts >= jnp.maximum(min_keep, 1)
    return matched & keep_bin[bins]


def match_masked(desc_a: jax.Array, desc_b: jax.Array,
                 allow: Optional[jax.Array] = None,
                 valid_a: Optional[jax.Array] = None,
                 valid_b: Optional[jax.Array] = None,
                 max_dist: float = 50.0,
                 ratio: float = 1.0,
                 angle_a: Optional[jax.Array] = None,
                 angle_b: Optional[jax.Array] = None,
                 histo_length: int = 30,
                 mutual: bool = False,
                 dist_matrix: Optional[jax.Array] = None) -> MatchResult:
    """The universal matcher: masked Hamming top-2 with ratio / threshold /
    rotation tests.

    allow: optional bool [N, M] — which pairs may match (the variant mask).
    ratio: Lowe ratio on best vs second-best *within the allowed set*
      (mfNNratio, ORBmatcher.cc:52).
    mutual: additionally require a to be b's best (used by
      SearchForInitialization's bidirectional check, ORBmatcher.cc:1117+).
    dist_matrix: precomputed hamming_matrix(desc_a, desc_b) to share across
      several variant calls on the same frame pair.
    """
    D = hamming_matrix(desc_a, desc_b) if dist_matrix is None else dist_matrix
    mask = jnp.ones(D.shape, bool)
    if allow is not None:
        mask &= allow
    if valid_a is not None:
        mask &= valid_a[:, None]
    if valid_b is not None:
        mask &= valid_b[None, :]
    Dm = jnp.where(mask, D, INF)

    # top-2 along columns in one fused pass (a scatter + second argmin
    # costs ~30ms on TPU for 4096x1300; top_k is ~100x cheaper)
    if Dm.shape[1] >= 2:
        neg2, idx2 = jax.lax.top_k(-Dm, 2)
        best = idx2[:, 0]
        d1 = -neg2[:, 0]
        d2 = -neg2[:, 1]
    else:
        best = jnp.zeros(Dm.shape[0], jnp.int32)
        d1 = Dm[:, 0]
        d2 = jnp.full_like(d1, INF)

    ok = d1 <= max_dist
    # branchless so `ratio` may be a traced scalar; ratio >= 1 disables
    ratio = jnp.asarray(ratio, jnp.float32)
    ok &= (ratio >= 1.0) | (d1 < ratio * d2)
    if mutual:
        col_best = jnp.argmin(Dm, axis=0)
        ok &= col_best[best] == jnp.arange(D.shape[0])
    idx = jnp.where(ok, best, -1)

    if angle_a is not None and angle_b is not None:
        keep = _rotation_consistency(angle_a, angle_b, idx, histo_length)
        idx = jnp.where(keep, idx, -1)

    # resolve duplicate column assignments: keep the lowest-distance row
    # (the reference erases the previous match when a better one arrives,
    # e.g. ORBmatcher.cc:672-688)
    idx = _dedup_columns(idx, d1, D.shape[1])
    return MatchResult(idx=idx, dist=jnp.where(idx >= 0, d1, INF))


def _dedup_columns(idx: jax.Array, dist: jax.Array, m: int) -> jax.Array:
    """Keep only the best row per claimed column (scatter-min)."""
    matched = idx >= 0
    safe = jnp.where(matched, idx, m)  # park invalids in a scratch column
    best_per_col = jnp.full((m + 1,), INF).at[safe].min(
        jnp.where(matched, dist, INF))
    # tie-break equal distances by row order: first row with min dist wins
    n = idx.shape[0]
    rows = jnp.arange(n)
    is_best = matched & (dist <= best_per_col[safe])
    first_row = jnp.full((m + 1,), n, jnp.int32).at[safe].min(
        jnp.where(is_best, rows, n))
    win = is_best & (first_row[safe] == rows)
    return jnp.where(win, idx, -1)


# ---------------------------------------------------------------------------
# variant masks
# ---------------------------------------------------------------------------

def window_mask(uv_a: jax.Array, uv_b: jax.Array, radius) -> jax.Array:
    """[N, M] pairs within a Chebyshev pixel window (GetFeaturesInArea
    semantics, Frame.cc:316-376). radius may be scalar or per-row [N]."""
    d = jnp.abs(uv_a[:, None, :] - uv_b[None, :, :])
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    return (d[..., 0] <= r) & (d[..., 1] <= r)


def node_mask(nodes_a: jax.Array, nodes_b: jax.Array) -> jax.Array:
    """[N, M] same-vocabulary-node pairs (FeatureVector alignment,
    ORBmatcher.cc:181-276)."""
    return nodes_a[:, None] == nodes_b[None, :]


def level_mask(level_a: jax.Array, level_b: jax.Array,
               lo: int = -1, hi: int = 1) -> jax.Array:
    """Pyramid-level agreement window (SearchByProjection checks the
    predicted octave +-1, ORBmatcher.cc:345-350)."""
    d = level_b[None, :] - level_a[:, None]
    return (d >= lo) & (d <= hi)


def epipolar_mask(F12: jax.Array, uv1: jax.Array, uv2: jax.Array,
                  sigma2_2: jax.Array, epipole1_in_2: jax.Array,
                  min_epipole_dist2: jax.Array, chi2: float = 3.84) -> jax.Array:
    """SearchForTriangulation gate (ORBmatcher.cc:1253-1427): candidate in
    image 2 must lie near the epipolar line of uv1 and away from the
    epipole."""
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], axis=-1)
    line = x1 @ F12                                   # [N, 3]
    num = (line[:, None, 0] * uv2[None, :, 0] +
           line[:, None, 1] * uv2[None, :, 1] + line[:, None, 2:3].squeeze(-1))
    den = line[:, 0] ** 2 + line[:, 1] ** 2
    d2 = num * num / jnp.where(den > 1e-12, den, 1e-12)[:, None]
    near_line = d2 < chi2 * sigma2_2[None, :]
    far_from_epipole = jnp.sum((uv2 - epipole1_in_2) ** 2, -1) > min_epipole_dist2
    return near_line & far_from_epipole[None, :]
