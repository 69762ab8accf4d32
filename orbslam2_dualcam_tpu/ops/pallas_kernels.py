"""Pallas TPU kernels for the extraction hot path.

SURVEY §7 kernel target #1: the FAST-9/16 corner response is the most
bandwidth-bound dense op in the per-frame path (16 shifted reads + 144
boolean ops per pixel, per pyramid level, per camera), and XLA will not
fuse it with the 3x3 NMS that follows (reduce_window is a fusion
boundary).  fast_nms_pallas computes FAST at both thresholds, the
high-preference blend, AND the NMS in one VMEM pass per tile — each image
byte crosses HBM once instead of three times.  It is the live TPU path
(ops/orb.py wires it in when cfg.pallas_fast and the backend is TPU).
Correctness oracle: tests/test_pallas_fast.py (interpreter mode on CPU).

An earlier single-threshold, non-fused variant (fast_score_pallas)
measured SLOWER than XLA's own fusion of the plain FAST response (1.02ms
vs 0.77ms on v5e at 640x480) and was removed — the win here comes from
crossing the reduce_window boundary, not from hand-writing the
elementwise part."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from orbslam2_dualcam_tpu.ops.orb import FAST_OFFSETS

_TILE_H = 64
_TILE_W = 128
_HALO = 3


# ---------------------------------------------------------------------------
# fused FAST(two thresholds) + blend + 3x3 NMS — one VMEM pass
# ---------------------------------------------------------------------------
#
# SURVEY §7 kernel target: the extraction front half.  ops/orb.py runs
# fast_scores2 (16 shifted views, two thresholds) then nms3x3
# (reduce_window) as separate XLA ops, materializing the dense score maps
# in HBM between them; XLA will not fuse across the reduce_window
# boundary.  This kernel reads each image tile once into VMEM and emits
# only the two maps the keypoint selector actually consumes:
#   s_nms  = nms3x3(where(s_hi > 0, s_hi + 1e4, s_lo))   (orb.py:464-468)
#   sad_lo = ungated thresholded-SAD surface (sub-pixel refinement input)
# Semantics match the XLA path bit-for-bit up to float associativity;
# oracle: tests/test_pallas_fast.py (interpret mode on CPU).

_HALO2 = 4          # 3 (FAST circle) + 1 (NMS neighbourhood)
_NMS_BONUS = 1e4    # high-threshold preference bonus (orb.py:468)


def _fast_nms_kernel(img_ref, s_ref, sad_ref, *, th_hi: float, th_lo: float,
                     h: int, w: int):
    """One (TILE_H, TILE_W) output tile.  Scores are computed on the
    (TILE+2)-haloed region so the 3x3 NMS needs no second pass."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    eh = _TILE_H + 2            # score region incl. 1-px NMS halo
    ew = _TILE_W + 2
    blk = img_ref[pl.ds(i * _TILE_H, eh + 6), pl.ds(j * _TILE_W, ew + 6)]
    center = blk[3:3 + eh, 3:3 + ew]

    diffs = []
    for dx, dy in FAST_OFFSETS:
        sh = blk[3 + int(dy):3 + int(dy) + eh, 3 + int(dx):3 + int(dx) + ew]
        diffs.append(sh - center)

    def arc_mask(flags):
        # bit-parallel cyclic run-of->=9 (ops/orb.py _arc_mask)
        m = jnp.zeros(flags[0].shape, jnp.uint32)
        for k, f in enumerate(flags):
            m = m | (f.astype(jnp.uint32) << k)
        x = m
        for _ in range(8):
            rot = ((x >> 1) | (x << 15)) & jnp.uint32(0xFFFF)
            x = x & rot
        return x > 0

    def score_at(t):
        is_b = arc_mask([d > t for d in diffs])
        is_d = arc_mask([d < -t for d in diffs])
        sb = jnp.zeros_like(center)
        sd = jnp.zeros_like(center)
        for d in diffs:
            sb = sb + jnp.maximum(d - t, 0.0)
            sd = sd + jnp.maximum(-d - t, 0.0)
        return jnp.where(is_b, sb, 0.0) + jnp.where(is_d, sd, 0.0), sb + sd

    s_hi, _ = score_at(th_hi)
    s_lo, sad_lo = score_at(th_lo)
    s = jnp.where(s_hi > 0.0, s_hi + _NMS_BONUS, s_lo)

    # zero scores outside the real image (the zero-padded frame would
    # otherwise fake corners next to the border and suppress real ones)
    rows = (i * _TILE_H - 1 +
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
    cols = (j * _TILE_W - 1 +
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
    inimg = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    s = jnp.where(inimg, s, 0.0)

    # 3x3 NMS on the haloed score, valid on the central TILE region
    m = s[0:_TILE_H, 0:_TILE_W]
    for dy in range(3):
        for dx in range(3):
            m = jnp.maximum(m, s[dy:dy + _TILE_H, dx:dx + _TILE_W])
    c = s[1:1 + _TILE_H, 1:1 + _TILE_W]
    s_ref[:] = jnp.where(c >= m, c, 0.0)
    sad_ref[:] = jnp.where(inimg, sad_lo, 0.0)[1:1 + _TILE_H, 1:1 + _TILE_W]


@functools.partial(jax.jit,
                   static_argnames=("th_hi", "th_lo", "interpret"))
def fast_nms_pallas(img: jax.Array, th_hi: float, th_lo: float,
                    interpret: bool = False):
    """Fused dense FAST-9/16 (both thresholds) + blend + 3x3 NMS.

    img (H, W) float32; returns (s_nms, sad_lo), each (H, W) float32:
    s_nms is nms3x3(where(s_hi>0, s_hi+1e4, s_lo)) exactly as consumed by
    ops.orb.extract_orb's keypoint selector; sad_lo is the dense
    sub-pixel-refinement surface."""
    H, W = img.shape
    gh = pl.cdiv(H, _TILE_H)
    gw = pl.cdiv(W, _TILE_W)
    ph = gh * _TILE_H
    pw = gw * _TILE_W
    imgp = jnp.zeros((ph + 2 * _HALO2, pw + 2 * _HALO2), img.dtype)
    imgp = jax.lax.dynamic_update_slice(imgp, img, (_HALO2, _HALO2))

    s, sad = pl.pallas_call(
        functools.partial(_fast_nms_kernel, th_hi=float(th_hi),
                          th_lo=float(th_lo), h=H, w=W),
        out_shape=(jax.ShapeDtypeStruct((ph, pw), jnp.float32),
                   jax.ShapeDtypeStruct((ph, pw), jnp.float32)),
        grid=(gh, gw),
        in_specs=[pl.BlockSpec((ph + 2 * _HALO2, pw + 2 * _HALO2),
                               lambda i, j: (0, 0))],
        out_specs=(pl.BlockSpec((_TILE_H, _TILE_W), lambda i, j: (i, j)),
                   pl.BlockSpec((_TILE_H, _TILE_W), lambda i, j: (i, j))),
        interpret=interpret,
    )(imgp)
    return s[:H, :W], sad[:H, :W]
