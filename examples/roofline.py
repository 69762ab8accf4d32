"""Roofline / MFU accounting for the per-frame hot path (VERDICT r3 #3).

Measures each stage's device time by chained-dispatch differencing
(tunnel fixed costs cancel) and sets it against its analytic FLOP /
byte counts and the chip's peaks, so "fast" becomes a fraction of
speed-of-light rather than a wall-clock anecdote.

Peaks used (TPU v5e, public numbers): 197 TFLOP/s bf16 matmul,
~49 TFLOP/s f32, 819 GB/s HBM.

Run: python examples/roofline.py          (on the real chip)
     python examples/roofline.py --cpu    (structure check only)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12
PEAK_F32 = 49e12
PEAK_HBM = 819e9


def chain_time(step, carry0, frames, n1=8, n2=48):
    import jax.numpy as jnp

    def run(n):
        c = carry0
        t0 = time.time()
        for i in range(n):
            c = step(c, frames[i % len(frames)])
        jnp.sum(c).block_until_ready()
        return time.time() - t0

    run(2)
    vals = []
    for _ in range(3):
        vals.append((run(n2) - run(n1)) / (n2 - n1))
    return float(np.median(vals))


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from orbslam2_dualcam_tpu.ops import camera, matching, orb
    from orbslam2_dualcam_tpu.ops.orb import gaussian_blur7
    from orbslam2_dualcam_tpu.pipeline import frontend
    from orbslam2_dualcam_tpu.utils.config import dual_default

    cfg = dual_default()
    rig = camera.make_rig(cfg)
    H, W, n_feats, M = 480, 640, 1300, 2048
    ncam, L = 2, cfg.orb.n_levels
    scale = cfg.orb.scale_factor
    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.uniform(0, 255, (ncam, H, W))
                          .astype(np.float32)) for _ in range(4)]

    rows = []

    def add(name, t_s, flops, bytes_):
        rows.append((name, None if t_s is None else t_s * 1e3, flops,
                     bytes_))

    # ---- full fused track step (one frame, incl. 2-stage match+opt)
    track = frontend.make_track_fn(cfg, n_feats, None, rig)
    mp_pos = jnp.asarray(rng.uniform(-5, 5, (M, 3)).astype(np.float32))
    mp_desc = jnp.asarray(rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint32))
    mp_valid = jnp.ones(M, bool)
    mp_max = jnp.full(M, 50.0, jnp.float32)
    mp_min = jnp.zeros(M, jnp.float32)
    mp_nrm = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    mp_nrm = mp_nrm / jnp.linalg.norm(mp_nrm, axis=1, keepdims=True)
    slots = jnp.full((ncam, n_feats), -1, jnp.int32)
    cam_on = jnp.ones(ncam, bool)

    def full_step(c, img):
        fd, out = track(img, jnp.eye(4) * 1.0 + c * 0, jnp.eye(4), slots,
                        cam_on, mp_pos, mp_desc, mp_valid, mp_max, mp_min,
                        mp_nrm)
        return out.T_cw
    t_full = chain_time(full_step, jnp.eye(4), frames)

    # ---- stage times by VARIANT DIFFERENCING of the full program:
    # standalone micro-programs measure pathologically on this backend
    # (an extract-only chain times 50x its in-context cost), so each
    # stage's time = full program minus the program with that stage
    # removed — every measurement is a big, consistently-scheduled
    # program.
    from orbslam2_dualcam_tpu.pipeline.frontend import _extract_frame_body
    from orbslam2_dualcam_tpu.ops import matching as _matching
    from orbslam2_dualcam_tpu.vocab import bow as _bow

    lvl = jnp.asarray(cfg.orb.scale_factors, jnp.float32)

    def _variant(n_match_stages, with_quant):
        import dataclasses
        vcfg = cfg
        voc = None
        if with_quant:
            _rng = np.random.default_rng(1)
            voc = _bow.train_vocabulary(
                _rng.integers(0, 2 ** 32, (20000, 8), dtype=np.uint32),
                branching=10, depth=3, seed=1)

        @jax.jit
        def step(T, img):
            fd = _extract_frame_body(img, vcfg, n_feats, voc, rig)
            f = fd.feats
            acc = (jnp.sum(f.uv) + jnp.sum(f.desc.astype(jnp.float32)) +
                   jnp.sum(fd.words)) * 1e-12
            Tc = T
            for _ in range(n_match_stages):
                r = frontend.match_projection_pose(
                    Tc, f.uv, f.desc, f.level, f.angle, f.valid, mp_pos,
                    mp_desc, mp_valid, mp_max, mp_min, mp_nrm, rig,
                    jnp.float32(15.0), lvl, jnp.float32(100.0),
                    jnp.float32(0.5), cam_on)
                Tc = r.T_cw
            return Tc + acc
        return step

    u8frames = [f.astype(jnp.uint8) for f in frames]
    t_e0 = chain_time(_variant(0, False), jnp.eye(4), u8frames)
    t_eq = chain_time(_variant(0, True), jnp.eye(4), u8frames)
    t_m1 = chain_time(_variant(1, True), jnp.eye(4), u8frames)
    t_m2 = chain_time(_variant(2, True), jnp.eye(4), u8frames)
    t_ex = t_e0

    # analytic: pyramid+blur resize/blur banded matmuls per level/cam
    fl_pyr = 0
    by_pyr = 0
    h, w = H, W
    for l in range(L):
        fl_pyr += 2 * (h * h * w + h * w * w) * ncam     # blur as 2 matmuls
        by_pyr += 5 * h * w * 4 * ncam                   # img r/w passes
        if l + 1 < L:
            h2, w2 = int(round(H / scale ** (l + 1))), \
                int(round(W / scale ** (l + 1)))
            fl_pyr += 2 * (h2 * h * w + h2 * w * w2) * ncam
            h, w = h2, w2

    # FAST: elementwise over all levels — bandwidth
    px = sum(int(round(H / scale ** l)) * int(round(W / scale ** l))
             for l in range(L)) * ncam
    by_fast = px * 4 * 18       # ~16 shifted reads + write + nms

    # BRIEF: [N, P^2] x [P^2, bins*2bits] matmul, f32
    P2 = 39 * 39
    BQ = 30 * 512
    fl_brief = 2 * ncam * n_feats * P2 * BQ
    by_brief = ncam * n_feats * P2 * 4 + P2 * BQ * 4

    fl_ham = 2 * M * n_feats * 256
    by_ham = (M + n_feats) * 256 * 2 + M * n_feats * 4

    add("fused track step (all)", t_full, None, None)
    add("  extract x2 cams (no quant)", t_ex, fl_pyr + fl_brief,
        by_pyr + by_fast)
    add("    pyramid+blur (analytic)", None, fl_pyr, by_pyr)
    add("    FAST+NMS (analytic)", None, 0, by_fast)
    add("    BRIEF (analytic, both cams)", None, fl_brief, by_brief)
    add("  BoW quantize (diff)", t_eq - t_e0, None, None)
    add("  match+poseopt stage 1 (diff)", t_m1 - t_eq,
        2 * fl_ham + 8e6, 2 * by_ham)
    add("  match+poseopt stage 2 (diff)", t_m2 - t_m1,
        2 * fl_ham + 8e6, 2 * by_ham)

    backend = jax.devices()[0].platform
    print(f"backend={backend}; peaks: bf16 {PEAK_BF16/1e12:.0f} TF/s, "
          f"f32 {PEAK_F32/1e12:.0f} TF/s, HBM {PEAK_HBM/1e9:.0f} GB/s")
    print(f"{'stage':<34}{'ms':>8}{'GFLOP':>8}{'TF/s':>7}{'%f32pk':>7}"
          f"{'GB':>7}{'GB/s':>7}{'%HBM':>6}")
    for name, ms, fl, by in rows:
        if ms is None:
            print(f"{name:<34}{'—':>8}{(fl or 0)/1e9:>8.1f}{'':>7}{'':>7}"
                  f"{(by or 0)/1e9:>7.3f}")
            continue
        tf = (fl or 0) / (ms / 1e3) / 1e12 if fl else 0
        pk = tf * 1e12 / PEAK_F32 * 100 if fl else 0
        gbs = (by or 0) / (ms / 1e3) / 1e9 if by else 0
        pb = gbs * 1e9 / PEAK_HBM * 100 if by else 0
        print(f"{name:<34}{ms:>8.2f}{(fl or 0)/1e9:>8.1f}{tf:>7.2f}"
              f"{pk:>7.1f}{(by or 0)/1e9:>7.3f}{gbs:>7.1f}{pb:>6.1f}")


if __name__ == "__main__":
    main()
