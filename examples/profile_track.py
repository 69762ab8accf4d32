"""Stage-level profile of the per-frame tracking hot path on the real
chip, using the same chained-dispatch differencing as bench.py (tunnel
fixed costs cancel).  Prints ms/frame for: full step, extract-only,
match+poseopt-only, and the extract sub-stages (pyramid+blur, FAST+NMS,
orientation+BRIEF), so optimization effort lands where the time is.

Usage: python examples/profile_track.py [--cpu]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(step, carry0, frames, n1=10, n2=60):
    """Median-of-3 chained differencing: ms per step."""
    import jax.numpy as jnp

    def run(n):
        c = carry0
        t0 = time.time()
        for i in range(n):
            c = step(c, frames[i % len(frames)])
        jnp.sum(c[0]).block_until_ready() if isinstance(c, tuple) else \
            jnp.sum(c).block_until_ready()
        return time.time() - t0

    run(2)  # warm
    vals = []
    for _ in range(3):
        t1 = run(n1)
        t2 = run(n2)
        vals.append((t2 - t1) / (n2 - n1) * 1e3)
    return float(np.median(vals))


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    from orbslam2_dualcam_tpu.utils.cache import setup_compile_cache
    setup_compile_cache(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax.numpy as jnp

    from orbslam2_dualcam_tpu.ops import camera, orb
    from orbslam2_dualcam_tpu.pipeline import frontend
    from orbslam2_dualcam_tpu.utils.config import dual_default

    cfg = dual_default()
    rig = camera.make_rig(cfg)
    level_scales = jnp.asarray(cfg.orb.scale_factors, jnp.float32)
    n_feats, H, W, n_mp = 1300, 480, 640, 4096

    rng = np.random.default_rng(0)
    mp_pos = jnp.asarray(rng.uniform(-5, 5, (n_mp, 3)).astype(np.float32))
    mp_desc = jnp.asarray(rng.integers(0, 2 ** 32, (n_mp, 8),
                                       dtype=np.uint32))
    mp_valid = jnp.ones(n_mp, bool)
    mp_max = jnp.full(n_mp, 50.0, jnp.float32)
    mp_min = jnp.zeros(n_mp, jnp.float32)
    mp_norm = jnp.asarray(rng.normal(size=(n_mp, 3)).astype(np.float32))
    mp_norm = mp_norm / jnp.linalg.norm(mp_norm, axis=1, keepdims=True)
    frames = [jnp.asarray(rng.uniform(0, 255, (2, H, W)).astype(np.float32))
              for _ in range(8)]

    @jax.jit
    def full_step(T, image):
        feats = orb.extract_orb_rig(image, cfg.orb, n_feats)
        res = frontend.match_projection_pose(
            T, feats.uv, feats.desc, feats.level, feats.angle,
            feats.valid, mp_pos, mp_desc, mp_valid, mp_max, mp_min,
            mp_norm, rig, jnp.float32(15.0), level_scales,
            jnp.float32(100.0), jnp.float32(0.5), None)
        return res.T_cw

    @jax.jit
    def extract_step(carry, image):
        # consume EVERY output (desc included) or XLA dead-code-eliminates
        # the BRIEF matmul and the measurement lies
        feats = orb.extract_orb_rig(image + carry[0, 0], cfg.orb, n_feats)
        s = (jnp.sum(feats.uv) + jnp.sum(feats.desc.astype(jnp.float32)) +
             jnp.sum(feats.angle) + jnp.sum(feats.level))
        return s[None, None] * 1e-9 + carry * 0.0

    # a fixed fake feature set so match timing is extraction-independent
    fuv = jnp.asarray(rng.uniform(0, 480, (2, n_feats, 2)).astype(np.float32))
    fdesc = jnp.asarray(rng.integers(0, 2 ** 32, (2, n_feats, 8),
                                     dtype=np.uint32))
    flev = jnp.zeros((2, n_feats), jnp.int32)
    fang = jnp.zeros((2, n_feats), jnp.float32)
    fval = jnp.ones((2, n_feats), bool)

    @jax.jit
    def match_step(T, image):
        res = frontend.match_projection_pose(
            T + image[0, 0, 0] * 1e-12, fuv, fdesc, flev, fang, fval,
            mp_pos, mp_desc, mp_valid, mp_max, mp_min, mp_norm, rig,
            jnp.float32(15.0), level_scales, jnp.float32(100.0),
            jnp.float32(0.5), None)
        return res.T_cw

    @jax.jit
    def proj_match_step(T, image):
        mp_of_kp, _ = frontend.project_and_match(
            T + image[0, 0, 0] * 1e-12, fuv, fdesc, flev, fval,
            mp_pos, mp_desc, mp_valid, mp_max, mp_min, mp_norm, rig,
            jnp.float32(15.0), level_scales, jnp.float32(100.0),
            jnp.float32(0.5), None)
        return T + jnp.sum(mp_of_kp).astype(jnp.float32) * 1e-12

    # extract sub-stages (single camera 640x480, x2 for the rig)
    from orbslam2_dualcam_tpu.ops.orb import build_pyramid, gaussian_blur7

    @jax.jit
    def pyr_blur_step(carry, image):
        img = image[0] + carry[0, 0]
        pyr = build_pyramid(img, cfg.orb.n_levels, cfg.orb.scale_factor)
        acc = jnp.float32(0)
        for p in pyr:
            acc = acc + jnp.sum(gaussian_blur7(p)) * 1e-12
        return acc[None, None] + carry * 0.0

    T0 = jnp.eye(4)
    c0 = jnp.zeros((1, 1))

    t_full = chain_time(lambda T, f: full_step(T, f), T0, frames)
    t_ext = chain_time(lambda c, f: extract_step(c, f), c0, frames)
    t_match = chain_time(lambda T, f: match_step(T, f), T0, frames)
    t_proj = chain_time(lambda T, f: proj_match_step(T, f), T0, frames)
    t_pyr = chain_time(lambda c, f: pyr_blur_step(c, f), c0, frames)

    print(f"full step        : {t_full:7.2f} ms/frame")
    print(f"extract (2 cams) : {t_ext:7.2f} ms")
    print(f"  pyramid+blur x1: {t_pyr:7.2f} ms (one camera)")
    print(f"match+poseopt    : {t_match:7.2f} ms")
    print(f"  project+match  : {t_proj:7.2f} ms")
    print(f"  (poseopt ~ {t_match - t_proj:.2f} ms)")
    print(f"backend={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
