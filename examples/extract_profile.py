"""Fine-grained roofline of the EXTRACTION stage (roofline follow-up #1').

examples/roofline.py resolves the fused track step into extract /
quantize / match stages; extract (14 ms of the 28.5 ms frame) stayed a
black box after the bf16-BRIEF experiment came back neutral.  This
script splits extract itself by the same variant-differencing method:
successive truncations of extract_orb (pyramid+blur -> +FAST/NMS ->
+select -> +angles/subpixel -> +BRIEF), each a full chained program so
XLA's dead-code elimination removes everything after the cut point and
tunnel fixed costs cancel.

Run: python examples/extract_profile.py        (real chip)
     python examples/extract_profile.py --cpu  (structure check)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


N1 = int(os.environ.get("PROF_N1", "8"))
N2 = int(os.environ.get("PROF_N2", "40"))
REPS = int(os.environ.get("PROF_REPS", "3"))


def chain_time(step, frames, n1=N1, n2=N2):
    import jax.numpy as jnp

    def run(n):
        c = jnp.float32(0.0)
        t0 = time.time()
        for i in range(n):
            c = step(c, frames[i % len(frames)])
        # scalar READBACK, not block_until_ready: the axon remote backend
        # does not reliably fence on block (bench.py docstring)
        float(np.asarray(jnp.sum(c)))
        return time.time() - t0

    run(2)
    vals = []
    for _ in range(REPS):
        vals.append((run(n2) - run(n1)) / (n2 - n1))
    return float(np.median(vals))


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orbslam2_dualcam_tpu.ops import orb
    from orbslam2_dualcam_tpu.utils.config import dual_default

    cfg = dual_default().orb
    H, W, n_feats, ncam = 480, 640, 1300, 2
    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.uniform(0, 255, (ncam, H, W))
                          .astype(np.uint8)) for _ in range(4)]

    use_pallas = cfg.pallas_fast and jax.default_backend() == "tpu"
    budgets = orb._level_budget(n_feats, cfg.n_levels, cfg.scale_factor)

    def extract_upto(img, stop):
        """Truncated extract_orb for one camera; stop in
        {pyr, fast, select, angle, brief}."""
        pyr = orb.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        acc = jnp.float32(0.0)
        brief_seed = -1 if cfg.brief_learned else cfg.brief_seed
        for l, (im, budget) in enumerate(zip(pyr, budgets)):
            if budget == 0:
                continue
            blur = orb.gaussian_blur7(im)
            acc += jnp.sum(blur) * 1e-9
            if stop == "pyr":
                continue
            if use_pallas:
                from orbslam2_dualcam_tpu.ops.pallas_kernels import \
                    fast_nms_pallas
                s, sad_lo = fast_nms_pallas(im, float(cfg.ini_th_fast),
                                            float(cfg.min_th_fast))
            else:
                s, s_lo, sad_lo = orb.fast_scores2(
                    im, float(cfg.ini_th_fast), float(cfg.min_th_fast))
                s = orb.nms3x3(jnp.where(s > 0, s + 1e4, s_lo))
            acc += jnp.sum(s) * 1e-9
            if stop == "fast":
                continue
            yx, sc = orb.select_keypoints(s, budget, cell=cfg.cell_size,
                                          border=cfg.edge_threshold)
            acc += jnp.sum(yx) * 1e-9
            if stop == "select":
                continue
            dyx = orb.subpixel_offsets(sad_lo, yx)
            ang = orb.ic_angles(im, yx, radius=(cfg.patch_size - 1) // 2)
            acc += (jnp.sum(ang) + jnp.sum(dyx)) * 1e-9
            if stop == "angle":
                continue
            d = orb.brief_descriptors_matmul(blur, yx, ang, brief_seed,
                                             cfg.patch_size,
                                             bf16=cfg.brief_bf16)
            acc += jnp.sum(d.astype(jnp.float32)) * 1e-12
        return acc

    # the SHIPPED extractor (cross-level batched sparse phase)
    @jax.jit
    def step_shipped(c, img):
        f = orb.extract_orb_rig(img.astype(jnp.float32), cfg, n_feats)
        return (c * 1e-6 + jnp.sum(f.uv) +
                jnp.sum(f.desc.astype(jnp.float32)) * 1e-12)

    t_ship = chain_time(step_shipped, frames)
    print(f"# extract_orb_rig (shipped) {t_ship*1e3:8.2f} ms", flush=True)

    stops = ["pyr", "fast", "select", "angle", "brief"]
    times = {}
    for stop in stops:
        @jax.jit
        def step(c, img, _stop=stop):
            imgs = img.astype(jnp.float32)
            return c * 1e-6 + jnp.sum(jax.vmap(
                lambda im: extract_upto(im, _stop))(imgs))
        times[stop] = chain_time(step, frames)
        print(f"# upto {stop:<7} {times[stop]*1e3:8.2f} ms", flush=True)

    print(f"\nbackend={jax.devices()[0].platform}  (2 cams, {cfg.n_levels} "
          f"levels, {n_feats} feats)")
    print(f"{'component':<28}{'ms':>8}")
    prev = 0.0
    labels = {"pyr": "pyramid+blur", "fast": "FAST+NMS",
              "select": "select_keypoints (top-k)",
              "angle": "IC angle + subpixel",
              "brief": "BRIEF matmul+pack"}
    for stop in stops:
        print(f"{labels[stop]:<28}{(times[stop]-prev)*1e3:>8.2f}")
        prev = times[stop]
    print(f"{'TOTAL extract':<28}{times['brief']*1e3:>8.2f}")


if __name__ == "__main__":
    main()
