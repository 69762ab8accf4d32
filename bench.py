"""Benchmark: per-frame dual-camera tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured program is the per-frame hot path of the reference
(System::TrackDual -> extract ORB x2 cameras -> project/match -> pose
optimization, SURVEY §3.2) at the reference's own operating point:
2 x 640x480 @ 1300 features/camera (Dual-LenaCV.yaml:48-52,71-77).
Baseline = the reference's 30 fps real-time claim on an i7
(README.md:13,22, BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax

    if os.environ.get("SLAM_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax.numpy as jnp

    from orbslam2_dualcam_tpu.ops import camera, orb
    from orbslam2_dualcam_tpu.pipeline import frontend
    from orbslam2_dualcam_tpu.utils.config import dual_default
    from __graft_entry__ import _mk_track_step_args

    cfg = dual_default()
    rig = camera.make_rig(cfg)
    level_scales = jnp.asarray(cfg.orb.scale_factors, jnp.float32)
    _, args = _mk_track_step_args()
    (images, T_pred, mp_pos, mp_desc, mp_valid, mp_max, mp_min,
     mp_norm) = args

    # two jit stages, exactly as the Tracker runs them per frame (one
    # XLA-fused mega-program pessimizes 4x on this chip)
    extract = jax.jit(lambda im: orb.extract_orb_rig(im, cfg.orb, 1300))
    match_pose = jax.jit(frontend.match_projection_pose)

    def step(images):
        feats = extract(images)
        return match_pose(
            T_pred, feats.uv, feats.desc, feats.level, feats.angle,
            feats.valid, mp_pos, mp_desc, mp_valid, mp_max, mp_min,
            mp_norm, rig, jnp.float32(15.0), level_scales,
            jnp.float32(100.0), jnp.float32(0.5), None)

    t0 = time.time()
    out = jax.block_until_ready(step(images))
    compile_s = time.time() - t0

    n_warm, n_iter = 3, 20
    for _ in range(n_warm):
        out = jax.block_until_ready(step(images))
    t0 = time.time()
    for _ in range(n_iter):
        out = jax.block_until_ready(step(images))
    dt = (time.time() - t0) / n_iter

    fps = 1.0 / dt
    result = {
        "metric": "dual_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s (2x640x480, 1300 feats/cam, extract+match+poseopt)",
        "vs_baseline": round(fps / 30.0, 3),
    }
    print(json.dumps(result))
    print(f"# compile {compile_s:.1f}s, steady {dt*1e3:.1f} ms/frame, "
          f"backend={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
