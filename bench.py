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
    from __graft_entry__ import _mk_track_step_args

    fn, args = _mk_track_step_args()
    step = jax.jit(fn)

    # compile
    t0 = time.time()
    out = jax.block_until_ready(step(*args))
    compile_s = time.time() - t0

    # steady state
    n_warm, n_iter = 3, 20
    for _ in range(n_warm):
        out = jax.block_until_ready(step(*args))
    t0 = time.time()
    for _ in range(n_iter):
        out = jax.block_until_ready(step(*args))
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
