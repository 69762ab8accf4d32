"""Per-stage device/transport profile of the fused per-frame track program.

Answers the questions the whole-system frame-rate depends on, on the
CURRENT backend (TPU through the axon tunnel, or CPU):

  1. dispatch RTT       — cost of one blocking scalar readback
  2. upload cost        — device_put of a 2x640x480 frame (f32 vs u8)
  3. fused device time  — chained-dispatch differencing (pure chip time)
  4. sync-mode step     — dispatch + blocking readback every frame
  5. lag-1 pipelined    — dispatch frame k, then read frame k-1
  6. lag-1, batched get — read k-1's outputs as ONE device_get pytree

Run:  python examples/profile_track.py  [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=40)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orbslam2_dualcam_tpu.pipeline import frontend
    from orbslam2_dualcam_tpu.ops import camera
    from orbslam2_dualcam_tpu.utils.config import dual_default

    cfg = dual_default()
    rig = camera.make_rig(cfg)
    n = args.n
    H, W = 480, 640
    M = cfg.tracker.fused_cap
    rng = np.random.default_rng(0)

    # -- 1. dispatch RTT
    one = jnp.ones(())
    add = jax.jit(lambda x: x + 1)
    float(add(one))
    t0 = time.time()
    for _ in range(10):
        float(add(one))
    rtt = (time.time() - t0) / 10
    print(f"1. dispatch RTT:            {rtt*1e3:8.2f} ms")

    # -- 2. upload cost
    img_f32 = rng.uniform(0, 255, (2, H, W)).astype(np.float32)
    img_u8 = img_f32.astype(np.uint8)
    for name, im in (("f32 2.4MB", img_f32), ("u8  0.6MB", img_u8)):
        jax.block_until_ready(jax.device_put(im))
        t0 = time.time()
        for _ in range(10):
            x = jax.device_put(im)
        jax.block_until_ready(x)
        # one blocking sync at the end; per-put cost = (total - rtt)/10
        per = (time.time() - t0 - rtt) / 10
        print(f"2. device_put {name}:     {per*1e3:8.2f} ms/frame")

    # -- build the fused program + a fake store
    track = frontend.make_track_fn(cfg, cfg.orb.n_track, None, rig)
    pos = jnp.asarray(rng.uniform(-5, 5, (M, 3)).astype(np.float32))
    desc = jnp.asarray(rng.integers(0, 2**32, (M, 8), dtype=np.uint32))
    valid = jnp.ones(M, bool)
    dmax = jnp.full(M, 50.0, jnp.float32)
    dmin = jnp.zeros(M, jnp.float32)
    norm = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    mask = jnp.ones(M, bool)
    cam_on = jnp.ones(2, bool)
    T0 = jnp.eye(4)
    V0 = jnp.eye(4)
    frames = [jnp.asarray(rng.uniform(0, 255, (2, H, W)).astype(np.float32))
              for _ in range(4)]

    def step(img, T, V):
        return track(img, T, V, mask, cam_on, pos, desc, valid, dmax,
                     dmin, norm)

    t0 = time.time()
    fd, out = step(frames[0], T0, V0)
    jax.block_until_ready(out.T_cw)
    print(f"   fused compile:           {time.time()-t0:8.1f} s")

    # -- 3. device time via chain differencing
    def chain(k):
        T, V = T0, V0
        acc = jnp.float32(0)
        t0 = time.time()
        for i in range(k):
            fd, out = step(frames[i % 4], T, V)
            T = out.T_cw
            acc = acc + out.n_final
        float(jnp.sum(T) + acc)
        return time.time() - t0
    chain(4)
    t1, t2 = chain(5), chain(5 + n)
    dev = (t2 - t1) / n
    print(f"3. fused device time:       {dev*1e3:8.2f} ms/frame "
          f"({1/dev:.1f} fps)")

    # -- 4. sync mode: upload + dispatch + full readback each frame
    t0 = time.time()
    for i in range(n):
        fd, out = step(jax.device_put(img_f32), T0, V0)
        jax.device_get((fd, out))
    sync = (time.time() - t0) / n
    print(f"4. sync-mode step:          {sync*1e3:8.2f} ms/frame "
          f"({1/sync:.1f} fps)")

    # -- 5/6. lag-1 pipelined: dispatch k, read k-1 (one batched get)
    t0 = time.time()
    pend = None
    T, V = T0, V0
    for i in range(n):
        fd, out = step(jax.device_put(img_f32), T, V)
        T, V = out.T_cw, out.V_new if hasattr(out, "V_new") else V
        if pend is not None:
            jax.device_get(pend)
        pend = (fd, out)
    jax.device_get(pend)
    lag1 = (time.time() - t0) / n
    print(f"5. lag-1 pipelined step:    {lag1*1e3:8.2f} ms/frame "
          f"({1/lag1:.1f} fps)")

    # -- 6. lag-1, outputs only (no feature readback)
    t0 = time.time()
    pend = None
    T, V = T0, V0
    for i in range(n):
        fd, out = step(jax.device_put(img_f32), T, V)
        T = out.T_cw
        if pend is not None:
            jax.device_get(pend)
        pend = out   # track outputs only; features stay on device
    jax.device_get(pend)
    lag1o = (time.time() - t0) / n
    print(f"6. lag-1, outputs only:     {lag1o*1e3:8.2f} ms/frame "
          f"({1/lag1o:.1f} fps)")


if __name__ == "__main__":
    main()
