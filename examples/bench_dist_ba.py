"""Distributed-GBA scaling measurement (VERDICT r3 #6 / BASELINE config[4]).

Measures wall-clock per LM iteration of solve_ba_distributed vs device
count and edge count, for both point layouts (replicated vs sharded), on
the virtual CPU mesh (1/2/4/8 devices) or the real chip (1 device).

The CPU-mesh numbers measure the COLLECTIVE SCHEDULE (how much work is
duplicated / how many reduction bytes move), not ICI bandwidth — but the
scaling SHAPE (does per-iteration time fall with devices, does the
sharded-point layout remove the M-sized reductions) is exactly what
transfers to a pod slice.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/bench_dist_ba.py --cpu
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_problem(rng, n_kf, n_mp, obs_per_mp=6):
    """Synthetic ring-of-keyframes BA problem at a controllable scale."""
    import jax
    import jax.numpy as jnp
    from orbslam2_dualcam_tpu.optim import ba
    from orbslam2_dualcam_tpu.optim.factors import Edges
    from orbslam2_dualcam_tpu.ops import lie

    ang = np.linspace(0, 2 * np.pi, n_kf, endpoint=False)
    centers = np.stack([3 * np.cos(ang), np.zeros(n_kf), 3 * np.sin(ang)],
                       1)
    poses = []
    for c, a in zip(centers, ang):
        R = np.array([[np.cos(a), 0, -np.sin(a)], [0, 1, 0],
                      [np.sin(a), 0, np.cos(a)]])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = -R @ c
        poses.append(T)
    poses = np.asarray(poses, np.float32)
    points = rng.uniform(-4, 4, (n_mp, 3)).astype(np.float32)

    kf_of = (rng.integers(0, n_kf, (n_mp, obs_per_mp))).astype(np.int32)
    mp_of = np.repeat(np.arange(n_mp, dtype=np.int32), obs_per_mp)
    kf_of = kf_of.reshape(-1)
    # project to generate consistent observations
    K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)
    X = points[mp_of]
    T = poses[kf_of]
    xc = np.einsum('eij,ej->ei', T[:, :3, :3], X) + T[:, :3, 3]
    z = np.maximum(xc[:, 2], 0.5)
    uv = xc[:, :2] / z[:, None] * np.array([260.0, 260.0]) + \
        np.array([160.0, 120.0])
    uv += rng.normal(0, 0.5, uv.shape)
    valid = (xc[:, 2] > 0.3)
    E = len(mp_of)
    pad = (-E) % 8
    if pad:
        mp_of = np.concatenate([mp_of, np.zeros(pad, np.int32)])
        kf_of = np.concatenate([kf_of, np.zeros(pad, np.int32)])
        uv = np.concatenate([uv, np.zeros((pad, 2))])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
    edges = Edges(kf=jnp.asarray(kf_of), mp=jnp.asarray(mp_of),
                  cam=jnp.zeros(len(mp_of), jnp.int32),
                  uv=jnp.asarray(uv.astype(np.float32)),
                  inv_sigma2=jnp.ones(len(mp_of), jnp.float32),
                  valid=jnp.asarray(valid))
    # perturb
    dp = rng.normal(0, 0.01, (n_kf, 6)).astype(np.float32)
    dp[:2] = 0
    poses0 = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(jnp.asarray(dp),
                                                       jnp.asarray(poses))
    points0 = jnp.asarray(points + rng.normal(0, 0.03, points.shape)
                          .astype(np.float32))
    return ba.BAProblem(
        poses=poses0, points=points0, edges=edges,
        pose_valid=jnp.ones(n_kf, bool),
        pose_fixed=jnp.zeros(n_kf, bool).at[0].set(True).at[1].set(True),
        point_valid=jnp.ones(n_mp, bool))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--kf", type=int, default=256)
    ap.add_argument("--mp", type=int, default=32768)
    ap.add_argument("--obs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh
    from orbslam2_dualcam_tpu.ops import camera
    from orbslam2_dualcam_tpu.parallel import dist_ba
    from orbslam2_dualcam_tpu.utils.config import dual_default

    rig = camera.make_rig(dual_default())
    devs = jax.devices()
    rng = np.random.default_rng(0)
    prob = make_problem(rng, args.kf, args.mp, args.obs)
    E = int(prob.edges.kf.shape[0])
    print(f"problem: K={args.kf} M={args.mp} E={E} "
          f"devices available={len(devs)}")
    print(f"{'n_dev':>6} {'layout':>10} {'ms/LM-iter':>11} {'speedup':>8}")
    base = {}
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    for n in sizes:
        mesh = Mesh(np.asarray(devs[:n]), ("data",))
        for layout in ("replicated", "sharded"):
            kw = dict(shard_points=(layout == "sharded"))
            if layout == "replicated" and E % n:
                continue

            def run(iters):
                t0 = time.time()
                r = dist_ba.solve_ba_distributed(
                    prob, rig.T_sc, rig.adj_sc, rig.K, mesh,
                    iters=iters, **kw)
                jax.block_until_ready(r.cost)
                return time.time() - t0

            run(1)              # compile
            t1 = run(1)
            t2 = run(1 + args.iters)
            per = (t2 - t1) / args.iters * 1e3
            key = layout
            if n == sizes[0]:
                base[key] = per
            print(f"{n:>6} {layout:>10} {per:>11.2f} "
                  f"{base[key] / per:>7.2f}x")


if __name__ == "__main__":
    main()
