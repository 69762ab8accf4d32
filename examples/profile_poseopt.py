"""Micro-roofline of the motion-only pose optimizer (roofline follow-up #2).

After round 4's one-hot patch fetch cut extraction to ~6 ms, the 20.5 ms
frame is dominated by the three match+pose-opt stages, whose cost the
round-4 roofline attributed to serial small-op LATENCY in the 4x10 LM
fori_loop, not FLOPs.  This script measures, on the real chip with the
chained-differencing method (bench.py docstring):

  - match-only (project_and_match) per stage
  - optimize_pose at the default 4x10 budget
  - optimize_pose at reduced budgets (2x10, 4x5, 2x5)
  - the 6x6 jnp.linalg.solve vs an unrolled Cholesky inside the loop

Run: python examples/profile_poseopt.py        (real chip)
     python examples/profile_poseopt.py --cpu  (structure check)
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N1 = int(os.environ.get("PROF_N1", "8"))
N2 = int(os.environ.get("PROF_N2", "40"))
REPS = int(os.environ.get("PROF_REPS", "3"))


def chain_time(step, seeds, n1=N1, n2=N2):
    import jax.numpy as jnp

    def run(n):
        c = jnp.float32(0.0)
        t0 = time.time()
        for i in range(n):
            c = step(c, seeds[i % len(seeds)])
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

    from orbslam2_dualcam_tpu.ops import camera, lie
    from orbslam2_dualcam_tpu.optim import pose_opt
    from orbslam2_dualcam_tpu.pipeline import frontend
    from orbslam2_dualcam_tpu.utils.config import BAConfig, dual_default

    cfg = dual_default()
    rig = camera.make_rig(cfg)
    ncam, N, M = 2, cfg.orb.n_track, cfg.tracker.fused_cap
    rng = np.random.default_rng(0)

    # realistic edge set: project random world points with a rig pose and
    # perturb; ~half the slots valid (a healthy tracked frame)
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = [0.1, -0.05, 0.2]
    X = rng.uniform(-5, 5, (ncam * N, 3)).astype(np.float32)
    X[:, 2] += 8.0
    cam = np.repeat(np.arange(ncam), N).astype(np.int32)
    K = np.asarray(rig.K)
    uv = np.zeros((ncam * N, 2), np.float32)
    for c in range(ncam):
        s = slice(c * N, (c + 1) * N)
        Tc = np.asarray(rig.T_sc[c]) @ T0
        xc = X[s] @ Tc[:3, :3].T + Tc[:3, 3]
        z = np.maximum(xc[:, 2], 1e-3)
        uv[s, 0] = K[c, 0, 0] * xc[:, 0] / z + K[c, 0, 2]
        uv[s, 1] = K[c, 1, 1] * xc[:, 1] / z + K[c, 1, 2]
    uv += rng.normal(0, 1.0, uv.shape).astype(np.float32)
    valid = (rng.uniform(size=ncam * N) < 0.5)
    inv_s2 = np.ones(ncam * N, np.float32)

    Xj = jnp.asarray(X)
    uvj = jnp.asarray(uv)
    camj = jnp.asarray(cam)
    s2j = jnp.asarray(inv_s2)
    vj = jnp.asarray(valid)
    # distinct pose seeds so the chain isn't value-cached
    seeds = [jnp.asarray(T0 + np.diag([0, 0, 0, 0]).astype(np.float32)
                         + 1e-4 * i * np.eye(4, dtype=np.float32))
             for i in range(4)]

    budgets = [("4x10 (default)", BAConfig()),
               ("2x10", dataclasses.replace(BAConfig(), pose_rounds=2)),
               ("4x5", dataclasses.replace(BAConfig(), pose_iters=5)),
               ("2x5", dataclasses.replace(BAConfig(), pose_rounds=2,
                                           pose_iters=5))]
    print(f"backend={jax.devices()[0].platform}  edges={ncam * N}")
    for name, bc in budgets:
        fn = jax.jit(lambda T, _bc=bc: pose_opt.optimize_pose(
            T, Xj, uvj, camj, s2j, vj, rig.T_sc, rig.adj_sc, rig.K,
            cfg=_bc))

        def step(c, T, _fn=fn):
            T_opt, inl, n = _fn(T + c * 1e-12)
            return jnp.sum(T_opt) + n.astype(jnp.float32) * 1e-6

        t = chain_time(step, seeds)
        # converged-pose error vs ground truth as the accuracy readout
        T_opt, _, n = fn(seeds[0])
        err = float(jnp.linalg.norm(T_opt[:3, 3] - jnp.asarray(T0[:3, 3])))
        print(f"optimize_pose {name:<16} {t*1e3:8.3f} ms   "
              f"|t_err| {err:.5f}  inl {int(n)}")

    # match-only stage (project_and_match without the optimizer)
    mp_pos = jnp.asarray(rng.uniform(-5, 5, (M, 3)).astype(np.float32))
    mp_desc = jnp.asarray(rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint32))
    mp_valid = jnp.ones(M, bool)
    mp_max = jnp.full(M, 50.0, jnp.float32)
    mp_min = jnp.zeros(M, jnp.float32)
    mp_norm = jnp.asarray(
        rng.normal(size=(M, 3)).astype(np.float32))
    mp_norm = mp_norm / jnp.linalg.norm(mp_norm, axis=1, keepdims=True)
    fuv = jnp.asarray(uv.reshape(ncam, N, 2))
    fdesc = jnp.asarray(rng.integers(0, 2 ** 32, (ncam, N, 8),
                                     dtype=np.uint32))
    flvl = jnp.zeros((ncam, N), jnp.int32)
    fval = jnp.ones((ncam, N), bool)
    scales = jnp.asarray(cfg.orb.scale_factors, jnp.float32)

    @jax.jit
    def match_step(T):
        ids, vis = frontend.project_and_match(
            T, fuv, fdesc, flvl, fval, mp_pos, mp_desc, mp_valid,
            mp_max, mp_min, mp_norm, rig, jnp.float32(15.0), scales,
            jnp.float32(50.0), jnp.float32(0.5))
        return jnp.sum(ids) + jnp.sum(vis)

    def mstep(c, T):
        return match_step(T + c * 1e-12).astype(jnp.float32)

    t = chain_time(mstep, seeds)
    print(f"project_and_match (M={M})   {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
