"""Microbenchmark: steered-BRIEF variants on the real chip.

v0 current  : flat[N,PP] @ S2[PP, 30*512] f32, then take_along_axis bin
v1 bf16     : same matmul in bfloat16 (compare flips vs f32 reported)
v2 gather   : idx[bins] then take_along_axis(flat, idx, axis=1) — computes
              only the needed bin, no 30x waste, no [N,30,512] intermediate
v3 onehot   : per-kp one-hot [N,30] folded in: flat' = concat over ... (skip)

Usage: python examples/bench_brief.py [--cpu]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, args, n1=20, n2=120):
    import jax

    def run(n):
        o = None
        t0 = time.time()
        for _ in range(n):
            o = fn(*args)
        jax.block_until_ready(o)
        return time.time() - t0

    run(3)
    vals = []
    for _ in range(3):
        vals.append((run(n2) - run(n1)) / (n2 - n1) * 1e3)
    return float(np.median(vals))


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    from orbslam2_dualcam_tpu.utils.cache import setup_compile_cache
    setup_compile_cache(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax.numpy as jnp

    from orbslam2_dualcam_tpu.ops.orb import _steered_sampling_indices

    N = 1300
    radius = 19
    size = 2 * radius + 1
    PP = size * size
    n_bins, Q = 30, 512
    # integer gather index table: idx[b, q] = flat patch index of sample q
    idx_np = _steered_sampling_indices(0, 31)                # (30, 512)
    idx_all = jnp.asarray(idx_np)
    # one-hot matmul formulation rebuilt from the indices (the historical
    # variant this benchmark compares against; see orb.py history note)
    S3 = np.zeros((n_bins, PP, Q), np.float32)
    for b in range(n_bins):
        S3[b, idx_np[b], np.arange(Q)] = 1.0
    S2 = jnp.asarray(np.transpose(S3, (1, 0, 2)).reshape(PP, n_bins * Q))

    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.uniform(0, 255, (N, PP)).astype(np.float32))
    bins = jnp.asarray(rng.integers(0, n_bins, N, dtype=np.int32))

    @jax.jit
    def v0(flat, bins):
        vals = jnp.dot(flat, S2, preferred_element_type=jnp.float32)
        vals = vals.reshape(N, n_bins, Q)
        v = jnp.take_along_axis(vals, bins[:, None, None], axis=1)[:, 0]
        return (v[:, :256] < v[:, 256:]).astype(jnp.uint32)

    @jax.jit
    def v1(flat, bins):
        vals = jnp.dot(flat.astype(jnp.bfloat16), S2.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        vals = vals.reshape(N, n_bins, Q)
        v = jnp.take_along_axis(vals, bins[:, None, None], axis=1)[:, 0]
        return (v[:, :256] < v[:, 256:]).astype(jnp.uint32)

    @jax.jit
    def v2(flat, bins):
        idx = idx_all[bins]                                  # (N, 512)
        v = jnp.take_along_axis(flat, idx, axis=1)
        return (v[:, :256] < v[:, 256:]).astype(jnp.uint32)

    @jax.jit
    def v3(flat, bins):
        # one-hot bins folded into the einsum: only needed-bin FLOPs on MXU
        # v[n,q] = sum_p flat[n,p] * S3[bins[n],p,q]
        Ssel = jnp.asarray(S3)[bins]                         # (N, PP, Q) gather
        v = jnp.einsum('np,npq->nq', flat, Ssel,
                       preferred_element_type=jnp.float32)
        return (v[:, :256] < v[:, 256:]).astype(jnp.uint32)

    o0 = np.asarray(v0(flat, bins))
    o1 = np.asarray(v1(flat, bins))
    o2 = np.asarray(v2(flat, bins))
    print("bit agreement v1 vs v0:", float((o0 == o1).mean()))
    print("bit agreement v2 vs v0:", float((o0 == o2).mean()))
    t0 = chain_time(v0, (flat, bins))
    t1 = chain_time(v1, (flat, bins))
    t2 = chain_time(v2, (flat, bins))
    print(f"v0 f32 matmul : {t0:7.3f} ms")
    print(f"v1 bf16 matmul: {t1:7.3f} ms")
    print(f"v2 gather     : {t2:7.3f} ms")
    try:
        o3 = np.asarray(v3(flat, bins))
        print("bit agreement v3 vs v0:", float((o0 == o3).mean()))
        t3 = chain_time(v3, (flat, bins))
        print(f"v3 sel-einsum : {t3:7.3f} ms")
    except Exception as e:
        print("v3 failed:", e)
    print("backend:", jax.devices()[0].platform)


if __name__ == "__main__":
    main()
