"""Benchmark: per-frame dual-camera tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured program is the per-frame hot path of the reference
(System::TrackDual -> extract ORB x2 cameras -> project/match -> pose
optimization, SURVEY §3.2) at the reference's own operating point:
2 x 640x480 @ 1300 features/camera (Dual-LenaCV.yaml:48-52,71-77), with
the motion-model prediction (Tracking.cc:1384) folded in on-device so the
tracking state (pose, velocity) never leaves the chip between frames.
Baseline = the reference's 30 fps real-time claim on an i7
(README.md:13,22, BASELINE.md).

Timing methodology.  This container reaches its TPU through a remote
tunnel whose completion/readback latency (tens of ms .. seconds) dwarfs
the on-chip step time, and `block_until_ready` does not reliably fence
execution.  Per-frame blocking would therefore measure the tunnel, not
the chip.  Instead we dispatch a dependent CHAIN of N per-frame steps
(each frame's carry feeds the next — exactly the device-resident tracking
loop), force completion with one scalar readback, and difference two
chain lengths so every fixed cost (dispatch, fence, readback) cancels:

    t_frame = (T(N2) - T(N1)) / (N2 - N1)

Chain timing is also the honest deployment number: a TPU-native tracker
keeps pose/velocity/map device-resident and lets the host read results
asynchronously a frame behind (SURVEY §5 concurrency redesign), so
steady-state throughput is set by the chained step time, not by
per-frame host round trips.
"""

import json
import os
import sys
import time

import numpy as np

_T_START = time.time()
# hard wall-clock budget for the WHOLE bench run; the e2e phase is
# truncated (or skipped) to fit inside it so one slow phase can never
# void the headline number again (round-3 postmortem: rc=124, parsed=null)
_DEADLINE_S = float(os.environ.get("SLAM_BENCH_DEADLINE_S", "480"))


def _remaining() -> float:
    return _DEADLINE_S - (time.time() - _T_START)


def main() -> None:
    import jax

    if os.environ.get("SLAM_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    from orbslam2_dualcam_tpu.utils.cache import setup_compile_cache
    setup_compile_cache(os.path.dirname(os.path.abspath(__file__)))

    # the axon TPU tunnel occasionally drops; retry init before giving up
    # so a transient outage doesn't void the benchmark run
    for attempt in range(20):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if attempt == 19:
                raise
            print(f"# backend unavailable (attempt {attempt + 1}): {e}; "
                  f"retrying in 60s", file=sys.stderr)
            time.sleep(60)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax.numpy as jnp

    from orbslam2_dualcam_tpu.ops import camera
    from orbslam2_dualcam_tpu.pipeline import frontend
    from orbslam2_dualcam_tpu.utils.config import dual_default
    from orbslam2_dualcam_tpu.vocab import bow

    cfg = dual_default()
    rig = camera.make_rig(cfg)
    n_feats, H, W = cfg.orb.n_track, 480, 640
    n_mp = cfg.tracker.fused_cap

    rng = np.random.default_rng(0)
    # a 1000-word vocabulary so the BoW quantization stage is in the
    # measured program (content irrelevant for timing; tree shape matches
    # the e2e phase's)
    voc = bow.train_vocabulary(
        rng.integers(0, 2 ** 32, (20000, 8), dtype=np.uint32),
        branching=10, depth=3, seed=1)
    mp_pos = jnp.asarray(rng.uniform(-5, 5, (n_mp, 3)).astype(np.float32))
    mp_desc = jnp.asarray(rng.integers(0, 2 ** 32, (n_mp, 8),
                                       dtype=np.uint32))
    mp_valid = jnp.ones(n_mp, bool)
    mp_max = jnp.full(n_mp, 50.0, jnp.float32)
    mp_min = jnp.zeros(n_mp, jnp.float32)
    mp_norm = jnp.asarray(rng.normal(size=(n_mp, 3)).astype(np.float32))
    mp_norm = mp_norm / jnp.linalg.norm(mp_norm, axis=1, keepdims=True)
    cam_on = jnp.ones(2, bool)

    # THE full per-frame path as ONE program (frontend.make_track_fn):
    # extraction (both cameras) + BoW quantization + stage-1 motion-model
    # matching + widened retry + pose opt + stage-2 local-map rematch +
    # re-opt + velocity update, carries chained on device.  On random
    # content the widened-retry lax.cond branch is ALWAYS taken (no
    # matches), so this times the WORST-case per-frame program.
    track_step = frontend.make_track_fn(cfg, n_feats, voc, rig)

    # a ring of distinct frames, pre-staged on device (a live system
    # overlaps the next frame's upload with the current frame's compute)
    n_ring = 8
    frames = [jnp.asarray(rng.uniform(0, 255, (2, H, W)).astype(np.uint8))
              for _ in range(n_ring)]

    def chain(n):
        T = jnp.eye(4)
        V = jnp.eye(4)
        slots = jnp.full((2, n_feats), -1, jnp.int32)
        acc = jnp.int32(0)
        t0 = time.time()
        for i in range(n):
            _, out = track_step(frames[i % n_ring], T, V, slots, cam_on,
                                mp_pos, mp_desc, mp_valid, mp_max, mp_min,
                                mp_norm)
            T, V, slots = out.T_cw, out.V_new, out.mp_slots
            acc = acc + out.n_final
        forced = float(jnp.sum(T) + acc)   # one readback fences the chain
        return time.time() - t0, forced

    t0 = time.time()
    chain(1)
    compile_s = time.time() - t0
    chain(8)                               # warm
    n1, n2 = 10, 110
    t1, _ = chain(n1)
    t2, _ = chain(n2)
    dt = max((t2 - t1) / (n2 - n1), 1e-6)

    # single dispatch+readback round trip: the per-call cost every
    # host-synchronous step pays through the remote tunnel (locally
    # attached chips pay ~0.1 ms).  The end-to-end System.track number
    # below is ~n_dispatches x this RTT; the chained number above is
    # what the same work costs once state stays device-resident.
    rtts = []
    one = jnp.ones(())
    add = jax.jit(lambda x: x + 1)
    float(add(one))                        # warm
    for _ in range(10):
        t0 = time.time()
        float(add(one))
        rtts.append(time.time() - t0)
    rtt_ms = float(np.median(rtts) * 1e3)

    fps = 1.0 / dt

    result = {
        "metric": "dual_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s (2x640x480, 1300 feats/cam, FULL per-frame "
                "path on device: extract + BoW quantize + motion-model "
                "match + widened retry + pose opt + local-map rematch + "
                "re-opt + velocity, chained-frame timing, worst-case "
                "retry branch taken)",
        "vs_baseline": round(fps / 30.0, 3),
        "dispatch_rtt_ms": round(rtt_ms, 2),
    }
    # the number of record goes out the moment it exists — NOTHING that
    # runs after this line can void it (round-3 lesson)
    print(json.dumps(result), flush=True)
    print(f"# compile {compile_s:.1f}s, steady {dt*1e3:.2f} ms/frame "
          f"(chain {n1}: {t1:.2f}s, chain {n2}: {t2:.2f}s), "
          f"backend={jax.devices()[0].platform}",
          file=sys.stderr, flush=True)

    # ---- end-to-end System.track (live map, KF policy, vocabulary
    # quantization, local mapping amortized) — the whole-system number the
    # reference's 30 fps claim refers to (System.cc:153-180).  Runs AFTER
    # the headline print, inside the remaining wall-clock budget; on
    # success a second, merged JSON line is printed so the last JSON line
    # of the run carries both numbers.
    if os.environ.get("SLAM_BENCH_E2E", "1") == "1" and _remaining() > 60:
        try:
            e2e = bench_end_to_end(cfg)
        except Exception as e:  # never void the headline number
            print(f"# e2e bench failed: {e}", file=sys.stderr, flush=True)
            e2e = None
        if e2e is not None:
            result.update(e2e)
            print(json.dumps(result), flush=True)
    elif _remaining() <= 60:
        print(f"# e2e bench skipped: {_remaining():.0f}s left of "
              f"{_DEADLINE_S:.0f}s budget", file=sys.stderr, flush=True)


def bench_end_to_end(cfg, n_frames: int = 90, warmup: int = 20):
    """Drive System.track on a synthetic dual 640x480 sequence at the
    reference operating point and time the steady-state tail.  Every phase
    checks the remaining wall-clock budget; the frame loop truncates
    rather than run past it."""
    from orbslam2_dualcam_tpu.pipeline.system import System
    from orbslam2_dualcam_tpu.utils import synthetic
    from orbslam2_dualcam_tpu.vocab import bow

    rng = np.random.default_rng(1)
    world = synthetic.make_box_world(rng, n_points=6000, half=6.0)
    poses = synthetic.orbit_trajectory(n_frames, radius=1.5,
                                       total_angle=1.2 * np.pi)
    sys_ = System(cfg, voc=None, enable_loop_closing=False)
    K = np.asarray(sys_.rig.K)
    T_sc = np.asarray(sys_.rig.T_sc)
    # Vocabulary of the e2e tree shape, trained on random descriptors
    # ENTIRELY on host.  Quantization cost in the frame loop depends only
    # on the tree shape, not on what the vocabulary was trained on; the
    # round-4 version trained from rendered frames, whose extract
    # dispatches through the tunnel ate the whole budget before the frame
    # loop ever started (BENCH_r04 "budget exhausted after vocabulary
    # phase").  Tracking itself never consults the vocabulary content
    # (stage 1/2 matching is descriptor-Hamming; BoW drives reloc and
    # loop candidates, both off in this bench).
    voc = bow.train_vocabulary(
        rng.integers(0, 2 ** 32, (20000, 8), dtype=np.uint32),
        branching=8, depth=3, seed=7)
    if _remaining() < 45:
        raise RuntimeError("budget exhausted after vocabulary phase")
    print(f"# e2e: vocab ready, {_remaining():.0f}s left", file=sys.stderr,
          flush=True)
    # deployment configuration for a remote-attached chip: batched
    # deferred tracking (one dispatch + one readback per pipeline_depth
    # frames) and the mapper on its own thread (the reference's
    # LocalMapping thread, System.cc:126)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, tracker=dataclasses.replace(cfg.tracker, images_u8=True))
    sys_ = System(cfg, voc=voc, enable_loop_closing=False,
                  async_mapping=True, deferred_tracking=True)
    frames = [np.clip(np.round(synthetic.render_rig(
        world, K, T_sc, T, H=480, W=640)), 0, 255).astype(np.uint8)
        for T in poses]                               # host-side, untimed

    times = []
    truncated_at = None
    for k, imgs in enumerate(frames):
        t0 = time.time()
        sys_.track(imgs, k / 30.0)
        times.append(time.time() - t0)
        if k in (0, 2, 5, 10, 20, 40):      # compile/steady progress marks
            print(f"# e2e: frame {k} done ({times[-1]:.1f}s), "
                  f"{_remaining():.0f}s left", file=sys.stderr, flush=True)
        # keep ~10s of slack for profile assembly + the merged print;
        # a truncated tail is a smaller sample, not a lost round
        if _remaining() < 10:
            truncated_at = k + 1
            print(f"# e2e truncated at frame {k + 1}/{len(frames)} "
                  f"(budget)", file=sys.stderr, flush=True)
            break
    if len(times) <= warmup + 5:
        warmup = max(0, len(times) - 6)
    tail = np.asarray(times[warmup:])
    # MEAN-based fps: in batched deferred mode most track() calls just
    # buffer (sub-ms) and every pipeline_depth-th call pays the batch,
    # so the median reads near zero while the mean is the true rate
    med = float(tail.mean())
    prof = {k: round(float(np.median(v[warmup // 2:])) * 1e3, 2)
            for k, v in sys_.tracker.timer.samples.items()
            if len(v) > warmup // 2}
    # flush the pipeline only if the budget allows: the mapper thread is a
    # daemon, so skipping the join can never hang process exit, while a
    # long drain here used to eat the merged-print slack (r4 pre-flight)
    shutdown_skipped = _remaining() <= 20
    if not shutdown_skipped:
        sys_.shutdown()
    else:
        print("# e2e shutdown skipped (budget)", file=sys.stderr, flush=True)
    out = {
        "e2e_system_fps": round(1.0 / max(med, 1e-9), 2),
        "e2e_mean_ms": round(med * 1e3, 2),
        "e2e_p90_ms": round(float(np.percentile(tail, 90)) * 1e3, 2),
        "e2e_frames": len(tail),
        "e2e_stage_ms_per_frame": prof,
        "e2e_note": "System.track end-to-end, deployment config: "
                    "deferred batched tracking + async mapping thread, "
                    "u8 frames, live map/KF policy/BoW/local BA included "
                    "(SLAM_BENCH_E2E=0 to skip)",
    }
    # self-describing measurement-coverage flags (round-4 advisor): a
    # truncated frame loop or a skipped drain changes what the medians
    # cover, so the JSON must say so itself, not just stderr
    if truncated_at is not None:
        out["e2e_truncated_at_frame"] = truncated_at
    if shutdown_skipped:
        out["e2e_shutdown_skipped"] = True
    return out


if __name__ == "__main__":
    main()
    # hard exit: both JSON lines are flushed by now, and CPython teardown
    # with the mapper daemon thread still mid-dispatch can segfault in the
    # JAX runtime (measured rc=139 on the CPU smoke run) — the exit code
    # must not smear an otherwise-successful bench
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
