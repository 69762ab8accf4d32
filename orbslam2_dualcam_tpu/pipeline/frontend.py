"""Jitted per-frame device programs shared by the pipeline stages.

Groups the fixed-shape JAX computations the Tracker calls every frame, so
each is compiled once per (config, capacity) and reused: extraction,
BoW quantization, motion-model matching, local-map matching + pose opt.

This is the TPU replacement of the per-frame hot path
Tracking::GrabImageDual -> Frame ctor -> Track() (Tracking.cc:236-447):
the control flow stays on host, the math lives here.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.ops import camera, lie, matching, orb
from orbslam2_dualcam_tpu.ops.camera import CameraRig
from orbslam2_dualcam_tpu.optim import pose_opt
from orbslam2_dualcam_tpu.utils.config import BAConfig, SystemConfig
from orbslam2_dualcam_tpu.vocab import bow


class FrameData(NamedTuple):
    """Device-side per-frame data, [ncam, N, ...] fixed shapes."""

    feats: orb.Features
    words: jax.Array      # [ncam, N] vocabulary word ids (or -1)
    nodes: jax.Array      # [ncam, N] direct-index node ids (or -1)


def _extract_frame_body(images: jax.Array, cfg: SystemConfig, n_feats: int,
                        voc: Optional[bow.Vocabulary],
                        rig: CameraRig) -> FrameData:
    """Traced extraction body shared by make_extract_fn and the fused
    per-frame track program (make_track_fn).  Accepts uint8 images (the
    bandwidth-efficient upload format) and converts on device.

    Keypoints are undistorted here, once, exactly as
    Frame::UndistortKeyPoints does per camera (Frame.cc:410-442)."""
    images = images.astype(jnp.float32)
    feats = orb.extract_orb_rig(images, cfg.orb, n_feats)

    def undist(c_feats, K, K_inv, dist):
        uv = camera.undistort_pixels(c_feats.uv, K, K_inv, dist)
        return c_feats._replace(uv=uv, uv_raw=c_feats.uv)

    feats = jax.vmap(undist)(feats, rig.K, rig.K_inv, rig.dist)
    if voc is not None:
        def quant(d, v):
            w, n = bow.quantize(voc, d)
            return (jnp.where(v, w, -1), jnp.where(v, n, -1))
        words, nodes = jax.vmap(quant)(feats.desc, feats.valid)
    else:
        words = jnp.full(feats.desc.shape[:2], -1, jnp.int32)
        nodes = jnp.full(feats.desc.shape[:2], -1, jnp.int32)
    return FrameData(feats=feats, words=words, nodes=nodes)


def host_constants(tree):
    """np-ify the jax.Array leaves of a pytree that a jitted closure will
    capture as constants.

    MLIR lowering embeds closed-over arrays as literals; for a DEVICE
    array that means fetching its value back first
    (mlir._array_mlir_constant_handler -> ArrayImpl._value), and on a
    remote-attached chip each fetch is a transport round trip whose
    latency varies from ms to tens of seconds — measured 40-420 s to
    build the same fused track program run-to-run, entirely inside
    .lower() (round-5 postmortem).  Host numpy constants embed directly;
    tracing semantics are identical."""
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def make_extract_fn(cfg: SystemConfig, n_feats: int,
                    voc: Optional[bow.Vocabulary], rig: CameraRig):
    """Build the jitted per-frame extraction program (closure keeps the
    vocabulary's static tree parameters out of the trace)."""
    voc, rig = host_constants(voc), host_constants(rig)

    @jax.jit
    def extract_frame(images: jax.Array) -> FrameData:
        return _extract_frame_body(images, cfg, n_feats, voc, rig)

    return extract_frame


class FusedTrackOut(NamedTuple):
    """Host-facing result of the fused one-dispatch track program."""

    T_cw: jax.Array        # [4,4] final optimized rig pose
    V_new: jax.Array       # [4,4] updated velocity model T_cw @ T_last^-1
    mp_slots: jax.Array    # [ncam, N] final inlier store slot per kp (-1)
    n_stage1: jax.Array    # stage-1 (motion-model) inlier count
    n_final: jax.Array     # final matched-inlier count
    mp_visible: jax.Array  # [M] store slot frustum-visible in stage 2


def make_track_fn(cfg: SystemConfig, n_feats: int,
                  voc: Optional[bow.Vocabulary], rig: CameraRig):
    """Build the fused ONE-DISPATCH per-frame tracking program.

    The reference's per-frame hot path is GrabImageDual -> extract ->
    TrackWithMotionModel -> TrackLocalMap (Tracking.cc:236-447,1384-1520),
    which the host-stepped path here runs as 3-4 separate device programs
    with a blocking readback between each.  On a remote-attached chip every
    readback pays a full host<->device round trip, so the whole-system
    frame rate is set by dispatch count, not device time.  This program
    fuses the entire frame — extraction (+BoW quantization), stage-1
    motion-model matching with the reference's widened retry
    (Tracking.cc:1407-1414, as a lax.cond), pose optimization, and the
    stage-2 local-map rematch + re-optimization — into one compiled
    XLA program, so a tracked frame costs exactly one dispatch and one
    batched readback.

    Map points come from a device-resident store (tracking.DeviceMapStore);
    prev_slots [ncam, N] are the previous frame's matched store slots (the
    reference's last-frame points, Tracking.cc:1384) — accepted as a
    device array so the deferred pipeline can chain frames without any
    host round trip, which is also why V_new (the velocity model update)
    is computed in-program."""
    body = _make_track_body(cfg, n_feats, host_constants(voc),
                            host_constants(rig))

    @jax.jit
    def track_frame(images: jax.Array, T_last: jax.Array, V: jax.Array,
                    prev_slots: jax.Array, cam_enabled: jax.Array,
                    mp_pos: jax.Array, mp_desc: jax.Array,
                    mp_valid: jax.Array, mp_max: jax.Array,
                    mp_min: jax.Array, mp_norm: jax.Array):
        return body(images, T_last, V, prev_slots, cam_enabled, mp_pos,
                    mp_desc, mp_valid, mp_max, mp_min, mp_norm)

    return track_frame


def make_track_batch_fn(cfg: SystemConfig, n_feats: int,
                        voc: Optional[bow.Vocabulary], rig: CameraRig,
                        depth: int):
    """Depth-D batched variant of make_track_fn: lax.scan the fused
    per-frame body over a [D, ncam, H, W] image stack, chaining pose /
    velocity / matched-slot carries on device.  One dispatch + one
    batched readback per D frames — on a remote-attached chip this
    divides the per-frame round-trip and dispatch overhead by D (the
    driver of whole-system fps once the compute itself is pipelined)."""
    body = _make_track_body(cfg, n_feats, host_constants(voc),
                            host_constants(rig))

    @jax.jit
    def track_batch(images: jax.Array, T_last: jax.Array, V: jax.Array,
                    prev_slots: jax.Array, cam_enabled: jax.Array,
                    mp_pos: jax.Array, mp_desc: jax.Array,
                    mp_valid: jax.Array, mp_max: jax.Array,
                    mp_min: jax.Array, mp_norm: jax.Array):
        def step(carry, img):
            T, Vc, slots = carry
            fd, out = body(img, T, Vc, slots, cam_enabled, mp_pos,
                           mp_desc, mp_valid, mp_max, mp_min, mp_norm)
            return (out.T_cw, out.V_new, out.mp_slots), (fd, out)

        carry, (fds, outs) = jax.lax.scan(step, (T_last, V, prev_slots),
                                          images)
        # final carry returned separately so the host never pays a device
        # round trip slicing the last step out of the stacked outputs
        return carry, fds, outs    # fds/outs: leading axis D on every leaf

    return track_batch


def _make_track_body(cfg: SystemConfig, n_feats: int,
                     voc: Optional[bow.Vocabulary], rig: CameraRig):
    level_scales = np.asarray(cfg.orb.scale_factors, np.float32)
    th_high = jnp.float32(cfg.matcher.th_high)
    th_low = jnp.float32(cfg.matcher.th_low)
    min_motion = int(cfg.tracker.min_matches_motion)
    min_track = int(cfg.tracker.min_matches_track)

    def track_frame(images: jax.Array, T_last: jax.Array, V: jax.Array,
                    prev_slots: jax.Array, cam_enabled: jax.Array,
                    mp_pos: jax.Array, mp_desc: jax.Array,
                    mp_valid: jax.Array, mp_max: jax.Array,
                    mp_min: jax.Array, mp_norm: jax.Array):
        M = mp_pos.shape[0]
        stage1_mask = jnp.zeros(M, bool).at[
            jnp.where(prev_slots >= 0, prev_slots, M).reshape(-1)
        ].set(True, mode='drop')
        fd = _extract_frame_body(images, cfg, n_feats, voc, rig)
        f = fd.feats
        T_pred = V @ T_last

        def stage(T_seed, vmask, radius, ham):
            return match_projection_pose(
                T_seed, f.uv, f.desc, f.level, f.angle, f.valid,
                mp_pos, mp_desc, vmask, mp_max, mp_min, mp_norm,
                rig, radius, level_scales, ham, jnp.float32(0.5),
                cam_enabled, ba=cfg.ba)

        v1 = mp_valid & stage1_mask
        ra = stage(T_pred, v1, jnp.float32(15.0), th_high)

        # widened retry on a thin result, keeping whichever is BETTER
        # (Tracking.cc:1407-1414 and the host path's retry note: a wider
        # window can harvest aliased matches, so it must never clobber an
        # acceptable narrow-window result)
        def wide(_):
            rb = stage(T_pred, v1, jnp.float32(30.0), th_high)
            use_b = rb.n_inliers > ra.n_inliers
            return TrackResult(
                T_cw=jnp.where(use_b, rb.T_cw, ra.T_cw),
                mp_ids=jnp.where(use_b, rb.mp_ids, ra.mp_ids),
                n_inliers=jnp.where(use_b, rb.n_inliers, ra.n_inliers),
                mp_visible=jnp.where(use_b, rb.mp_visible, ra.mp_visible))

        r1 = jax.lax.cond(ra.n_inliers < min_motion, wide, lambda _: ra,
                          None)

        # stage 2: local-map rematch from the optimized pose; narrow
        # window when stage 1 was dense (Tracking.cc:1652-1657)
        r2rad = jnp.where(r1.n_inliers >= 50, 6.0, 10.0).astype(jnp.float32)
        r3 = stage(r1.T_cw, mp_valid, r2rad, th_low)
        ok3 = r3.n_inliers >= min_track
        T_f = jnp.where(ok3, r3.T_cw, r1.T_cw)
        mp_f = jnp.where(ok3, r3.mp_ids, r1.mp_ids)
        # Re-orthonormalize the output rotation (Gram-Schmidt): the
        # device-resident pose chain multiplies f32 matrices every frame
        # with no host float64 round trip to sweep up drift, and the rigid
        # inverse below assumes R in SO(3) — without this projection the
        # off-manifold component compounds ~2.4x per frame through the
        # velocity carry until tracking collapses (measured on the orbit
        # fixture: divergence at ~15 chained frames).
        c0 = T_f[:3, 0] / jnp.linalg.norm(T_f[:3, 0])
        c1 = T_f[:3, 1] - jnp.dot(c0, T_f[:3, 1]) * c0
        c1 = c1 / jnp.linalg.norm(c1)
        c2 = jnp.cross(c0, c1)
        T_f = T_f.at[:3, :3].set(jnp.stack([c0, c1, c2], axis=1))
        # SE3 inverse of T_last for the velocity update (Tracking.cc:1466);
        # T_last is a previous orthonormalized output (or a host seed), so
        # the rigid inverse is exact
        R = T_last[:3, :3]
        Ti = jnp.eye(4).at[:3, :3].set(R.T).at[:3, 3].set(
            -R.T @ T_last[:3, 3])
        return fd, FusedTrackOut(
            T_cw=T_f, V_new=T_f @ Ti, mp_slots=mp_f, n_stage1=r1.n_inliers,
            n_final=jnp.sum(mp_f >= 0), mp_visible=r3.mp_visible)

    return track_frame


class TrackResult(NamedTuple):
    T_cw: jax.Array        # optimized rig pose
    mp_ids: jax.Array      # [ncam, N] matched map-point slot per keypoint (-1)
    n_inliers: jax.Array
    mp_visible: jax.Array  # [M] map-point slot passed the frustum test in any cam


@jax.jit
def project_and_match(T_pred: jax.Array,
                      feats_uv: jax.Array, feats_desc: jax.Array,
                      feats_level: jax.Array, feats_valid: jax.Array,
                      mp_pos: jax.Array, mp_desc: jax.Array,
                      mp_valid: jax.Array, mp_max_dist: jax.Array,
                      mp_min_dist: jax.Array, mp_normal: jax.Array,
                      rig: CameraRig, radius: jax.Array,
                      level_scales: jax.Array, max_hamming: jax.Array,
                      view_cos_th: jax.Array,
                      cam_enabled: jax.Array | None = None) -> jax.Array:
    """Project map points into every camera and match in scaled windows.

    Implements SearchByProjection with frustum gating (Frame::isInFrustum
    Frame.cc:244-312, ORBmatcher.cc:297-414).  Returns mp_of_kp [ncam, N]
    (slot index into the mp arrays, or -1).

    cam_enabled [ncam] masks whole cameras: before the dual map is
    metrically scaled, sibling cameras must not consume map points (their
    extrinsic baseline is in meters while the mono map has arbitrary
    scale — the reference gates this with bMapScaled throughout
    ORBmatcher.cc:128-144)."""
    ncam, N = feats_valid.shape
    M = mp_pos.shape[0]
    if cam_enabled is None:
        cam_enabled = jnp.ones((ncam,), bool)

    cam_ids = jnp.arange(ncam)

    def per_cam(c):
        uv_proj, z = camera.project_rig(rig, c, T_pred, mp_pos)   # [M,2],[M]
        # frustum: positive depth, in image, distance within scale band,
        # viewing angle (Frame.cc:265-297)
        cc = -(rig.T_sc[c] @ T_pred)[:3, :3].T @ (rig.T_sc[c] @ T_pred)[:3, 3]
        d = mp_pos - cc
        dist = jnp.linalg.norm(d, axis=-1)
        in_img = camera.in_image(rig, c, uv_proj)
        viewcos = jnp.sum(d * mp_normal, -1) / jnp.maximum(dist, 1e-9)
        vis = (mp_valid & cam_enabled[c] & (z > 0) & in_img &
               (dist >= 0.8 * mp_min_dist) & (dist <= 1.2 * mp_max_dist) &
               (viewcos > view_cos_th))
        # predicted level from distance (MapPoint::PredictScale,
        # MapPoint.cc:423-455)
        ratio = jnp.maximum(mp_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
        pred_level = jnp.clip(jnp.ceil(jnp.log(ratio) /
                                       jnp.log(level_scales[1])), 0,
                              level_scales.shape[0] - 1).astype(jnp.int32)
        # per-point search radius scaled by predicted level
        r = radius * level_scales[pred_level]
        allow = matching.window_mask(uv_proj, feats_uv[c], r)
        allow &= matching.level_mask(pred_level, feats_level[c], -1, 1)
        res = matching.match_masked(
            mp_desc, feats_desc[c], allow=allow,
            valid_a=vis, valid_b=feats_valid[c],
            max_dist=max_hamming, ratio=0.9)
        return res.idx, res.dist, vis

    idxs, dists, vis = jax.vmap(per_cam)(cam_ids)  # [ncam, M]
    vis_any = jnp.any(vis, axis=0)                 # [M]

    # invert: per-keypoint map point (resolve camera conflicts by distance)
    def invert(c):
        idx = idxs[c]
        kp_assign = jnp.full((N,), -1, jnp.int32)
        kp_dist = jnp.full((N,), 1e9)
        ok = idx >= 0
        safe = jnp.where(ok, idx, 0)
        d = jnp.where(ok, dists[c], 1e9)
        best = jnp.full((N,), 1e9).at[safe].min(d)
        mprange = jnp.arange(M, dtype=jnp.int32)
        first = jnp.full((N,), M, jnp.int32).at[safe].min(
            jnp.where(ok & (d <= best[safe]), mprange, M))
        win = ok & (first[safe] == mprange)
        kp_assign = kp_assign.at[jnp.where(win, safe, N)].set(
            jnp.where(win, mprange, -1), mode='drop')
        return kp_assign

    return jax.vmap(invert)(cam_ids), vis_any      # [ncam, N], [M]


@jax.jit
def project_and_match_batch(T_preds: jax.Array,
                            feats_uv: jax.Array, feats_desc: jax.Array,
                            feats_level: jax.Array, feats_valid: jax.Array,
                            mp_pos: jax.Array, mp_desc: jax.Array,
                            mp_valid: jax.Array, mp_max_dist: jax.Array,
                            mp_min_dist: jax.Array, mp_normal: jax.Array,
                            rig: CameraRig, radius: jax.Array,
                            level_scales: jax.Array, max_hamming: jax.Array,
                            view_cos_th: jax.Array,
                            cam_enabled: jax.Array):
    """project_and_match vmapped over a batch of target keyframes sharing
    one map-point set — the Fuse fan-out of SearchInNeighbors
    (LocalMapping.cc:492-570), which projects the same points into every
    covisible neighbour.  One dispatch replaces one per neighbour (a
    ~10-30x cut in device round-trips per keyframe).

    Leading axis of T_preds/feats_* is the target keyframe; returns
    (mp_of_kp [B, ncam, N], vis_any [B, M])."""

    def one(T, uv, desc, lvl, val):
        return project_and_match(
            T, uv, desc, lvl, val, mp_pos, mp_desc, mp_valid, mp_max_dist,
            mp_min_dist, mp_normal, rig, radius, level_scales, max_hamming,
            view_cos_th, cam_enabled)

    return jax.vmap(one)(T_preds, feats_uv, feats_desc, feats_level,
                         feats_valid)


@functools.partial(jax.jit, static_argnames=("ba",))
def match_projection_pose(T_pred: jax.Array,
                          feats_uv: jax.Array, feats_desc: jax.Array,
                          feats_level: jax.Array, feats_angle: jax.Array,
                          feats_valid: jax.Array,
                          mp_pos: jax.Array, mp_desc: jax.Array,
                          mp_valid: jax.Array, mp_max_dist: jax.Array,
                          mp_min_dist: jax.Array, mp_normal: jax.Array,
                          rig: CameraRig, radius: jax.Array,
                          level_scales: jax.Array,
                          max_hamming: jax.Array,
                          view_cos_th: jax.Array,
                          cam_enabled: jax.Array | None = None,
                          ba: Optional[BAConfig] = None) -> TrackResult:
    """Projection matching + pose optimization — the TrackWithMotionModel /
    TrackLocalMap hot path (Tracking.cc:1384-1520).

    `ba` (static) selects the LM budget; None = BAConfig() defaults."""
    ncam, N = feats_valid.shape
    mp_of_kp, mp_vis = project_and_match(
        T_pred, feats_uv, feats_desc, feats_level, feats_valid,
        mp_pos, mp_desc, mp_valid, mp_max_dist, mp_min_dist, mp_normal,
        rig, radius, level_scales, max_hamming, view_cos_th, cam_enabled)

    cam_ids = jnp.arange(ncam)
    # build pose-opt edge set: one edge per matched keypoint
    matched = mp_of_kp >= 0
    mp_sel = jnp.where(matched, mp_of_kp, 0)
    X = mp_pos[mp_sel]                              # [ncam, N, 3]
    uv = feats_uv
    cam_e = jnp.broadcast_to(cam_ids[:, None], (ncam, N))
    inv_sigma2 = 1.0 / (level_scales[feats_level] ** 2)

    T_opt, inl, n = pose_opt.optimize_pose(
        T_pred, X.reshape(-1, 3), uv.reshape(-1, 2), cam_e.reshape(-1),
        inv_sigma2.reshape(-1), matched.reshape(-1),
        rig.T_sc, rig.adj_sc, rig.K,
        cfg=BAConfig() if ba is None else ba)
    mp_final = jnp.where(inl.reshape(ncam, N), mp_of_kp, -1)
    return TrackResult(T_cw=T_opt, mp_ids=mp_final, n_inliers=n,
                       mp_visible=mp_vis)


@jax.jit
def triangulate_pair(T1: jax.Array, T2: jax.Array, cam: jax.Array,
                     uv1: jax.Array, desc1: jax.Array, level1: jax.Array,
                     free1: jax.Array,
                     uv2: jax.Array, desc2: jax.Array, level2: jax.Array,
                     free2: jax.Array,
                     rig: CameraRig, level_scales: jax.Array,
                     max_hamming: jax.Array):
    """New-map-point triangulation between two keyframes for one camera.

    Implements LocalMapping::CreateNewMapPoints' inner loop
    (LocalMapping.cc:275-490): fundamental matrix from the two rig poses
    through camera `cam`'s extrinsic (ComputeF12, :812-873), epipolar-gated
    descriptor matching (SearchForTriangulation, ORBmatcher.cc:1253-1427),
    DLT triangulation and cheirality/parallax/reprojection checks.

    free1/free2 mask keypoints not yet bound to a map point.
    Returns (idx2_of_1 [N], X_world [N,3], good [N])."""
    from orbslam2_dualcam_tpu.ops import epipolar as epi

    K = rig.K[cam]
    T_sc = rig.T_sc[cam]
    T1c = T_sc @ T1
    T2c = T_sc @ T2
    F12 = epi.fundamental_from_poses(K, T1c, K, T2c)
    # epipole of camera 1 in image 2
    c1 = -T1c[:3, :3].T @ T1c[:3, 3]
    x2 = lie.se3_apply(T2c, c1)
    ez = jnp.where(jnp.abs(x2[2]) > 1e-9, x2[2], 1e-9)
    ep = jnp.stack([K[0, 0] * x2[0] / ez + K[0, 2],
                    K[1, 1] * x2[1] / ez + K[1, 2]])
    sigma2_2 = level_scales[level2] ** 2
    allow = matching.epipolar_mask(F12, uv1, uv2, sigma2_2, ep,
                                   jnp.float32(100.0))
    # epipolar lines admit many repeated-texture candidates: require a
    # mutual best match and a ratio margin to keep association pure (the
    # reference gets the same effect from BoW-node restriction,
    # ORBmatcher.cc:1253-1427)
    res = matching.match_masked(desc1, desc2, allow=allow, valid_a=free1,
                                valid_b=free2, max_dist=max_hamming,
                                ratio=0.8, mutual=True)
    idx = res.idx
    m = idx >= 0
    sel = jnp.where(m, idx, 0)
    P1 = epi.projection_matrix(K, T1c)
    P2 = epi.projection_matrix(K, T2c)
    X = epi.triangulate_dlt(P1, P2, uv1, uv2[sel])
    s1 = level_scales[level1] ** 2
    s2 = sigma2_2[sel]
    good = m & epi.triangulation_checks(
        T1c, T2c, X, K, K, uv1, uv2[sel], s1, s2)
    return idx, X, good


@jax.jit
def triangulate_pairs_batch(T1: jax.Array, T2: jax.Array, cam: jax.Array,
                            uv1: jax.Array, desc1: jax.Array,
                            level1: jax.Array, free1: jax.Array,
                            uv2: jax.Array, desc2: jax.Array,
                            level2: jax.Array, free2: jax.Array,
                            rig: CameraRig, level_scales: jax.Array,
                            max_hamming: jax.Array):
    """triangulate_pair vmapped over (neighbour, camera) pairs — the
    CreateNewMapPoints fan-out (LocalMapping.cc:275-490 iterates the ~10
    covisible neighbours sequentially; here they are one batched device
    program).  All args except rig/level_scales/max_hamming carry a
    leading pair axis (T1 included: the current keyframe repeats)."""

    def one(t1, t2, c, u1, d1, l1, f1, u2, d2, l2, f2):
        return triangulate_pair(t1, t2, c, u1, d1, l1, f1, u2, d2, l2, f2,
                                rig, level_scales, max_hamming)

    return jax.vmap(one)(T1, T2, cam, uv1, desc1, level1, free1,
                         uv2, desc2, level2, free2)


@jax.jit
def match_bow_frame_kf(desc_f: jax.Array, nodes_f: jax.Array,
                       angle_f: jax.Array, valid_f: jax.Array,
                       desc_k: jax.Array, nodes_k: jax.Array,
                       angle_k: jax.Array, valid_k: jax.Array,
                       max_dist: jax.Array, ratio: jax.Array):
    """SearchByBoWCrossCam Frame<->KF (ORBmatcher.cc:162-296): brute-force
    within equal direct-index nodes."""
    allow = matching.node_mask(nodes_f, nodes_k) & (nodes_f >= 0)[:, None]
    return matching.match_masked(
        desc_f, desc_k, allow=allow, valid_a=valid_f, valid_b=valid_k,
        max_dist=max_dist, ratio=ratio, angle_a=angle_f, angle_b=angle_k)


@jax.jit
def match_desc_frame_kf(desc_f: jax.Array, angle_f: jax.Array,
                        valid_f: jax.Array, desc_k: jax.Array,
                        angle_k: jax.Array, valid_k: jax.Array,
                        max_dist: jax.Array, ratio: jax.Array):
    """Windowless descriptor-only Frame<->KF match: the fallback when the
    direct-index node mask of match_bow_frame_kf is too coarse (small
    training vocabularies collapse distinct features into one node's
    competition, or scatter true pairs across nodes).  The reference's
    node restriction (ORBmatcher.cc:162-296 walks aligned FeatureVector
    nodes) is a CPU pruning device, not a correctness gate — on the MXU
    the full NxM Hamming matrix is affordable, so we match unrestricted
    with the strict threshold + Lowe ratio + mutual-best + rotation
    histogram carrying the outlier rejection instead."""
    return matching.match_masked(
        desc_f, desc_k, valid_a=valid_f, valid_b=valid_k,
        max_dist=max_dist, ratio=ratio, angle_a=angle_f, angle_b=angle_k,
        mutual=True)
