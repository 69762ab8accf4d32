"""Local mapping: point creation, fusion, local BA, culling.

TPU re-design of src/LocalMapping.cc (1075 LoC).  The reference runs this
as a separate thread consuming a keyframe queue; here it is a service the
tracker calls per keyframe (synchronous by default for determinism — an
async wrapper lives in pipeline/system.py).  The per-KF numeric work
(epipolar triangulation, fuse matching, local BA) runs as jitted programs.

Pipeline per keyframe (LocalMapping::Run, :65-135):
  ProcessNewKeyFrame -> MapPointCulling -> CreateNewMapPoints ->
  SearchInNeighbors (fuse) -> LocalBundleAdjustment -> KeyFrameCulling.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set

import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.models.map import (KeyFrame, Map, MapPoint,
                                             update_point_stats)
from orbslam2_dualcam_tpu.ops.camera import CameraRig
from orbslam2_dualcam_tpu.optim import ba
from orbslam2_dualcam_tpu.pipeline import ba_pack, frontend
from orbslam2_dualcam_tpu.utils.config import SystemConfig
from orbslam2_dualcam_tpu.utils.profiling import StageTimer


class LocalMapper:
    def __init__(self, cfg: SystemConfig, rig: CameraRig, slam_map: Map,
                 loop_closer=None) -> None:
        self.cfg = cfg
        self.rig = rig
        self.map = slam_map
        self.loop_closer = loop_closer
        self.scale_factors = np.asarray(cfg.orb.scale_factors, np.float32)
        self._level_scales = jnp.asarray(self.scale_factors)
        self.timer = StageTimer()
        self.recent_mids: List[int] = []     # candidates for culling
        self.n_triangulated = 0
        self.n_fused = 0
        self.n_culled_kf = 0
        self.ba_log: List[tuple] = []        # (kid, n_kf, n_mp, n_edge, cost)

    # ------------------------------------------------------------------
    def on_new_keyframe(self, kf: KeyFrame, run_ba: bool = True) -> None:
        m = self.map
        t0, f0, c0 = self.n_triangulated, self.n_fused, self.n_culled_kf
        m.update_connections(kf)
        self._cull_recent_points(kf)
        with self.timer("triangulate"):
            self._create_new_points(kf)
        with self.timer("fuse"):
            self._fuse_neighbors(kf)
        for mid in kf.mp_idx[kf.mp_idx >= 0]:
            mp = m.points.get(int(mid))
            if mp is not None:
                update_point_stats(mp, m, np.asarray(self.rig.T_sc),
                                   self.scale_factors)
        m.update_connections(kf)
        if run_ba and m.n_keyframes > 2:
            with self.timer("local_ba"):
                self._local_ba(kf)
        self._cull_keyframes(kf)
        self.kf_log = getattr(self, "kf_log", [])
        self.kf_log.append((kf.kid, self.n_triangulated - t0,
                            self.n_fused - f0, self.n_culled_kf - c0,
                            len(self.map.covisible_kfs(kf))))
        if self.loop_closer is not None:
            self.loop_closer.on_new_keyframe(kf)

    # ------------------------------------------------------------------
    def _cull_recent_points(self, kf: KeyFrame) -> None:
        """MapPointCulling (LocalMapping.cc:203-242): drop points with poor
        found/visible ratio or too few observations soon after creation."""
        m = self.map
        keep: List[int] = []
        for mid in self.recent_mids:
            mp = m.points.get(mid)
            if mp is None or mp.is_bad:
                continue
            age = kf.kid - mp.first_kf_id
            if mp.found_ratio() < 0.25:
                m.erase_point(mp)
            elif age >= 2 and mp.n_obs <= 2:
                m.erase_point(mp)
            elif age >= 3:
                pass          # graduated
            else:
                keep.append(mid)
        self.recent_mids = keep

    # ------------------------------------------------------------------
    def _create_new_points(self, kf: KeyFrame) -> None:
        """CreateNewMapPoints (LocalMapping.cc:275-490): per covisible KF,
        per camera, epipolar-matched triangulation.  Non-primary cameras
        only triangulate once the map is metrically scaled
        (LocalMapping.cc:309-311)."""
        m = self.map
        neighbors = m.covisible_kfs(kf, 10)
        ncam = self.cfg.n_cameras
        N = len(kf.kp_valid) // ncam
        cams = range(ncam) if m.map_scaled else [0]
        for nkid in neighbors:
            nkf = m.keyframes.get(nkid)
            if nkf is None:
                continue
            # baseline / median-depth gate (LocalMapping.cc:320-338)
            b = np.linalg.norm(kf.center() - nkf.center())
            med = self._median_depth(nkf)
            if med <= 0 or b / med < 0.01:
                continue
            for c in cams:
                g = c * N
                free1 = (kf.kp_valid[g:g + N] & (kf.mp_idx[g:g + N] < 0))
                free2 = (nkf.kp_valid[g:g + N] & (nkf.mp_idx[g:g + N] < 0))
                if free1.sum() < 10 or free2.sum() < 10:
                    continue
                idx, X, good = frontend.triangulate_pair(
                    jnp.asarray(kf.T_cw.astype(np.float32)),
                    jnp.asarray(nkf.T_cw.astype(np.float32)),
                    jnp.asarray(c),
                    jnp.asarray(kf.uv[g:g + N].astype(np.float32)),
                    jnp.asarray(kf.desc[g:g + N].astype(np.uint32)),
                    jnp.asarray(kf.level[g:g + N]),
                    jnp.asarray(free1),
                    jnp.asarray(nkf.uv[g:g + N].astype(np.float32)),
                    jnp.asarray(nkf.desc[g:g + N].astype(np.uint32)),
                    jnp.asarray(nkf.level[g:g + N]),
                    jnp.asarray(free2),
                    self.rig, self._level_scales,
                    jnp.float32(self.cfg.matcher.th_low))
                idx = np.asarray(idx)
                X = np.asarray(X, np.float64)
                good = np.asarray(good)
                for r1 in np.nonzero(good)[0]:
                    r2 = int(idx[r1])
                    g1 = g + int(r1)
                    g2 = g + r2
                    if kf.mp_idx[g1] >= 0 or nkf.mp_idx[g2] >= 0:
                        continue
                    mp = m.new_point(X[r1], kf.kid, c)
                    mp.first_kf_id = kf.kid
                    m.add_observation(mp, kf, g1, c)
                    m.add_observation(mp, nkf, g2, c)
                    update_point_stats(mp, m, np.asarray(self.rig.T_sc),
                                       self.scale_factors)
                    self.recent_mids.append(mp.mid)
                    self.n_triangulated += 1

    def _cam_enabled(self):
        import jax.numpy as jnp
        ncam = self.cfg.n_cameras
        if self.map.map_scaled or ncam == 1:
            return jnp.ones((ncam,), bool)
        return jnp.zeros((ncam,), bool).at[0].set(True)

    def _median_depth(self, kf: KeyFrame) -> float:
        m = self.map
        ds = []
        for mid in kf.mp_idx[kf.mp_idx >= 0][:500]:
            mp = m.points.get(int(mid))
            if mp is not None:
                ds.append(kf.T_cw[2, :3] @ mp.pos + kf.T_cw[2, 3])
        return float(np.median(ds)) if ds else -1.0

    # ------------------------------------------------------------------
    def _fuse_neighbors(self, kf: KeyFrame) -> None:
        """SearchInNeighbors (LocalMapping.cc:492-570): project this KF's
        points into neighbours and merge duplicates, then the reverse."""
        m = self.map
        # one-hop neighbourhood.  The reference extends to two hops
        # (LocalMapping.cc:500-516); measured here the second hop
        # over-merges on repetitive texture and destabilizes long runs, so
        # it stays off until fuse gains a reprojection-error gate.
        targets: List[int] = []
        seen: Set[int] = {kf.kid}
        for nkid in m.covisible_kfs(kf, 10):
            if nkid not in seen:
                seen.add(nkid)
                targets.append(nkid)
        # forward: kf's points into each target
        mids = [int(x) for x in kf.mp_idx[kf.mp_idx >= 0]]
        for nkid in targets:
            nkf = m.keyframes.get(nkid)
            if nkf is not None:
                self.n_fused += self._fuse_into(nkf, mids)
        # reverse: targets' points into kf
        nmids: Set[int] = set()
        for nkid in targets:
            nkf = m.keyframes.get(nkid)
            if nkf is None:
                continue
            nmids.update(int(x) for x in nkf.mp_idx[nkf.mp_idx >= 0])
        self.n_fused += self._fuse_into(kf, sorted(nmids))

    def _fuse_into(self, target: KeyFrame, mids: List[int]) -> int:
        """Fuse (ORBmatcher.cc:1431-1558): project points into `target`;
        matched keypoints either gain an observation or trigger a merge."""
        m = self.map
        cap = self.cfg.capacity.max_local_mp
        mids = [mid for mid in mids if mid in m.points][:cap]
        if len(mids) < 5:
            return 0
        ncam = self.cfg.n_cameras
        N = len(target.kp_valid) // ncam
        pos = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 8), np.uint32)
        normal = np.zeros((cap, 3), np.float32)
        dmin = np.zeros(cap, np.float32)
        dmax = np.full(cap, 1e9, np.float32)
        valid = np.zeros(cap, bool)
        for i, mid in enumerate(mids):
            mp = m.points[mid]
            if mp.is_bad:
                continue
            pos[i] = mp.pos
            desc[i] = mp.desc
            normal[i] = mp.normal
            dmin[i] = mp.min_dist
            dmax[i] = mp.max_dist if mp.max_dist > 0 else 1e9
            valid[i] = True
        mp_of_kp = frontend.project_and_match(
            jnp.asarray(target.T_cw.astype(np.float32)),
            jnp.asarray(target.uv.reshape(ncam, N, 2).astype(np.float32)),
            jnp.asarray(target.desc.reshape(ncam, N, 8).astype(np.uint32)),
            jnp.asarray(target.level.reshape(ncam, N)),
            jnp.asarray(target.kp_valid.reshape(ncam, N)),
            jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(valid),
            jnp.asarray(dmax), jnp.asarray(dmin), jnp.asarray(normal),
            self.rig, jnp.float32(3.0), self._level_scales,
            jnp.float32(self.cfg.matcher.th_low), jnp.float32(0.5),
            self._cam_enabled())
        mp_of_kp = np.asarray(mp_of_kp)
        n = 0
        for c in range(ncam):
            for row in np.nonzero(mp_of_kp[c] >= 0)[0]:
                mid = mids[int(mp_of_kp[c][row])]
                mp = m.points.get(mid)
                if mp is None or mp.is_bad:
                    continue
                g = c * N + int(row)
                cur = int(target.mp_idx[g])
                if cur < 0:
                    if target.kid not in mp.obs:
                        m.add_observation(mp, target, g, c)
                        n += 1
                elif cur != mid:
                    other = m.points.get(cur)
                    if other is None or other.is_bad:
                        continue
                    # keep the more-observed point (MapPoint::Replace)
                    if other.n_obs >= mp.n_obs:
                        m.replace_point(mp, other)
                    else:
                        m.replace_point(other, mp)
                    n += 1
        return n

    # ------------------------------------------------------------------
    def _local_ba(self, kf: KeyFrame) -> None:
        """LocalBundleAdjustment (Optimizer.cc:407-696): window = current KF
        + covisible KFs; gauge anchored at the scale anchor (first-scale KF
        once the dual map is scaled, LocalMapping.cc:97-108) or the oldest
        window KF."""
        m = self.map
        window = [kf.kid] + m.covisible_kfs(kf, 20)
        fixed: Set[int] = set()
        if m.first_scale_kid >= 0 and m.first_scale_kid in m.keyframes:
            fixed.add(m.first_scale_kid)
        if m.origin_kid in window:
            fixed.add(m.origin_kid)
        cfg = self.cfg
        prob, all_kids, mids, meta = ba_pack.pack_problem(
            m, window, fixed_kids=fixed,
            level_sigma2=self.scale_factors ** 2, ncam=cfg.n_cameras,
            max_points=cfg.capacity.max_local_mp)
        res = ba.solve_ba(prob, self.rig.T_sc, self.rig.adj_sc, self.rig.K,
                          iters=cfg.ba.local_iters_a + cfg.ba.local_iters_b)
        n_erased = ba_pack.unpack_result(m, res, all_kids, mids, meta,
                                         chi2_th=cfg.ba.chi2_mono)
        self.ba_log.append((kf.kid, len(all_kids), len(mids), len(meta),
                            float(res.cost), n_erased))

    # ------------------------------------------------------------------
    def _cull_keyframes(self, kf: KeyFrame) -> None:
        """KeyFrameCulling (LocalMapping.cc:955-1008): erase local KFs whose
        points are >=90% observed by >=3 other KFs at same-or-finer scale.
        KFs connected to the second map are protected."""
        m = self.map
        for kid in m.covisible_kfs(kf):
            ckf = m.keyframes.get(kid)
            if (ckf is None or ckf.kid == m.origin_kid or
                    ckf.connected_to_second_map or
                    ckf.kid == m.first_scale_kid):
                continue
            mids = ckf.mp_idx[ckf.mp_idx >= 0]
            if len(mids) == 0:
                continue
            n_redundant = 0
            for g, mid in zip(np.nonzero(ckf.mp_idx >= 0)[0], mids):
                mp = m.points.get(int(mid))
                if mp is None:
                    continue
                level = int(ckf.level[g])
                n_better = 0
                for okid, orow in mp.obs.items():
                    if okid == ckf.kid:
                        continue
                    okf = m.keyframes.get(okid)
                    if okf is not None and int(okf.level[orow]) <= level + 1:
                        n_better += 1
                if n_better >= 3:
                    n_redundant += 1
            if n_redundant > 0.9 * len(mids):
                m.erase_keyframe(ckf)
                self.n_culled_kf += 1
