"""System facade: construction, per-frame entry, savers.

TPU re-design of src/System.cc: builds the map, keyframe database, tracker,
local mapper, and (optionally) loop closer, and exposes the per-frame
TrackDual-style entry plus trajectory/map savers in the reference's
``x y z qx qy qz qw [id]`` text format (System.cc:335-410).

The reference spawns LocalMapping/LoopClosing threads (System.cc:116-150);
here stages run synchronously by default (deterministic, and the heavy math
is already asynchronous on the TPU stream).  `async_mapping=True` moves the
local-mapping + loop-closing work onto a background thread fed by a
keyframe queue — the same pipeline parallelism, with the map guarded by a
coarse lock exactly where the reference holds mMutexMapUpdate.
"""

from __future__ import annotations

import queue
import threading
from typing import List, Optional

import numpy as np

from orbslam2_dualcam_tpu.models.kfdb import KeyFrameDatabase
from orbslam2_dualcam_tpu.models.map import Map
from orbslam2_dualcam_tpu.ops import camera, lie
from orbslam2_dualcam_tpu.pipeline.local_mapping import LocalMapper
from orbslam2_dualcam_tpu.pipeline.tracking import Tracker
from orbslam2_dualcam_tpu.utils.config import SystemConfig
from orbslam2_dualcam_tpu.vocab import bow


class System:
    def __init__(self, cfg: SystemConfig,
                 voc: Optional[bow.Vocabulary] = None,
                 enable_loop_closing: bool = True,
                 async_mapping: bool = False,
                 mesh=None, viewer: bool = False,
                 viewer_port: int = 0,
                 deferred_tracking: bool = False) -> None:
        """`mesh`: optional jax.sharding.Mesh with a "data" axis; when
        attached, global BA passes shard their edge tables across it
        (parallel/runtime.solve_ba_auto).

        `viewer=True` starts the live HTTP viewer (viz/live.py — the
        reference's Viewer thread, System.cc:137); `viewer_port=0` picks
        a free port, printed at startup and available as
        `system.viewer.port`.

        `deferred_tracking=True` runs the tracker lag-1 pipelined: frame
        k is dispatched to the device, then frame k-1's results are read
        and processed while k computes — track() returns state one frame
        behind, and shutdown() flushes the in-flight frame.  This is the
        deployment mode for remote-attached chips, where a blocking
        per-frame readback costs a full network round trip."""
        self.cfg = cfg
        self.mesh = mesh
        self.rig = camera.make_rig(cfg)
        self.map = Map()
        self.voc = voc
        self.kfdb = (KeyFrameDatabase(cfg.n_cameras, voc.n_words)
                     if voc is not None else None)
        if self.kfdb is not None:
            # culling a keyframe must drop its inverted-file postings too,
            # or reloc/loop queries return dead candidates (KeyFrame.cc:668)
            self.map.on_erase_keyframe.append(self.kfdb.erase)
        self.loop_closer = None
        if enable_loop_closing and voc is not None:
            from orbslam2_dualcam_tpu.pipeline.loop_closing import LoopCloser
            self.loop_closer = LoopCloser(cfg, self.rig, self.map, self.kfdb,
                                          voc, mesh=mesh)
        self.mapper = LocalMapper(cfg, self.rig, self.map,
                                  loop_closer=self.loop_closer,
                                  kfdb=self.kfdb, voc=voc)
        self._async = async_mapping
        self.map_lock = threading.Lock()
        self.frame_intervals: List[tuple] = []   # (t0, t1) per track() call
        if async_mapping:
            self._kf_queue: "queue.Queue" = queue.Queue()
            self._stop = threading.Event()
            # local BA yields: drops map_lock while each LM chunk runs on
            # device, and aborts when the tracker queued another keyframe
            # (the reference's InterruptBA, LocalMapping.cc:97-108)
            self.mapper.map_lock = self.map_lock
            self.mapper.interrupt_check = lambda: not self._kf_queue.empty()
            self._mapper_thread = threading.Thread(
                target=self._mapping_loop, daemon=True)
            self._mapper_thread.start()
            front = _AsyncMapperProxy(self)
        else:
            front = self.mapper
        self.tracker = Tracker(cfg, self.rig, voc, self.map, self.kfdb,
                               local_mapper=front, mesh=mesh,
                               deferred=deferred_tracking)
        if async_mapping and self.tracker.deferred:
            # the tracker takes the lock itself, only around map-touching
            # sections, so the mapper thread runs during device waits
            self.tracker.map_lock = self.map_lock
        if async_mapping:
            # KF back-pressure (the reference's LocalMapping idle check):
            # with >=2 keyframes queued, defer further insertions
            self.tracker.mapper_busy = \
                lambda: self._kf_queue.qsize() >= 2
        self.viewer = None
        if viewer:
            from orbslam2_dualcam_tpu.viz.live import LiveViewer
            self.viewer = LiveViewer(port=viewer_port)
            print(f"# live viewer: http://localhost:{self.viewer.port}/")

    # ------------------------------------------------------------------
    def track(self, images: np.ndarray, timestamp: float) -> str:
        """Per-frame entry (System::TrackDual, System.cc:153-180).
        images: [ncam, H, W] uint8/float grayscale (uint8 preferred —
        it uploads 4x fewer bytes; float inputs are quantized to u8 at
        the device boundary either way, Tracker._stage_images)."""
        images = np.asarray(images)
        import time as _time
        t0 = _time.monotonic()
        try:
            if self._async and not self.tracker.deferred:
                with self.map_lock:
                    state = self.tracker.process(images, timestamp)
            else:
                # deferred mode: the tracker holds the lock only around
                # its map-touching host sections (Tracker._lock)
                state = self.tracker.process(images, timestamp)
            return state
        finally:
            self.frame_intervals.append((t0, _time.monotonic()))
            if self.viewer is not None:
                self.viewer.update(
                    images, self.tracker.last, self.tracker.state,
                    self.map, np.asarray(self.rig.T_sc),
                    reloc_T_cw=self.tracker.last_reloc_cam_pose)

    def _mapping_loop(self) -> None:
        while not self._stop.is_set():
            try:
                kf, run_ba = self._kf_queue.get(timeout=0.05)
            except queue.Empty:
                continue
            with self.map_lock:
                self.mapper.on_new_keyframe(kf, run_ba=run_ba)

    def shutdown(self) -> None:
        self.tracker.flush()
        if self.viewer is not None:
            self.viewer.close()
            self.viewer = None
        if self._async:
            while not self._kf_queue.empty():
                import time
                time.sleep(0.01)
            self._stop.set()
            self._mapper_thread.join(timeout=5.0)

    def activate_localization_mode(self) -> None:
        """Track against the frozen map without extending it
        (System::ActivateLocalizationMode, System.cc:182-199)."""
        self.tracker.localization_only = True

    def deactivate_localization_mode(self) -> None:
        self.tracker.localization_only = False

    def set_compulsory_lost(self) -> None:
        """Force LOST on the next frame (System.cc:330-333)."""
        self.tracker.force_lost()

    def reset(self) -> None:
        """System/Tracking reset (Tracking.cc:1863-1918)."""
        self.map.clear()
        if self.kfdb is not None:
            self.kfdb.clear()
        self.tracker.reset_state()
        self.mapper.recent_mids.clear()
        if self.loop_closer is not None:
            self.loop_closer.consistent_groups.clear()
            self.loop_closer.last_loop_kid = -1

    # ------------------------------------------------------------------
    # savers (System.cc:335-410 formats)
    # ------------------------------------------------------------------
    @staticmethod
    def _pose_line(T_cw: np.ndarray, suffix: str = "") -> str:
        T_wc = np.linalg.inv(T_cw)
        t = T_wc[:3, 3]
        import jax.numpy as jnp
        q = np.asarray(lie.rot_to_quat(jnp.asarray(T_wc[:3, :3],
                                                   jnp.float32)))
        return (f"{t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}{suffix}")

    def save_frame_trajectory(self, path: str) -> None:
        """SaveFramePoseTcw (System.cc:372-391): per-frame camera poses."""
        with open(path, "w") as f:
            for fid, ts, T in self.tracker.composed_trajectory():
                f.write(self._pose_line(T, f" {fid}") + "\n")

    def save_keyframe_trajectory(self, path: str) -> None:
        with open(path, "w") as f:
            for kid in sorted(self.map.keyframes):
                kf = self.map.keyframes[kid]
                f.write(self._pose_line(kf.T_cw, f" {kid}") + "\n")

    def save_map_points(self, path: str) -> None:
        with open(path, "w") as f:
            for mid in sorted(self.map.points):
                p = self.map.points[mid].pos
                f.write(f"{p[0]:.7f} {p[1]:.7f} {p[2]:.7f} {mid}\n")


class _AsyncMapperProxy:
    """Queue-facing stand-in handed to the Tracker in async mode (the
    reference's LocalMapping::InsertKeyFrame queue, LocalMapping.h:123)."""

    def __init__(self, system: System) -> None:
        self._system = system

    def on_new_keyframe(self, kf, run_ba: bool = True) -> None:
        self._system._kf_queue.put((kf, run_ba))
