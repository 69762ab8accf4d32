"""Video-driven SLAM CLI, the reference's example binary as a module.

Equivalent of Examples/Dual/dual_slam_video.cpp: reads a joint side-by-side
video, splits each frame into the per-camera halves, feeds the system, and
writes trajectories/map artifacts.

Usage:
  python -m orbslam2_dualcam_tpu.run --settings Dual-LenaCV.yaml \
      --video indoor_lab_loop.avi [--vocab ORBvoc.bin|.txt|.npz] \
      [--out out_dir] [--max-frames N] [--mono]

The reference's positional CLI was `dual_slam_video voc.bin settings.yaml
video.avi` (dual_slam_video.cpp:45-52); --vocab accepts the reference's
DBoW2 ORBvoc artifact directly (binary or text, vocab/orbvoc.py) as well
as our .npz format (train one with vocab.bow.train_vocabulary)."""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--settings", required=True, help="rig YAML (reference format)")
    ap.add_argument("--video", required=True, help="joint side-by-side video")
    ap.add_argument("--vocab", default=None,
                    help="vocabulary: .npz (ours) or the reference's DBoW2 "
                         "ORBvoc .bin/.txt (System.cc:88-102 loads both)")
    ap.add_argument("--out", default="slam_out", help="output directory")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--mono", action="store_true",
                    help="use only camera 0 (no splitting)")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--viewer", action="store_true",
                    help="serve the live viewer (viz/live.py) over HTTP")
    ap.add_argument("--viewer-port", type=int, default=0,
                    help="live viewer port (0 = pick a free one)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu or os.environ.get("SLAM_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import numpy as np

    from orbslam2_dualcam_tpu.pipeline.system import System
    from orbslam2_dualcam_tpu.utils import checkpoint
    from orbslam2_dualcam_tpu.utils.yaml_config import load_rig_yaml
    from orbslam2_dualcam_tpu.vocab import bow

    cfg = load_rig_yaml(args.settings)
    voc = None
    if args.vocab:
        if args.vocab.endswith(".npz"):
            voc = bow.load_vocabulary(args.vocab)
        else:  # the reference's DBoW2 artifact (.bin/.txt)
            from orbslam2_dualcam_tpu.vocab.orbvoc import load_orbvoc
            voc = load_orbvoc(args.vocab)
    sys_ = System(cfg, voc=voc, enable_loop_closing=not args.no_loop,
                  viewer=args.viewer, viewer_port=args.viewer_port)

    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        print(f"cannot open video: {args.video}", file=sys.stderr)
        return 1
    ncam = cfg.n_cameras if not args.mono else 1
    n = 0
    t0 = time.time()
    while True:
        ok, frame = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32)
        H, W = gray.shape
        if ncam > 1:
            # split the joint image into equal horizontal slices
            # (dual_slam_video.cpp:76-86 splits left/right halves)
            w = W // ncam
            imgs = np.stack([gray[:, c * w:(c + 1) * w] for c in range(ncam)])
        else:
            imgs = gray[None]
        st = sys_.track(imgs, n / cfg.fps)
        if n % 30 == 0:
            fps = (n + 1) / max(time.time() - t0, 1e-9)
            print(f"frame {n:5d} state={st:15s} kf={sys_.map.n_keyframes:4d} "
                  f"mp={sys_.map.n_points:6d} ({fps:.1f} fps)")
        n += 1
    cap.release()
    sys_.shutdown()

    os.makedirs(args.out, exist_ok=True)
    sys_.save_frame_trajectory(os.path.join(args.out, "FramePoseTcw.txt"))
    sys_.save_keyframe_trajectory(os.path.join(args.out, "KeyFramePoseTcw.txt"))
    sys_.save_map_points(os.path.join(args.out, "MapPoint.txt"))
    checkpoint.save_map(sys_.map, os.path.join(args.out, "map.npz"))
    print(f"{n} frames; artifacts in {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
