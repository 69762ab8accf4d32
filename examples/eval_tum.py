"""Evaluate monocular tracking on a REAL recorded TUM RGB-D sequence.

The reference validates on real recordings (indoor_lab_loop.avi,
README.md:54-60); BASELINE.md's config[0] asks for TUM fr1/desk ATE.
This script is the executable path for that evaluation:

  1. if --data points at an extracted TUM sequence (rgb.txt +
     groundtruth.txt), it runs the full mono pipeline on the real frames
     and reports ATE RMSE vs ground truth;
  2. otherwise it ATTEMPTS the download (and records the failure — this
     sandbox has zero egress: DNS resolution fails, see RESULTS.md
     "real-data status").

Usage:
  python examples/eval_tum.py --data /path/to/rgbd_dataset_freiburg1_xyz
  python examples/eval_tum.py --try-download
"""

import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TUM_URLS = [
    "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/"
    "rgbd_dataset_freiburg1_xyz.tgz",
    "https://vision.in.tum.de/rgbd/dataset/freiburg1/"
    "rgbd_dataset_freiburg1_desk.tgz",
]

# TUM Freiburg1 intrinsics (vision.in.tum.de/data/datasets/rgbd-dataset)
FR1 = dict(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
           dist=(0.2624, -0.9531, -0.0054, 0.0026, 1.1633))


def try_download(dest: str) -> bool:
    ok = False
    for url in TUM_URLS:
        print(f"# attempting {url}")
        r = subprocess.run(["curl", "-sSL", "--connect-timeout", "20",
                            "-o", os.path.join(dest, os.path.basename(url)),
                            url], capture_output=True, text=True)
        print(f"#   rc={r.returncode} {r.stderr.strip()[:120]}")
        ok = ok or r.returncode == 0
    return ok


def evaluate(root: str, max_frames: int = 0, stride: int = 1,
             intr: dict = None) -> dict:
    import jax
    if os.environ.get("SLAM_EVAL_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")

    from orbslam2_dualcam_tpu.pipeline.system import System
    from orbslam2_dualcam_tpu.ops import orb
    from orbslam2_dualcam_tpu.utils import datasets, metrics
    from orbslam2_dualcam_tpu.utils.config import (CameraConfig, OrbConfig,
                                                   SystemConfig, VocabConfig)
    from orbslam2_dualcam_tpu.vocab import bow
    import jax.numpy as jnp

    intr = FR1 if intr is None else intr
    ds = datasets.TumRgbDataset.load(root)
    img0 = ds.read(0)
    H, W = img0.shape
    cam = CameraConfig(width=W, height=H, fx=intr["fx"], fy=intr["fy"],
                       cx=intr["cx"], cy=intr["cy"],
                       dist=intr.get("dist", (0.0, 0.0, 0.0, 0.0)))
    cfg = SystemConfig(cameras=(cam,),
                       orb=OrbConfig(n_features=1000, n_levels=8),
                       vocab=VocabConfig(branching=10, depth=3))
    # vocabulary from a sequence subsample (self-trained; an ORBvoc file
    # can be passed through vocab/orbvoc.py instead when available)
    idx = list(range(0, len(ds.frames),
                     max(1, len(ds.frames) // 25)))[:25]
    descs = []
    for i in idx:
        f = orb.extract_orb(jnp.asarray(ds.read(i)), cfg.orb, 1000)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = bow.train_vocabulary(np.concatenate(descs)[:40000], branching=10,
                               depth=3, seed=1, weight_docs=descs)

    sys_ = System(cfg, voc=voc, enable_loop_closing=True)
    n = len(ds.frames) if max_frames == 0 else min(max_frames,
                                                   len(ds.frames))
    for i in range(0, n, stride):
        ts, _ = ds.frames[i]
        sys_.track(ds.read(i)[None], ts)
    sys_.shutdown()

    # ATE vs ground truth at matched timestamps
    est_c, gt_c = [], []
    for fid, ts, rk, Trel, T in sys_.tracker.trajectory:
        g = ds.gt_center_at(ts)
        if g is None:
            continue
        est_c.append(np.linalg.inv(T)[:3, 3])
        gt_c.append(g)
    est_c, gt_c = np.asarray(est_c), np.asarray(gt_c)
    out = dict(n_frames=n, n_tracked=len(est_c),
               n_kf=sys_.map.n_keyframes,
               n_loops=(sys_.loop_closer.n_loops_closed
                        if sys_.loop_closer else 0))
    if len(est_c) > 10:
        out["ate_sim3_m"] = metrics.ate_rmse(est_c, gt_c, with_scale=True)
    print(out)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None,
                    help="extracted TUM sequence directory")
    ap.add_argument("--try-download", action="store_true")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()
    if args.data:
        evaluate(args.data, args.max_frames)
    elif args.try_download:
        ok = try_download("/tmp")
        print("# download", "succeeded — extract and re-run with --data"
              if ok else "FAILED (no network egress)")
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
