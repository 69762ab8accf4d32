"""Probe loop-closing recall on the real-texture circuit: when do
candidates first appear, what blocks them (min_score / consistency /
sim3), and when does the loop fire."""
import numpy as np
import jax.numpy as jnp

import tests.conftest  # noqa: F401
from orbslam2_dualcam_tpu.ops import orb
from orbslam2_dualcam_tpu.pipeline.system import System
from orbslam2_dualcam_tpu.utils import datasets, metrics, synthetic
from orbslam2_dualcam_tpu.utils.config import (CameraConfig, CapacityConfig,
                                               MappingConfig, OrbConfig,
                                               SystemConfig)
from orbslam2_dualcam_tpu.vocab import bow

W, H, f, nf, nl = 320, 240, 260.0, 800, 6
cfg = SystemConfig(
    cameras=(CameraConfig(width=W, height=H, fx=f, fy=f,
                          cx=W / 2, cy=H / 2),),
    orb=OrbConfig(n_features=nf, n_levels=nl),
    mapping=MappingConfig(cull_found_ratio=0.1),
    capacity=CapacityConfig(max_local_mp=2048))
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
planes = datasets.photo_room_planes(half=3.0, height=1.8)
poses = synthetic.orbit_trajectory(120, radius=1.5,
                                   total_angle=2.25 * np.pi)
descs = []
for img, _ in datasets.planar_photo_sequence(poses[::7], K, H=H, W=W,
                                             planes=planes):
    ft = orb.extract_orb(jnp.asarray(img), cfg.orb, nf)
    descs.append(np.asarray(ft.desc)[np.asarray(ft.valid)])
voc = bow.train_vocabulary(np.concatenate(descs), branching=9, depth=4,
                           seed=5, weight_docs=descs)
sys_ = System(cfg, voc=voc, enable_loop_closing=True)
states = []
for i, (img, T) in enumerate(datasets.planar_photo_sequence(
        poses, K, H=H, W=W, planes=planes)):
    states.append(sys_.track(img[None], i / 30.0))

lc = sys_.loop_closer
print("loops closed:", lc.n_loops_closed)
print("--- debug log ---")
for line in lc.debug_log:
    print(line)
kids = sorted(sys_.map.keyframes.keys())
fid_of = {kid: sys_.map.keyframes[kid].frame_id for kid in kids}
print("n_kf:", len(kids), "kf frame range:",
      fid_of[kids[0]], fid_of[kids[-1]])
