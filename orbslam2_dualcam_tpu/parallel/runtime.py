"""Device-mesh runtime: routes bundle adjustment to the distributed
solver when a mesh is attached and the problem is big enough.

The reference is a single-process pthread system (SURVEY §2.3); scaling
past one chip is a capability this build adds.  A `jax.sharding.Mesh` is
attached to the System (pipeline/system.py) and every global-BA call site
goes through `solve_ba_auto`: small problems stay on one device (the
collective latency would dominate), large ones shard their edge table
over the mesh's "data" axis (parallel/dist_ba.py).

The threshold is in EDGES — the only O(n)-growing axis of BA.  Poses and
points are replicated, so the distributed path's per-step cost is
edge_work/n_devices + two psums of [K,6,6]/[M,3,3] blocks over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from orbslam2_dualcam_tpu.optim import ba
from orbslam2_dualcam_tpu.optim.ba import BAProblem, BAResult
from orbslam2_dualcam_tpu.utils.config import BAConfig

# edges below this stay single-device: one LM step's collectives (~10 us
# each over ICI, far more over DCN) would exceed the sharded edge work
DIST_EDGE_THRESHOLD = 16384


def default_mesh() -> Optional[Mesh]:
    """A 1-D "data" mesh over all local devices (None if single-device)."""
    devs = jax.devices()
    if len(devs) < 2:
        return None
    import numpy as np
    return Mesh(np.asarray(devs), ("data",))


def solve_ba_auto(prob: BAProblem, T_sc, adj_sc, Ks, iters: int,
                  mesh: Optional[Mesh] = None,
                  cfg: BAConfig = BAConfig(),
                  cg_iters: int = 24, robust: bool = True,
                  dist_edge_threshold: int = DIST_EDGE_THRESHOLD) -> BAResult:
    """Single-device or mesh-distributed BA, chosen by problem size.

    Used by every global-BA call site in the pipeline (loop closing's GBA,
    the dual bootstrap's metric GBA) so the SAME code path serves a
    laptop-scale map and a pod-scale one."""
    E = prob.edges.kf.shape[0]
    if mesh is not None and E >= dist_edge_threshold:
        if E % mesh.shape["data"] == 0:
            from orbslam2_dualcam_tpu.parallel import dist_ba
            return dist_ba.solve_ba_distributed(
                prob, T_sc, adj_sc, Ks, mesh, iters=iters,
                cg_iters=cg_iters, cfg=cfg, robust=robust)
        # never silent: edge buckets are powers of two today, so this
        # can only trip if _bucket changes — make that visible
        import logging
        logging.getLogger(__name__).warning(
            "solve_ba_auto: E=%d not divisible by mesh size %d — "
            "falling back to single-device BA (pad the edge bucket)",
            E, mesh.shape["data"])
    return ba.solve_ba(prob, T_sc, adj_sc, Ks, iters=iters, cfg=cfg,
                       cg_iters=cg_iters, robust=robust)
