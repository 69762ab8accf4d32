"""Multi-host distributed BA: 2 JAX processes over jax.distributed.

SURVEY §7 step 9 / BASELINE config[4]: the distributed solver must run
under multi-controller JAX, not only on a single-process virtual mesh.
This spawns two CPU processes (4 virtual devices each) joined through
jax.distributed.initialize, runs solve_ba_distributed on the identical
problem in both, and checks the replicated result matches a
single-process solve.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=proc_id)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
sys.path.insert(0, r"%(repo)s")
from orbslam2_dualcam_tpu.ops import camera, lie
from orbslam2_dualcam_tpu.optim import ba
from orbslam2_dualcam_tpu.optim.factors import Edges
from orbslam2_dualcam_tpu.parallel import dist_ba
from orbslam2_dualcam_tpu.utils.config import dual_default

devs = jax.devices()
assert len(devs) == 8, len(devs)
mesh = Mesh(np.asarray(devs), ("data",))
rig = camera.make_rig(dual_default())
rng = np.random.default_rng(0)
n_kf, n_mp, E = 4, 32, 128
poses = jnp.stack([jnp.asarray(np.asarray(
    lie.se3_exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.05))))
    for _ in range(n_kf)])
points = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 8],
                                 (n_mp, 3)).astype(np.float32))
edges = Edges(
    kf=jnp.asarray(rng.integers(0, n_kf, E, dtype=np.int32)),
    mp=jnp.asarray(rng.integers(0, n_mp, E, dtype=np.int32)),
    cam=jnp.asarray(rng.integers(0, 2, E, dtype=np.int32)),
    uv=jnp.asarray(rng.uniform(0, 480, (E, 2)).astype(np.float32)),
    inv_sigma2=jnp.ones(E, jnp.float32),
    valid=jnp.ones(E, bool))
prob = ba.BAProblem(
    poses=poses, points=points, edges=edges,
    pose_valid=jnp.ones(n_kf, bool),
    pose_fixed=jnp.zeros(n_kf, bool).at[0].set(True),
    point_valid=jnp.ones(n_mp, bool))
res = dist_ba.solve_ba_distributed(prob, rig.T_sc, rig.adj_sc, rig.K,
                                   mesh, iters=3, cg_iters=8)
print("COST", proc_id, float(np.asarray(res.cost)), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_ba(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": repo})
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (out[-2000:], err[-2000:])
        outs.append(out)
    costs = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("COST")][0]
        costs.append(float(line.split()[2]))
    # both controllers see the identical replicated cost
    assert abs(costs[0] - costs[1]) < 1e-3 * max(1.0, abs(costs[0])), costs

    # ... and it matches the single-process (8 virtual devices) solve
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from orbslam2_dualcam_tpu.ops import camera, lie
    from orbslam2_dualcam_tpu.optim import ba
    from orbslam2_dualcam_tpu.optim.factors import Edges
    from orbslam2_dualcam_tpu.parallel import dist_ba
    from orbslam2_dualcam_tpu.utils.config import dual_default

    rig = camera.make_rig(dual_default())
    rng = np.random.default_rng(0)
    n_kf, n_mp, E = 4, 32, 128
    poses = jnp.stack([jnp.asarray(np.asarray(
        lie.se3_exp(jnp.asarray(
            rng.normal(size=6).astype(np.float32) * 0.05))))
        for _ in range(n_kf)])
    points = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 8],
                                     (n_mp, 3)).astype(np.float32))
    edges = Edges(
        kf=jnp.asarray(rng.integers(0, n_kf, E, dtype=np.int32)),
        mp=jnp.asarray(rng.integers(0, n_mp, E, dtype=np.int32)),
        cam=jnp.asarray(rng.integers(0, 2, E, dtype=np.int32)),
        uv=jnp.asarray(rng.uniform(0, 480, (E, 2)).astype(np.float32)),
        inv_sigma2=jnp.ones(E, jnp.float32),
        valid=jnp.ones(E, bool))
    prob = ba.BAProblem(
        poses=poses, points=points, edges=edges,
        pose_valid=jnp.ones(n_kf, bool),
        pose_fixed=jnp.zeros(n_kf, bool).at[0].set(True),
        point_valid=jnp.ones(n_mp, bool))
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    ref = dist_ba.solve_ba_distributed(prob, rig.T_sc, rig.adj_sc, rig.K,
                                       mesh, iters=3, cg_iters=8)
    assert abs(costs[0] - float(np.asarray(ref.cost))) < \
        2e-3 * max(1.0, abs(costs[0])), (costs[0], float(ref.cost))
