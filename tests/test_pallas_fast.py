"""Pallas FAST kernel vs the jnp reference implementation (interpreter
mode on CPU; the driver's TPU bench exercises the compiled path)."""

import jax.numpy as jnp
import numpy as np

from orbslam2_dualcam_tpu.ops import orb
from orbslam2_dualcam_tpu.ops.pallas_kernels import fast_nms_pallas
from orbslam2_dualcam_tpu.utils import synthetic


def _fused_ref(img, th_hi, th_lo):
    """The XLA composition the fused kernel replaces (ops/orb.py)."""
    s, s_lo, sad_lo = orb.fast_scores2(img, th_hi, th_lo)
    return (np.asarray(orb.nms3x3(jnp.where(s > 0, s + 1e4, s_lo))),
            np.asarray(sad_lo))


def test_fused_fast_nms_matches_reference(rng):
    world = synthetic.make_box_world(rng, half=6.0, tex_size=256)
    K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]])
    img = jnp.asarray(synthetic.render(world, K, np.eye(4), H=240, W=320))
    ref_s, ref_sad = _fused_ref(img, 20.0, 7.0)
    s, sad = fast_nms_pallas(img, 20.0, 7.0, interpret=True)
    np.testing.assert_allclose(np.asarray(sad), ref_sad, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=1e-3)


def test_fused_fast_nms_non_tile_aligned(rng):
    img = jnp.asarray(rng.uniform(0, 255, (100, 150)).astype(np.float32))
    ref_s, ref_sad = _fused_ref(img, 12.0, 5.0)
    s, sad = fast_nms_pallas(img, 12.0, 5.0, interpret=True)
    np.testing.assert_allclose(np.asarray(sad), ref_sad, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=1e-3)
