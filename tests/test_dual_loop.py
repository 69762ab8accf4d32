"""Combined dual-bootstrap + loop-closure fixture (VERDICT r3 #8).

A photo-textured circuit at the reference's 69-deg / 10 cm rig where the
metric second map is created DURING the lap and the loop closes on the
revisit — CreateSecondMapMultical (Tracking.cc:512-775) and CorrectLoop/
GBA (LoopClosing.cc:469-701) interacting in one run, which neither
tests/test_dual_texture.py (no loop closer) nor tests/test_loop_closing.py
(mono-informative rig) exercises as a combination.

The loop correction must preserve the bootstrap's METRIC scale: the loop
closer runs 7-DoF Sim3 (mbFixScale=false, LoopClosing.h:91), so a wrong
similarity fit here would silently destroy metricness."""

import numpy as np
import pytest

from orbslam2_dualcam_tpu.utils import metrics

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dual_loop_run():
    from examples.eval_dual_texture import run

    out, sys_ = run(yaw_deg=69.0, n_frames=150, baseline=0.10,
                    verbose=False, loop_closing=True,
                    total_angle=2.7 * np.pi)
    return out, sys_


def test_bootstrap_then_loop(dual_loop_run):
    out, sys_ = dual_loop_run
    ev = sys_.tracker.events
    assert out["map_scaled"], (out, ev[-20:])
    assert out["n_loops"] >= 1, (out, ev[-30:])
    assert any(e.startswith("SCALED") for e in ev), ev[-20:]
    assert out["final"] in ("OK", "FULL"), out


def test_loop_preserves_metric_scale(dual_loop_run):
    """7-DoF loop correction + GBA must keep |s-1| small — the metric
    scale established by the dual bootstrap survives the similarity
    loop fit."""
    out, sys_ = dual_loop_run
    assert out["n_loops"] >= 1, out
    assert abs(out["scale"] - 1.0) <= 0.20, out
    assert out["ate_se3"] < 0.08 * out["span"], out


def test_cross_points_survive_loop(dual_loop_run):
    """Per-camera MapPoint correction through the extrinsic
    (LoopClosing.cc:574-593): cross-camera-observed points must still
    exist and be finite after CorrectLoop."""
    out, sys_ = dual_loop_run
    assert out["n_cross"] > 50, out
    for mp in sys_.map.points.values():
        assert np.all(np.isfinite(mp.pos)), mp.mid
