"""Offline map-cloud tools (tools/convert_points.cpp + fit_hall.cpp
equivalents): PLY conversion, voxel/outlier filters, RANSAC plane fit."""

import numpy as np

from orbslam2_dualcam_tpu import tools


def _room_cloud(rng, n=600, half=3.0, noise=0.01):
    """Points on two walls + floor of a room, plus a few fliers."""
    pts = []
    for _ in range(n // 3):
        pts.append([rng.uniform(-half, half), rng.uniform(-1, 1), half])
        pts.append([half, rng.uniform(-1, 1), rng.uniform(-half, half)])
        pts.append([rng.uniform(-half, half), 1.0,
                    rng.uniform(-half, half)])
    pts = np.asarray(pts) + rng.normal(0, noise, (len(pts), 3))
    fliers = rng.uniform(-half, half, (10, 3)) * 3
    return np.vstack([pts, fliers])


def test_convert_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = _room_cloud(rng)
    src = tmp_path / "map_points.txt"
    with open(src, "w") as f:
        for i, p in enumerate(pts):
            f.write(f"{p[0]:.7f} {p[1]:.7f} {p[2]:.7f} {i}\n")
    out = tmp_path / "cloud.ply"
    tools.main(["convert", str(src), str(out), "--voxel", "0.1",
                "--denoise"])
    text = out.read_text().splitlines()
    assert text[0] == "ply"
    n = int([ln for ln in text if ln.startswith("element vertex")][0]
            .split()[-1])
    assert 50 < n < len(pts)            # downsampled + denoised


def test_view_renders_png(tmp_path):
    rng = np.random.default_rng(2)
    pts = _room_cloud(rng, n=120)
    src = tmp_path / "map_points.txt"
    with open(src, "w") as f:
        for i, p in enumerate(pts):
            f.write(f"{p[0]:.7f} {p[1]:.7f} {p[2]:.7f} {i}\n")
    kf = tmp_path / "keyframes.txt"
    with open(kf, "w") as f:
        for i in range(8):
            f.write(f"{i*0.1:.7f} 0.0 0.0 0.0 0.0 0.0 1.0 {i}\n")
    out = tmp_path / "map.png"
    tools.main(["view", str(src), str(out), "--keyframes", str(kf)])
    assert out.exists() and out.stat().st_size > 5000


def test_fit_planes_recovers_walls():
    rng = np.random.default_rng(1)
    pts = _room_cloud(rng, noise=0.005)
    planes = tools.fit_planes(pts, n_planes=3, dist_th=0.04)
    assert len(planes) == 3
    normals = np.abs(np.asarray([p[0] for p in planes]))
    # the three dominant planes are axis-aligned: z=3, x=3, y=1
    axes = {int(np.argmax(n)) for n in normals}
    assert axes == {0, 1, 2}, normals
    for nrm, d, inl in planes:
        assert len(inl) > 100
