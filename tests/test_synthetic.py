"""data/synthetic: rig fixtures + the photo-consistent multiplane renderer.

The renderer is the accuracy-demonstration data source (VERDICT r3 item 4): these
tests pin the property that makes it usable as MVS supervision — every view images
the SAME surface, so reprojecting the ref-view gt into a neighbor view reproduces
the neighbor's colors (up to resampling) and the neighbor's own depth map.
"""

import numpy as np

from atvsnet_tpu.data.synthetic import (
    render_multiplane_scene,
    render_multiplane_views,
    synthetic_batch,
    synthetic_scene,
)


def _bilinear(img, x, y):
    H, W = img.shape[:2]
    x = np.clip(x - 0.5, 0, W - 1.001)
    y = np.clip(y - 0.5, 0, H - 1.001)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = (x - x0)[..., None] if img.ndim == 3 else (x - x0)
    fy = (y - y0)[..., None] if img.ndim == 3 else (y - y0)
    return (
        img[y0, x0] * (1 - fy) * (1 - fx)
        + img[y0, x0 + 1] * (1 - fy) * fx
        + img[y0 + 1, x0] * fy * (1 - fx)
        + img[y0 + 1, x0 + 1] * fy * fx
    )


def test_scene_shapes_and_cam_layout():
    images, cams = synthetic_scene(view_num=4, H=64, W=96, D=16, seed=1)
    assert images.shape == (1, 4, 64, 96, 3)
    assert cams.shape == (1, 4, 2, 4, 4)
    # depth row: [start, interval, num, end]
    row = cams[0, 0, 1, 3]
    assert row[2] == 16 and np.isclose(row[3], row[0] + row[1] * 16)
    ib, cb = synthetic_batch(view_num=3, B=3, H=32, W=32, D=8)
    assert ib.shape[0] == 3 and cb.shape[0] == 3
    assert not np.array_equal(ib[0], ib[1])  # distinct samples
    np.testing.assert_array_equal(cb[0], cb[1])


def test_multiplane_photometric_consistency():
    """Ref-view gt reprojected into view 1 reproduces view 1's colors and depth."""
    s = render_multiplane_scene(view_num=3, H=128, W=160, D=32, seed=3)
    imgs, cams = s["images"][0], s["cams"][0]
    gtm = s["depth_gt_metric"]
    H, W = imgs.shape[1:3]
    h, w = gtm.shape
    Kq = cams[0, 1, :3, :3].astype(np.float64)
    Kf = Kq.copy()
    Kf[:2] *= 4.0

    xs, ys = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    p = np.stack([xs, ys, np.ones_like(xs)], -1)
    # ref extrinsic is identity: camera frame == world frame
    X = (np.linalg.inv(Kq) @ p[..., None])[..., 0] * gtm[..., None]
    R1 = cams[1, 0, :3, :3].astype(np.float64)
    t1 = cams[1, 0, :3, 3].astype(np.float64)
    X1 = (R1 @ X[..., None])[..., 0] + t1
    proj = (Kf @ X1[..., None])[..., 0]
    px, py = proj[..., 0] / proj[..., 2], proj[..., 1] / proj[..., 2]
    inb = (px >= 1) & (px < W - 1) & (py >= 1) & (py < H - 1)
    assert inb.mean() > 0.5

    c_ref = _bilinear(imgs[0], 4 * xs, 4 * ys)
    c_view = _bilinear(imgs[1], px, py)
    err = np.abs(c_ref - c_view).mean(-1)[inb]
    # photometric: median near zero; mean tiny (occlusion edges excepted)
    assert err.mean() < 0.01 and np.median(err) < 0.005

    # geometric: view 1's own depth map at the projection matches X1's z
    s_views = render_multiplane_views(3, H, W, seed=3)
    d_view = _bilinear(s_views["depths"][1], px, py)
    derr = np.abs(d_view - X1[..., 2])[inb]
    assert np.median(derr) < 5e-3


def test_multiplane_views_determinism_and_gt_range():
    a = render_multiplane_views(4, 64, 96, seed=11)
    b = render_multiplane_views(4, 64, 96, seed=11)
    np.testing.assert_array_equal(a["images"], b["images"])
    c = render_multiplane_views(4, 64, 96, seed=12)
    assert not np.array_equal(a["images"], c["images"])
    assert a["depths"].min() > 0.5 and a["depths"].max() < 2.5

    s = render_multiplane_scene(view_num=3, H=64, W=96, D=16, seed=5)
    row = s["cams"][0, 0, 1, 3]
    # inverse-depth sweep covers the gt
    assert row[0] <= s["depth_gt"].min() and s["depth_gt"].max() <= row[3] + 1e-6


def test_spheres_add_curved_occluding_geometry():
    """num_spheres > 0 (VERDICT r4 item 2): curved surfaces + occlusion boundaries,
    photo-consistent across views, and num_spheres=0 leaves every existing seed's
    scene bit-identical (sphere draws happen after all plane draws)."""
    base = render_multiplane_scene(view_num=3, H=64, W=80, D=16, seed=5)
    base2 = render_multiplane_scene(view_num=3, H=64, W=80, D=16, seed=5, num_spheres=0)
    np.testing.assert_array_equal(base["images"], base2["images"])

    s = render_multiplane_scene(view_num=3, H=64, W=80, D=16, seed=5, num_spheres=3)
    gm_b, gm_s = base["depth_gt_metric"], s["depth_gt_metric"]
    changed = (np.abs(gm_b - gm_s) > 1e-3).mean()
    assert 0.05 < changed < 0.95, changed
    # curvature: along a row crossing a sphere the depth's second difference is
    # non-constant (planes have exactly zero second difference along any line)
    diff_rows = np.where((np.abs(gm_b - gm_s) > 1e-3).any(axis=1))[0]
    second = np.diff(gm_s[diff_rows[len(diff_rows) // 2]], n=2)
    assert np.abs(second).max() > 1e-4

    # occlusion-aware photo-consistency: warp view-1 color to ref via gt depth,
    # compare only where view-1's own depth agrees (visible surface)
    r = render_multiplane_views(3, 128, 160, seed=11, num_spheres=3)
    imgs, K, Rs, ts, depths = r["images"], r["K_full"], r["Rs"], r["ts"], r["depths"]
    H, W = 128, 160
    ys, xs = np.mgrid[0:H, 0:W]
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1).astype(np.float64)
    Xc = (pix @ np.linalg.inv(K).T) * depths[0][..., None]
    Xw = (Xc - ts[0]) @ Rs[0]
    X1 = Xw @ Rs[1].T + ts[1]
    p1 = X1 @ K.T
    u, v = p1[..., 0] / p1[..., 2], p1[..., 1] / p1[..., 2]
    iu = np.round(np.clip(u - 0.5, 0, W - 1)).astype(int)
    iv = np.round(np.clip(v - 0.5, 0, H - 1)).astype(int)
    inb = (u >= 1) & (u < W - 1) & (v >= 1) & (v < H - 1)
    vis = inb & (np.abs(depths[1][iv, iu] - X1[..., 2]) < 0.01 * X1[..., 2])
    assert vis.mean() > 0.6
    err = np.abs(imgs[1][iv, iu] - imgs[0])[vis].mean()
    assert err < 0.03, err
