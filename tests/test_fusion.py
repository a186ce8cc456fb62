"""Fusion tests on synthetic multi-view geometry with known-consistent depth maps
(acceptance rule oracle per reference fusibile/fusibile.cu:211-263)."""

import numpy as np
import pytest

from atvsnet_tpu.fusion.consistency import camera_geometry, fuse_depth_maps
from atvsnet_tpu.fusion.dmb import fake_normals, read_dmb, read_p_matrix, write_dmb, write_p_matrix
from atvsnet_tpu.fusion.ply import read_ply, write_ply

from tests._utils import make_cam, rotation


def plane_scene(V=3, H=24, W=32, z=4.0, jitter=None):
    """V cameras looking at the fronto-parallel plane z=const (world frame)."""
    K = np.array([[40.0, 0, W / 2.0], [0, 40.0, H / 2.0], [0, 0, 1.0]])
    cams, depths, images = [], [], []
    rng = np.random.RandomState(0)
    for v in range(V):
        R = rotation([0, 1, 0], 0.02 * v)
        t = np.array([0.15 * v, 0.0, 0.0])
        cams.append(make_cam(K, R, t))
        # depth of the plane z=z0 along each pixel ray: z_cam such that world z = z0.
        # For small rotations about y, z_cam = (z0 - C_z) / r3 . dir; compute exactly:
        xs, ys = np.meshgrid(np.arange(W), np.arange(H))
        pix = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float64)
        Kinv = np.linalg.inv(K)
        rays_cam = pix @ Kinv.T                       # direction in camera frame (z=1)
        rays_world = rays_cam @ R                      # R^T applied: cam->world
        C = -R.T @ t
        # world z of point = C_z + s * ray_z = z0 -> s = (z0 - C_z)/ray_z; depth = s (cam z=1 scaled)
        s = (z - C[2]) / rays_world[..., 2]
        depths.append(s.astype(np.float32))
        images.append(rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
    depths = np.stack(depths)
    if jitter is not None:
        depths = depths + jitter
    return depths, np.stack(images), np.stack(cams)


class TestCameraGeometry:
    def test_center_recovery(self):
        depths, images, cams = plane_scene(V=2)
        P, M_inv, centers, f = camera_geometry(cams)
        R = cams[1, 0, :3, :3]
        t = cams[1, 0, :3, 3]
        np.testing.assert_allclose(centers[1], -R.T @ t, atol=1e-5)
        assert f[0] == pytest.approx(40.0)


class TestFusion:
    def test_consistent_plane_accepted(self):
        depths, images, cams = plane_scene(V=3)
        points, colors = fuse_depth_maps(depths, images, cams, 0.01, 2)
        # most pixels of each ref view should fuse (plane visible in all views)
        assert points.shape[0] > 0.5 * 3 * depths.shape[1] * depths.shape[2]
        # fused points lie on the plane z = 4
        assert np.abs(points[:, 2] - 4.0).max() < 1e-2

    def test_inconsistent_rejected(self):
        depths, images, cams = plane_scene(V=3)
        bad = depths.copy()
        bad[1:] *= 1.5  # views disagree with every reference by >> disp_thresh
        points, _ = fuse_depth_maps(bad, images, cams, 0.01, 2)
        assert points.shape[0] == 0

    def test_zero_depth_filtered(self):
        depths, images, cams = plane_scene(V=3)
        depths[:, :, :16] = 0.0  # left half filtered out
        points, _ = fuse_depth_maps(depths, images, cams, 0.01, 2)
        # no emitted point may back-project from a zero-depth pixel: all fused points
        # still on the plane
        assert points.shape[0] > 0
        assert np.abs(points[:, 2] - 4.0).max() < 1e-2

    def test_zero_depth_never_emits_behind_camera(self):
        """Zero-depth ref pixels back-project to the camera CENTER; a view the
        center projects into with negative z auto-passes the signed disparity
        check (reference fusibile.cu:211 quirk, reproduced) — the emit gate must
        still drop them (review finding). Adversarial layout: view 1 BEHIND and
        facing view 0, so C_0 projects into view 1 with z < 0."""
        K = np.array([[40.0, 0, 16.0], [0, 40.0, 12.0], [0, 0, 1.0]])
        H, W = 24, 32
        rng = np.random.RandomState(0)
        cams = np.stack([
            make_cam(K, np.eye(3), np.zeros(3)),
            # 180-deg turn, placed at world z=-2 looking back toward the origin
            make_cam(K, rotation([0, 1, 0], np.pi), np.array([0.0, 0.0, -2.0])),
            make_cam(K, np.eye(3), np.array([0.1, 0.0, 0.0])),
        ])
        depths = np.zeros((3, H, W), np.float32)  # everything prob-filtered
        images = rng.randint(0, 255, (3, H, W, 3)).astype(np.uint8)
        points, _ = fuse_depth_maps(depths, images, cams, 0.01, 1)
        assert points.shape[0] == 0

    def test_num_consistent_threshold(self):
        depths, images, cams = plane_scene(V=3)
        few, _ = fuse_depth_maps(depths, images, cams, 0.01, 2)
        many, _ = fuse_depth_maps(depths, images, cams, 0.01, 3)
        assert many.shape[0] < few.shape[0]


class TestIO:
    def test_dmb_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        img = rng.rand(6, 9).astype(np.float32)
        p = str(tmp_path / "x.dmb")
        write_dmb(p, img)
        np.testing.assert_array_equal(read_dmb(p), img)

    def test_dmb_roundtrip_3ch(self, tmp_path):
        rng = np.random.RandomState(1)
        img = rng.rand(5, 7, 3).astype(np.float32)
        p = str(tmp_path / "n.dmb")
        write_dmb(p, img)
        np.testing.assert_array_equal(read_dmb(p), img)

    def test_p_matrix_roundtrip(self, tmp_path):
        P = np.arange(12, dtype=np.float64).reshape(3, 4)
        path = str(tmp_path / "cam.P")
        write_p_matrix(path, P)
        np.testing.assert_allclose(read_p_matrix(path), P)

    def test_ply_roundtrip(self, tmp_path):
        rng = np.random.RandomState(2)
        pts = rng.rand(10, 3).astype(np.float32)
        rgb = rng.randint(0, 255, (10, 3)).astype(np.uint8)
        path = str(tmp_path / "c.ply")
        write_ply(path, pts, rgb)
        pts2, rgb2 = read_ply(path)
        np.testing.assert_array_equal(pts2, pts)
        np.testing.assert_array_equal(rgb2, rgb)

    def test_fake_normals(self):
        d = np.array([[1.0, 0.0], [2.0, 3.0]], np.float32)
        n = fake_normals(d)
        assert n.shape == (2, 2, 3)
        np.testing.assert_allclose(n[0, 0], 1 / np.sqrt(3), rtol=1e-5)
        np.testing.assert_allclose(n[0, 1], 0.0)


class TestViewSelection:
    def test_angle_window(self):
        from atvsnet_tpu.fusion.consistency import select_views

        K = np.array([[40.0, 0, 16.0], [0, 40.0, 12.0], [0, 0, 1.0]])
        cams = []
        for angle_deg in [0.0, 5.0, 15.0, 45.0]:
            R = rotation([0, 1, 0], np.deg2rad(angle_deg))
            cams.append(make_cam(K, R, np.zeros(3)))
        cams = np.stack(cams)
        sel = select_views(cams, 0, width=32, height=24, min_angle_deg=10, max_angle_deg=30)
        assert list(sel) == [2]

class TestGeneralSurface:
    """Non-pipeline fusibile features: normal-angle test + depth range filter."""

    def test_normal_angle_test_accepts_aligned(self):
        depths, images, cams = plane_scene(V=3)
        V, H, W = depths.shape
        normals = np.broadcast_to(
            np.array([0.0, 0.0, 1.0], np.float32), (V, H, W, 3)
        ).copy()
        base, _ = fuse_depth_maps(depths, images, cams, 0.01, 2)
        pts, cols, nrms = fuse_depth_maps(
            depths, images, cams, 0.01, 2, normals=normals, normal_thresh_deg=10.0
        )
        assert pts.shape == base.shape
        # identical normals average back to themselves (fusibile.cu:228,243)
        np.testing.assert_allclose(nrms, np.tile([[0.0, 0.0, 1.0]], (pts.shape[0], 1)), atol=1e-5)

    def test_normal_angle_test_rejects_rotated(self):
        depths, images, cams = plane_scene(V=3)
        V, H, W = depths.shape
        normals = np.broadcast_to(
            np.array([0.0, 0.0, 1.0], np.float32), (V, H, W, 3)
        ).copy()
        a = 0.3  # rotate views 1,2 normals by ~17.2 deg about x
        normals[1:] = np.array([0.0, np.sin(a), np.cos(a)], np.float32)
        # threshold below the rotation: every ref view sees <2 consistent neighbors
        pts, _, _ = fuse_depth_maps(
            depths, images, cams, 0.01, 2, normals=normals,
            normal_thresh_deg=np.rad2deg(0.2),
        )
        assert pts.shape[0] == 0
        # threshold above: back to full consistency
        pts2, _, _ = fuse_depth_maps(
            depths, images, cams, 0.01, 2, normals=normals,
            normal_thresh_deg=np.rad2deg(0.5),
        )
        assert pts2.shape[0] > 0

    def test_depth_range_filter(self):
        depths, images, cams = plane_scene(V=3, z=4.0)
        none, _ = fuse_depth_maps(depths, images, cams, 0.01, 2, depth_max=3.0)
        assert none.shape[0] == 0
        same, _ = fuse_depth_maps(depths, images, cams, 0.01, 2, depth_min=3.0, depth_max=5.0)
        base, _ = fuse_depth_maps(depths, images, cams, 0.01, 2)
        assert same.shape == base.shape


def test_fuse_chunked_matches_per_ref():
    """ref_chunk > 1 (batched refs + pipelined compaction) emits the same points as
    the per-ref path, including with a padded tail chunk (V not divisible by chunk).

    Equality is to float tolerance, not bitwise: vmapping the ref axis lets XLA
    batch the reprojection einsums, which reorders the contractions (last-ulp
    differences in X; the emit decisions themselves are threshold tests far from
    the boundary on this scene, so the point SET is stable)."""
    depths, images, cams = plane_scene(V=4)

    p1, c1 = fuse_depth_maps(depths, images, cams, ref_chunk=1)
    for chunk in (3, 64):
        p, c = fuse_depth_maps(depths, images, cams, ref_chunk=chunk)
        assert p.shape == p1.shape, (chunk, p.shape, p1.shape)
        np.testing.assert_allclose(p, p1, atol=1e-5)
        np.testing.assert_array_equal(c, c1)


def test_uint8_and_float32_images_identical():
    """Images upload in their storage dtype (uint8 from decoded jpgs, 1/4 the
    H2D bytes) and are cast to f32 on device — byte-identical clouds to the
    float32-input path since 0..255 integers are exact in f32."""
    depths, images, cams = plane_scene(V=3)
    img8 = images.astype(np.uint8)
    p1, c1 = fuse_depth_maps(depths, img8, cams)
    p2, c2 = fuse_depth_maps(depths, img8.astype(np.float32), cams)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(c1, c2)


def test_flat_and_batched_gather_match(monkeypatch):
    """The flat view-folded gather and the per-view batched gather (the
    _FLAT_GATHER_MAX_TABLE_BYTES perf switch) must produce identical fused
    clouds: same corner rows, same weights — only the gather's addressing
    differs."""
    import atvsnet_tpu.fusion.consistency as consistency

    depths, images, cams = plane_scene(V=4)
    p_flat, c_flat = fuse_depth_maps(depths, images, cams)
    monkeypatch.setattr(consistency, "_FLAT_GATHER_MAX_TABLE_BYTES", 0)
    p_batched, c_batched = fuse_depth_maps(depths, images, cams)
    assert p_flat.shape == p_batched.shape
    np.testing.assert_allclose(p_flat, p_batched, atol=1e-5)
    np.testing.assert_array_equal(c_flat, c_batched)


def test_sparse_compaction_matches_dense():
    """Occupancy compaction (compact='always': padded valid-pixel lists instead
    of the dense grid) must emit the SAME points in the same order as the dense
    path — filtered pixels never emit and the sampled tables stay dense, so the
    per-pixel check math is identical, just gathered."""
    rng = np.random.RandomState(7)
    for drop in (0.0, 0.3, 0.8):
        depths, images, cams = plane_scene(V=4)
        mask = rng.rand(*depths.shape) < drop
        depths = np.where(mask, 0.0, depths).astype(np.float32)
        p_dense, c_dense = fuse_depth_maps(depths, images, cams, compact="never")
        p_sparse, c_sparse = fuse_depth_maps(depths, images, cams, compact="always")
        assert p_dense.shape == p_sparse.shape, drop
        np.testing.assert_allclose(p_sparse, p_dense, atol=1e-5)
        np.testing.assert_array_equal(c_sparse, c_dense)


def test_sparse_compaction_normals_path():
    """The generic gipuma surface (normals + angle threshold) through the sparse
    path: same points/colors/normals as dense."""
    depths, images, cams = plane_scene(V=3)
    rng = np.random.RandomState(3)
    depths = np.where(rng.rand(*depths.shape) < 0.4, 0.0, depths).astype(np.float32)
    from atvsnet_tpu.fusion.dmb import fake_normals

    normals = np.stack([fake_normals(d) for d in depths])
    args = dict(disp_thresh=0.01, num_consistent=2, normals=normals,
                normal_thresh_deg=30.0)
    pd, cd, nd = fuse_depth_maps(depths, images, cams, compact="never", **args)
    ps, cs, ns = fuse_depth_maps(depths, images, cams, compact="always", **args)
    assert pd.shape == ps.shape
    np.testing.assert_allclose(ps, pd, atol=1e-5)
    np.testing.assert_array_equal(cs, cd)
    np.testing.assert_allclose(ns, nd, atol=1e-6)


def test_sparse_bucket_quantization():
    """Padded sizes quantize to <= 8 program shapes per resolution and clamp to
    the dense grid size."""
    from atvsnet_tpu.fusion.consistency import _sparse_bucket

    hw = 480 * 896
    g = hw // 8
    assert _sparse_bucket(1, hw) == g
    assert _sparse_bucket(g, hw) == g
    assert _sparse_bucket(g + 1, hw) == 2 * g
    assert _sparse_bucket(hw, hw) == hw
    assert _sparse_bucket(hw - 1, hw) == hw
    assert len({_sparse_bucket(n, hw) for n in range(1, hw + 1, 4096)}) <= 8
    # tiny scenes: floor keeps the bucket at the dense size (no benefit, no harm)
    assert _sparse_bucket(100, 768) == 768


def test_sparse_auto_uses_compaction_at_low_occupancy(monkeypatch):
    """compact='auto' routes a mostly-filtered large-ish scene through the
    sparse chunk kernel (tracked by monkeypatching the dispatch)."""
    import atvsnet_tpu.fusion.consistency as consistency

    depths, images, cams = plane_scene(V=3, H=24, W=32)
    rng = np.random.RandomState(0)
    depths = np.where(rng.rand(*depths.shape) < 0.9, 0.0, depths).astype(np.float32)
    calls = {"sparse": 0, "dense": 0}
    real_sparse = consistency._fuse_ref_chunk_sparse
    real_dense = consistency._fuse_ref_chunk

    def spy_sparse(*a, **k):
        calls["sparse"] += 1
        return real_sparse(*a, **k)

    def spy_dense(*a, **k):
        calls["dense"] += 1
        return real_dense(*a, **k)

    monkeypatch.setattr(consistency, "_fuse_ref_chunk_sparse", spy_sparse)
    monkeypatch.setattr(consistency, "_fuse_ref_chunk", spy_dense)
    # shrink the bucket floor so the 24x32 test scene can exercise the auto path
    monkeypatch.setattr(consistency, "_sparse_bucket",
                        lambda mv, hw: min(hw, -(-mv // 96) * 96))
    fuse_depth_maps(depths, images, cams, compact="auto")
    assert calls["sparse"] > 0 and calls["dense"] == 0
    calls["sparse"] = calls["dense"] = 0
    fuse_depth_maps(depths, images, cams, compact="never")
    assert calls["dense"] > 0 and calls["sparse"] == 0
