"""Unit tests for the geometry core against small numpy/analytic oracles.

Covers the formulas at reference atvsnet/homography_warping.py (homographies, warps,
depth transforms, visual hull) and atvsnet/model.py:13-129 (soft-argmin, confidence,
align-corners upsampling).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from atvsnet_tpu.geometry.homography import get_homographies, pixel_grid, sweep_depths
from atvsnet_tpu.geometry.warp import (
    homography_warp,
    interpolate,
    plane_sweep_warp,
    transform_depth,
    warp_by_depth,
)
from atvsnet_tpu.geometry.depth_regression import (
    prob2depth,
    probability_map,
    resize_bilinear_align_corners,
    upsample_prob_vol,
)
from atvsnet_tpu.geometry.visual_hull import get_visual_hull


def make_cam(K, R, t):
    cam = np.zeros((2, 4, 4), dtype=np.float32)
    cam[0, :3, :3] = R
    cam[0, :3, 3] = t
    cam[0, 3, 3] = 1.0
    cam[1, :3, :3] = K
    return cam


def rotation(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.cos(angle / 2.0)
    b, c, d = -axis * np.sin(angle / 2.0)
    return np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * (b * c + a * d), 2 * (b * d - a * c)],
            [2 * (b * c - a * d), a * a + c * c - b * b - d * d, 2 * (c * d + a * b)],
            [2 * (b * d + a * c), 2 * (c * d - a * b), a * a + d * d - b * b - c * c],
        ]
    )


K0 = np.array([[100.0, 0.0, 32.0], [0.0, 100.0, 24.0], [0.0, 0.0, 1.0]])
R1 = rotation([0.1, 1.0, 0.05], 0.12)
T1 = np.array([0.3, -0.1, 0.05])


class TestHomographies:
    def test_identity_pair(self):
        cam = make_cam(K0, np.eye(3), np.zeros(3))[None]
        H = get_homographies(
            jnp.asarray(cam), jnp.asarray(cam), 4, jnp.array([0.1]), jnp.array([0.01])
        )
        assert H.shape == (1, 4, 3, 3)
        np.testing.assert_allclose(np.asarray(H), np.tile(np.eye(3), (1, 4, 1, 1)), atol=1e-4)

    @pytest.mark.parametrize("inverse_depth", [True, False])
    def test_maps_plane_points_between_views(self, inverse_depth):
        """Points on the fronto-parallel plane at sweep depth d must map exactly."""
        cam_l = make_cam(K0, np.eye(3), np.zeros(3))[None]
        cam_r = make_cam(K0, R1, T1)[None]
        depth_start, depth_interval = 0.25, 0.05
        D = 3
        H = np.asarray(
            get_homographies(
                jnp.asarray(cam_l),
                jnp.asarray(cam_r),
                D,
                jnp.array([depth_start]),
                jnp.array([depth_interval]),
                inverse_depth=inverse_depth,
            )
        )[0]

        rng = np.random.RandomState(0)
        for di in range(D):
            sweep_val = depth_start + di * depth_interval
            z = 1.0 / sweep_val if inverse_depth else sweep_val
            # random pixels in the left view
            uv = rng.uniform(5, 40, size=(10, 2))
            pts_l = np.concatenate([uv, np.ones((10, 1))], axis=1)  # (10, 3)
            # back-project to 3D at depth z (left cam at origin, identity R)
            X = (np.linalg.inv(K0) @ pts_l.T) * z  # (3, 10)
            # project into right cam
            x_r = K0 @ (R1 @ X + T1[:, None])
            x_r = x_r[:2] / x_r[2]
            # homography prediction
            pred = H[di] @ pts_l.T
            pred = pred[:2] / pred[2]
            np.testing.assert_allclose(pred, x_r, rtol=1e-4, atol=1e-3)


class TestInterpolate:
    def test_matches_manual_bilinear_interior(self):
        rng = np.random.RandomState(1)
        img = rng.rand(2, 8, 10, 3).astype(np.float32)
        x = rng.uniform(1.0, 8.5, size=(2, 20)).astype(np.float32)
        y = rng.uniform(1.0, 6.5, size=(2, 20)).astype(np.float32)
        out = np.asarray(interpolate(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y)))

        for b in range(2):
            for p in range(20):
                xs, ys = x[b, p] - 0.5, y[b, p] - 0.5
                x0, y0 = int(np.floor(xs)), int(np.floor(ys))
                wx, wy = xs - x0, ys - y0
                ref = (
                    img[b, y0, x0] * (1 - wy) * (1 - wx)
                    + img[b, y0, x0 + 1] * (1 - wy) * wx
                    + img[b, y0 + 1, x0] * wy * (1 - wx)
                    + img[b, y0 + 1, x0 + 1] * wy * wx
                )
                np.testing.assert_allclose(out[b, p], ref, rtol=1e-5, atol=1e-5)

    def test_out_of_bounds_bilinear_is_zero_and_masked(self):
        img = jnp.ones((1, 4, 4, 1))
        x = jnp.array([[-1.0, 10.0, 2.0, jnp.nan]])
        y = jnp.array([[2.0, 2.0, 10.0, 2.0]])
        out, mask = interpolate(img, x, y, output_mask=True)
        np.testing.assert_array_equal(np.asarray(out)[0, :, 0], 0.0)
        np.testing.assert_array_equal(np.asarray(mask)[0], False)

    def test_nearest_reads_origin_when_invalid(self):
        """Invalid nearest samples read pixel (0,0) — reference homography_warping.py:45-56."""
        img = jnp.arange(16.0).reshape(1, 4, 4, 1)
        x = jnp.array([[-3.0, 2.6]])
        y = jnp.array([[1.0, 1.4]])
        out, mask = interpolate(img, x, y, method="nearest", output_mask=True)
        out = np.asarray(out)[0, :, 0]
        assert out[0] == img[0, 0, 0, 0]  # invalid -> (0, 0)
        # valid: x-0.5=2.1 -> col 2, y-0.5=0.9 -> row 1
        assert out[1] == np.asarray(img)[0, 1, 2, 0]
        assert list(np.asarray(mask)[0]) == [False, True]


class TestWarps:
    def test_identity_homography_roundtrip(self):
        rng = np.random.RandomState(2)
        img = rng.rand(1, 8, 8, 2).astype(np.float32)
        out = np.asarray(homography_warp(jnp.asarray(img), jnp.eye(3)[None]))
        # interior pixels identical; right/bottom edges are outside the valid window
        np.testing.assert_allclose(out[0, :7, :7], img[0, :7, :7], atol=1e-5)

    def test_plane_sweep_matches_per_plane_warp(self):
        rng = np.random.RandomState(3)
        img = rng.rand(1, 12, 16, 4).astype(np.float32)
        cam_l = make_cam(K0, np.eye(3), np.zeros(3))[None]
        cam_r = make_cam(K0, R1, T1)[None]
        H = get_homographies(
            jnp.asarray(cam_l), jnp.asarray(cam_r), 5, jnp.array([0.2]), jnp.array([0.02])
        )
        vol = np.asarray(plane_sweep_warp(jnp.asarray(img), H))
        assert vol.shape == (1, 5, 12, 16, 4)
        for d in range(5):
            single = np.asarray(homography_warp(jnp.asarray(img), H[:, d]))
            np.testing.assert_allclose(vol[:, d], single, atol=1e-6)

    def test_warp_quant_int8_storage(self):
        """warp_quant=int8 (numerics scope): bilinear sweeps store on a
        per-(sample,channel) int8 lattice scaled by the SOURCE map's max-abs (an
        exact no-clip bound — bilinear weights are convex), zeros stay exactly
        zero, nearest sweeps are untouched, the default policy is bit-identical."""
        from atvsnet_tpu import numerics

        rng = np.random.RandomState(7)
        img = (rng.rand(2, 12, 16, 4).astype(np.float32) - 0.3) * 5.0
        cam_l = make_cam(K0, np.eye(3), np.zeros(3))
        cam_r = make_cam(K0, R1, T1)
        cl = jnp.asarray(np.stack([cam_l, cam_l]))
        cr = jnp.asarray(np.stack([cam_r, cam_r]))
        H = get_homographies(cl, cr, 5, jnp.array([0.2, 0.2]), jnp.array([0.02, 0.02]))

        base = np.asarray(plane_sweep_warp(jnp.asarray(img), H))
        base_n = np.asarray(plane_sweep_warp(jnp.asarray(img), H, method="nearest"))

        with numerics.scope(numerics.NumericsPolicy(warp_quant="int8")):
            q = np.asarray(plane_sweep_warp(jnp.asarray(img), H))
            q_n = np.asarray(plane_sweep_warp(jnp.asarray(img), H, method="nearest"))

        # nearest (depth-carrying) sweeps never quantize
        np.testing.assert_array_equal(base_n, q_n)
        # per-(sample, channel) lattice with the documented scale; no clipping
        s = np.abs(img).max(axis=(1, 2)) / 127.0 + 1e-12        # (B, C)
        for b in range(2):
            for c in range(4):
                k = q[b, ..., c] / s[b, c]
                np.testing.assert_allclose(k, np.round(k), atol=1e-3)
                assert np.abs(k).max() <= 127.0
        # round-trip error bounded by half a step; exact zeros preserved
        assert np.abs(base - q).max() <= s.max() * 0.51 + 1e-6
        assert np.array_equal(q[base == 0.0], np.zeros_like(q[base == 0.0]))

        with pytest.raises(ValueError, match="warp_quant"):
            numerics.NumericsPolicy(warp_quant="bogus")

        np.testing.assert_array_equal(base, np.asarray(plane_sweep_warp(jnp.asarray(img), H)))

    def test_transform_depth_consistency(self):
        """The transformed depth must equal the right-camera z of the 3D point."""
        cam_l = make_cam(K0, np.eye(3), np.zeros(3))[None]
        cam_r = make_cam(K0, R1, T1)[None]
        H, W = 6, 8
        z = 4.0
        depth = np.full((1, H, W, 1), 1.0 / z, dtype=np.float32)  # inverse depth
        out = np.asarray(
            transform_depth(jnp.asarray(depth), jnp.asarray(cam_l), jnp.asarray(cam_r))
        )
        grid = np.asarray(pixel_grid(H, W))  # (3, HW)
        X = np.linalg.inv(K0) @ grid * z
        z_r = (R1 @ X + T1[:, None])[2]
        np.testing.assert_allclose(out.reshape(-1), 1.0 / z_r, rtol=1e-4)

    def test_warp_by_depth_identity_cameras(self):
        rng = np.random.RandomState(4)
        img = rng.rand(1, 8, 8, 3).astype(np.float32)
        cam = make_cam(K0, np.eye(3), np.zeros(3))[None]
        depth = np.full((1, 8, 8, 1), 0.5, dtype=np.float32)
        out, mask = warp_by_depth(
            jnp.asarray(img), jnp.asarray(cam), jnp.asarray(cam), jnp.asarray(depth),
            output_mask=True,
        )
        out = np.asarray(out)
        np.testing.assert_allclose(out[0, :7, :7], img[0, :7, :7], atol=1e-4)


class TestDepthRegression:
    def test_prob2depth_picks_min_cost_plane(self):
        B, D, h, w = 1, 16, 4, 4
        cost = np.zeros((B, D, h, w), dtype=np.float32)
        cost[:, 5] = -50.0  # strongly minimum cost at plane 5 (softmax over -cost)
        depth_start = jnp.array([2.0])
        depth_interval = jnp.array([0.25])
        depth = np.asarray(prob2depth(jnp.asarray(cost), D, depth_start, depth_interval))
        np.testing.assert_allclose(depth, 2.0 + 5 * 0.25, atol=1e-3)

    def test_prob2depth_uniform_gives_mean(self):
        B, D, h, w = 2, 8, 2, 2
        cost = np.zeros((B, D, h, w), dtype=np.float32)
        depth_start = jnp.array([1.0, 2.0])
        depth_interval = jnp.array([0.5, 1.0])
        depth = np.asarray(prob2depth(jnp.asarray(cost), D, depth_start, depth_interval))
        sweep0 = 1.0 + np.arange(8) * 0.5
        sweep1 = 2.0 + np.arange(8) * 1.0
        np.testing.assert_allclose(depth[0], sweep0.mean(), rtol=1e-5)
        np.testing.assert_allclose(depth[1], sweep1.mean(), rtol=1e-5)

    def test_probability_map_four_bins(self):
        B, D, h, w = 1, 8, 1, 1
        pv = np.zeros((B, D, h, w), dtype=np.float32)
        pv[0, :, 0, 0] = np.arange(8) / 28.0  # normalized
        depth_map = jnp.full((B, h, w, 1), 3.4)
        out = np.asarray(
            probability_map(jnp.asarray(pv), depth_map, jnp.array([0.0]), jnp.array([1.0]))
        )
        # d_idx = 3.4 -> bins floor=3, floor-1=2, ceil=4, ceil+1=5
        expected = (3 + 2 + 4 + 5) / 28.0
        np.testing.assert_allclose(out[0, 0, 0, 0], expected, rtol=1e-5)

    def test_resize_align_corners_known_values(self):
        x = jnp.array([[0.0, 1.0]]).reshape(1, 1, 2, 1)
        out = np.asarray(resize_bilinear_align_corners(x, 1, 4))
        np.testing.assert_allclose(out[0, 0, :, 0], [0.0, 1 / 3, 2 / 3, 1.0], atol=1e-6)

    def test_resize_align_corners_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(5)
        x = rng.rand(2, 6, 7, 3).astype(np.float32)
        ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 17, 23))
        theirs = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                size=(17, 23),
                mode="bilinear",
                align_corners=True,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_upsample_prob_vol_shape(self):
        pv = jnp.zeros((1, 8, 6, 6))
        out = upsample_prob_vol(pv, 4)
        assert out.shape == (1, 8, 24, 24)


class TestVisualHull:
    def test_identical_cameras_counts_free_space(self):
        """With identical cameras the hull is (#views whose inv-depth > plane)/N."""
        B, N, H, W = 1, 3, 6, 8
        cam = make_cam(K0, np.eye(3), np.zeros(3))
        cams = np.tile(cam, (B, N, 1, 1, 1)).astype(np.float32)
        inv_depths = np.array([0.55, 0.35, 0.15], dtype=np.float32)
        depth_images = np.tile(
            inv_depths[None, :, None, None], (B, 1, H, W)
        ).astype(np.float32)
        D = 4
        depth_start = jnp.array([0.1])
        depth_interval = jnp.array([0.1])  # planes at 0.1 0.2 0.3 0.4
        hull = np.asarray(
            get_visual_hull(
                jnp.asarray(depth_images), jnp.asarray(cams), D, depth_start, depth_interval
            )
        )
        sweep = 0.1 + np.arange(D) * 0.1
        expected = np.array([(inv_depths > s).sum() / N for s in sweep])
        # identical cameras: warped view depths equal their originals on interior
        # pixels; check an interior pixel
        np.testing.assert_allclose(hull[0, :, 2, 2, 0], expected, atol=1e-5)


class TestSweepDepths:
    def test_values(self):
        out = np.asarray(sweep_depths(jnp.array([1.0, 2.0]), jnp.array([0.5, 0.1]), 3))
        np.testing.assert_allclose(out, [[1.0, 1.5, 2.0], [2.0, 2.1, 2.2]])
