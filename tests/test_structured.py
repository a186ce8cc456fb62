"""Structured (broadcast-free) conv paths must match the materialized reference forms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from atvsnet_tpu.nn import layers as L
from atvsnet_tpu.nn.crm import crm, init_crm
from atvsnet_tpu.nn.refine import init_refine_net, refine_net

KEY = jax.random.PRNGKey(0)


class TestConv3dMixed:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_materialized_concat(self, stride):
        rng = np.random.RandomState(0)
        B, D, h, w = 2, 8, 8, 8
        Cv, Cc, Co = 3, 5, 4
        vary = jnp.asarray(rng.rand(B, D, h, w, Cv).astype(np.float32))
        const = jnp.asarray(rng.rand(B, h, w, Cc).astype(np.float32))
        wk = jnp.asarray(rng.rand(3, 3, 3, Cv + Cc, Co).astype(np.float32) - 0.5)

        full = jnp.concatenate(
            [vary, jnp.broadcast_to(const[:, None], (B, D, h, w, Cc))], axis=-1
        )
        expected = L.conv(full, wk, stride=stride)
        got = L.conv3d_mixed(wk, vary, const, stride=stride)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-5)


class TestStructuredCRM:
    def test_matches_concat_input(self):
        rng = np.random.RandomState(1)
        B, D, h, w, F = 1, 8, 8, 8, 4
        p = init_crm(KEY, in_channels=2 * F, base_filter=4, prob_output=True)
        warped = jnp.asarray(rng.rand(B, D, h, w, F).astype(np.float32))
        ref2d = jnp.asarray(rng.rand(B, h, w, F).astype(np.float32))

        full = jnp.concatenate(
            [jnp.broadcast_to(ref2d[:, None], (B, D, h, w, F)), warped], axis=-1
        )
        f_ref, prob_ref = crm(p, full)
        f_got, prob_got = crm(p, (warped, ref2d))
        np.testing.assert_allclose(np.asarray(f_got), np.asarray(f_ref), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(prob_got), np.asarray(prob_ref), rtol=2e-4, atol=2e-5)


class TestStructuredRefineNet:
    def test_matches_concat_groups(self):
        rng = np.random.RandomState(2)
        B, D, h, w, F = 1, 8, 8, 8, 4
        photo_ch, geo_ch = 3 * F, F + 3
        p = init_refine_net(KEY, photo_ch=photo_ch, geo_ch=geo_ch, base_filter=4)

        cost_vol_photo = jnp.asarray(rng.rand(B, D, h, w, F).astype(np.float32))
        photo_err = jnp.asarray(rng.rand(B, h, w, F).astype(np.float32))
        shallow_ref = jnp.asarray(rng.rand(B, h, w, F).astype(np.float32))
        geo_ref = jnp.asarray(rng.rand(B, D, h, w, 1).astype(np.float32))
        geo_view = jnp.asarray(rng.rand(B, D, h, w, 1).astype(np.float32))
        geo_err = jnp.asarray(rng.rand(B, h, w, 1).astype(np.float32))
        depth_ref = jnp.asarray(rng.rand(B, h, w, 1).astype(np.float32))
        prob_vol = jnp.asarray(rng.rand(B, D, h, w, 1).astype(np.float32))
        vis_hull = jnp.asarray(rng.rand(B, D, h, w, 1).astype(np.float32))

        # reference-form materialized groups (model.py:329-337)
        bc = lambda x: jnp.broadcast_to(x[:, None], (B, D, h, w, x.shape[-1]))
        photo_full = jnp.concatenate([cost_vol_photo, bc(photo_err), bc(shallow_ref)], -1)
        geo_full = jnp.concatenate(
            [geo_ref, jnp.broadcast_to(geo_view, (B, D, h, w, F)), bc(geo_err), bc(depth_ref)], -1
        )
        c_ref, pr_ref = refine_net(p, photo_full, geo_full, prob_vol, vis_hull)

        photo_s = (cost_vol_photo, jnp.concatenate([photo_err, shallow_ref], -1))
        geo_s = (
            jnp.concatenate([geo_ref, geo_view], -1),
            jnp.concatenate([geo_err, depth_ref], -1),
            F,
        )
        c_got, pr_got = refine_net(p, photo_s, geo_s, prob_vol, vis_hull)
        np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(pr_got), np.asarray(pr_ref), rtol=2e-4, atol=2e-5)


class TestTiledUpsample:
    def test_matches_materialized(self):
        from atvsnet_tpu.geometry.depth_regression import (
            prob2depth,
            prob2depth_upsample,
            upsample_prob_vol,
        )

        rng = np.random.RandomState(3)
        pv = jnp.asarray(rng.rand(2, 16, 12, 20).astype(np.float32))
        ds = jnp.array([0.5, 1.0])
        di = jnp.array([0.05, 0.1])
        pv_up = upsample_prob_vol(pv, 4)
        d_ref, c_ref = prob2depth(pv_up, 16, ds, di, True)
        _, d_up, _, c_up = prob2depth_upsample(pv, 16, ds, di, out_prob_map=True)
        np.testing.assert_allclose(np.asarray(d_up), np.asarray(d_ref), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_up), np.asarray(c_ref), rtol=1e-5, atol=1e-5)


class TestFusedNearestWarp:
    def test_matches_separate_warps(self):
        from atvsnet_tpu.geometry.homography import get_homographies
        from atvsnet_tpu.geometry.warp import plane_sweep_warp, plane_sweep_warp_with_nearest
        from tests._utils import synthetic_scene

        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(1, 12, 16, 5).astype(np.float32))
        _, cams = synthetic_scene(view_num=2, H=48, W=64, D=6)
        cams = jnp.asarray(cams)
        H6 = get_homographies(cams[:, 0], cams[:, 1], 6, jnp.array([0.4]), jnp.array([0.05]))

        bi, near, mask = plane_sweep_warp_with_nearest(img, H6)
        bi_ref, mask_ref = plane_sweep_warp(img, H6, output_mask=True)
        near_ref = plane_sweep_warp(img, H6, method="nearest")
        np.testing.assert_allclose(np.asarray(bi), np.asarray(bi_ref), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
        np.testing.assert_allclose(np.asarray(near), np.asarray(near_ref), atol=1e-6)

    def test_refinement_hull_matches_get_visual_hull(self):
        """The inline pair visual hull must equal geometry.get_visual_hull."""
        from atvsnet_tpu.geometry.visual_hull import get_visual_hull
        from atvsnet_tpu.geometry.warp import (
            plane_sweep_warp_with_nearest,
            transform_depth,
        )
        from atvsnet_tpu.geometry.homography import get_homographies, sweep_depths
        from tests._utils import synthetic_scene

        rng = np.random.RandomState(1)
        B, h, w, D = 1, 12, 16, 6
        _, cams = synthetic_scene(view_num=2, H=48, W=64, D=D)
        cams = jnp.asarray(cams)
        ds, di = jnp.array([0.4]), jnp.array([0.05])
        depth_ref = jnp.asarray((0.4 + 0.3 * rng.rand(B, h, w, 1)).astype(np.float32))
        depth_view = jnp.asarray((0.4 + 0.3 * rng.rand(B, h, w, 1)).astype(np.float32))

        pair_depths = jnp.stack([depth_ref[..., 0], depth_view[..., 0]], axis=1)
        pair_cams = jnp.stack([cams[:, 0], cams[:, 1]], axis=1)
        hull_ref = get_visual_hull(pair_depths, pair_cams, D, ds, di, ref_id=0)

        homos = get_homographies(cams[:, 0], cams[:, 1], D, ds, di)
        dvt = transform_depth(depth_view, cams[:, 1], cams[:, 0])
        _, near, _ = plane_sweep_warp_with_nearest(dvt, homos)
        sweep = sweep_depths(ds, di, D)[:, :, None, None]

        def free_space(d):
            return jnp.where((d > 0) & (d > sweep), 1.0, 0.0)

        hull_inline = (
            free_space(jnp.broadcast_to(depth_ref[..., 0][:, None], (B, D, h, w)))
            + free_space(near[..., 0])
        ) / 2.0
        np.testing.assert_allclose(
            np.asarray(hull_inline), np.asarray(hull_ref)[..., 0], atol=1e-6
        )
