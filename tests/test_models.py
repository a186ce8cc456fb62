"""End-to-end model tests at tiny shapes (jitted, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.models.tvsnet import init_params, two_view_forward, tvsnet_base, extract_features
from atvsnet_tpu.models.atvsnet import multi_view_forward, sweep_to_depth

from tests._utils import synthetic_scene

CFG2 = PipelineConfig(view_num=2, max_d=8, max_h=32, max_w=32)
CFG3 = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)


@pytest.fixture(scope="module")
def params2():
    return init_params(jax.random.PRNGKey(0), CFG2)


class TestTwoView:
    def test_forward_shapes_and_finite(self, params2):
        images, cams = synthetic_scene(view_num=2, H=32, W=32, D=8)
        out = jax.jit(lambda p, i, c: two_view_forward(p, i, c, CFG2))(
            params2, jnp.asarray(images), jnp.asarray(cams)
        )
        assert out["depth"].shape == (1, 8, 8, 1)
        assert out["depth_up"].shape == (1, 32, 32, 1)
        assert out["refined_prob_vol"].shape == (1, 8, 8, 8)
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()

    def test_depth_within_sweep_range(self, params2):
        images, cams = synthetic_scene(view_num=2, H=32, W=32, D=8)
        out = jax.jit(lambda p, i, c: two_view_forward(p, i, c, CFG2))(
            params2, jnp.asarray(images), jnp.asarray(cams)
        )
        d = np.asarray(out["depth"])
        # soft-argmin is a convex combination of the sweep values
        assert d.min() >= 0.5 - 1e-5
        assert d.max() <= 0.5 + 0.05 * 7 + 1e-5

    def test_base_outputs(self, params2):
        images, cams = synthetic_scene(view_num=2, H=32, W=32, D=8)
        feats = extract_features(params2, jnp.asarray(images), CFG2)
        out = tvsnet_base(
            params2, feats[:, 0], feats[:, 1],
            jnp.asarray(cams)[:, 0], jnp.asarray(cams)[:, 1],
            CFG2, jnp.array([0.5]), jnp.array([0.05]), siamese=True,
        )
        assert out.filtered_cost.shape == (1, 8, 8, 8, CFG2.crm_base_filter)
        assert out.prob_volume.shape == (1, 8, 8, 8)
        assert out.depth_view.shape == (1, 8, 8, 1)


class TestMultiView:
    def test_forward_shapes_and_finite(self):
        params = init_params(jax.random.PRNGKey(1), CFG3)
        images, cams = synthetic_scene(view_num=3, H=32, W=32, D=8)
        out = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, CFG3, out_prob_map=True))(
            params, jnp.asarray(images), jnp.asarray(cams)
        )
        assert out["depth"].shape == (1, 8, 8, 1)
        assert out["depth_up"].shape == (1, 32, 32, 1)
        assert out["confidence"].shape == (1, 8, 8, 1)
        assert out["depth_views"].shape == (2, 1, 8, 8, 1)
        assert out["refined_prob_volumes"].shape == (2, 1, 8, 8, 8)
        for k, v in out.items():
            assert np.isfinite(np.asarray(v)).all(), k
        # confidence sums 4 softmax bins; bins can be double-counted at integer
        # plane indices (reference model.py:42-45), so the bound is 2, not 1
        conf = np.asarray(out["confidence"])
        assert (conf >= 0).all() and (conf <= 2.0 + 1e-5).all()

    def test_bfloat16_compute_runs(self):
        cfg = CFG3.replace(compute_dtype="bfloat16")
        params = init_params(jax.random.PRNGKey(1), cfg)
        images, cams = synthetic_scene(view_num=3, H=32, W=32, D=8)
        out = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg))(
            params, jnp.asarray(images), jnp.asarray(cams)
        )
        assert np.isfinite(np.asarray(out["depth"], dtype=np.float32)).all()


class TestSweepToDepth:
    def test_inverse(self):
        x = jnp.array([0.5, 2.0, 0.0, -1.0])
        out = np.asarray(sweep_to_depth(x, True))
        np.testing.assert_allclose(out, [2.0, 0.5, 0.0, 0.0])

    def test_metric_identity(self):
        x = jnp.array([1.0, 2.0])
        np.testing.assert_allclose(np.asarray(sweep_to_depth(x, False)), [1.0, 2.0])


class TestEightViews:
    def test_eval_default_view_count(self):
        """view_num=8 (the eval driver default, reference eval_pointcloud.py:43)."""
        cfg = PipelineConfig(view_num=8, max_d=8, max_h=32, max_w=32)
        params = init_params(jax.random.PRNGKey(2), cfg)
        images, cams = synthetic_scene(view_num=8, H=32, W=32, D=8)
        out = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg))(
            params, jnp.asarray(images), jnp.asarray(cams)
        )
        assert out["depth"].shape == (1, 8, 8, 1)
        assert out["depth_views"].shape == (7, 1, 8, 8, 1)
        assert np.isfinite(np.asarray(out["depth"])).all()

class TestReferenceCompat:
    """cfg.reference_compat reproduces the reference's visual-hull camera bug.

    The reference's per-pair refinement hands the FULL cams stack to get_visual_hull
    with view_num=2 (model.py:321-324), so the hull's view term always uses camera
    index 1 — even for pairs (0,2)..(0,N-1).
    """

    def _refine_inputs(self, seed=3):
        from atvsnet_tpu.models.tvsnet import refinement  # noqa: F401

        cfg = CFG3
        params = init_params(jax.random.PRNGKey(2), cfg)
        rng = np.random.RandomState(seed)
        B, h, w, D = 1, 8, 8, 8
        F = cfg.shallow_base_filter
        _, cams = synthetic_scene(view_num=3, H=32, W=32, D=D)
        inputs = dict(
            depth_ref=jnp.asarray((0.5 + 0.3 * rng.rand(B, h, w, 1)).astype(np.float32)),
            depth_view=jnp.asarray((0.5 + 0.3 * rng.rand(B, h, w, 1)).astype(np.float32)),
            shallow_ref=jnp.asarray(rng.rand(B, h, w, F).astype(np.float32)),
            shallow_view=jnp.asarray(rng.rand(B, h, w, F).astype(np.float32)),
            prob_vol=jnp.asarray(rng.rand(B, D, h, w).astype(np.float32)),
        )
        return cfg, params, jnp.asarray(cams), inputs

    def test_own_camera_matches_fused_path(self):
        """hull_view_cam == the pair's own camera must equal the default fused hull."""
        from atvsnet_tpu.models.tvsnet import refinement

        cfg, params, cams, z = self._refine_inputs()
        ds, di = jnp.array([0.5]), jnp.array([0.05])
        args = (
            params, z["depth_ref"], z["depth_view"], cams[:, 0], cams[:, 1],
            z["shallow_ref"], z["shallow_view"], z["prob_vol"], cfg, ds, di,
        )
        cost_a, prob_a = refinement(*args)
        cost_b, prob_b = refinement(*args, hull_view_cam=cams[:, 1])
        np.testing.assert_allclose(np.asarray(prob_a), np.asarray(prob_b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cost_a), np.asarray(cost_b), atol=1e-5)

    def test_wrong_camera_changes_pair02(self):
        """For pair (0,2), the buggy hull camera (index 1) must change the output."""
        from atvsnet_tpu.models.tvsnet import refinement

        cfg, params, cams, z = self._refine_inputs()
        ds, di = jnp.array([0.5]), jnp.array([0.05])
        args = (
            params, z["depth_ref"], z["depth_view"], cams[:, 0], cams[:, 2],
            z["shallow_ref"], z["shallow_view"], z["prob_vol"], cfg, ds, di,
        )
        _, prob_fixed = refinement(*args)
        _, prob_buggy = refinement(*args, hull_view_cam=cams[:, 1])
        assert not np.allclose(np.asarray(prob_fixed), np.asarray(prob_buggy), atol=1e-6)

    def test_multiview_compat_noop_when_cam2_equals_cam1(self):
        """With cams[2] == cams[1] the reference bug is invisible: compat == default."""
        params = init_params(jax.random.PRNGKey(1), CFG3)
        images, cams = synthetic_scene(view_num=3, H=32, W=32, D=8)
        cams = cams.copy()
        cams[:, 2] = cams[:, 1]
        out_a = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, CFG3))(
            params, jnp.asarray(images), jnp.asarray(cams)
        )
        cfg_c = CFG3.replace(reference_compat=True)
        out_b = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg_c))(
            params, jnp.asarray(images), jnp.asarray(cams)
        )
        np.testing.assert_allclose(
            np.asarray(out_a["depth_up"]), np.asarray(out_b["depth_up"]), atol=1e-5
        )

    def test_multiview_compat_changes_distinct_cams(self):
        params = init_params(jax.random.PRNGKey(1), CFG3)
        images, cams = synthetic_scene(view_num=3, H=32, W=32, D=8)
        out_a = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, CFG3))(
            params, jnp.asarray(images), jnp.asarray(cams)
        )
        cfg_c = CFG3.replace(reference_compat=True)
        out_b = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg_c))(
            params, jnp.asarray(images), jnp.asarray(cams)
        )
        assert not np.allclose(
            np.asarray(out_a["depth"]), np.asarray(out_b["depth"]), atol=1e-7
        )
