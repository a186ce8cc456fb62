"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from atvsnet_tpu.config import PipelineConfig, TrainConfig
from atvsnet_tpu.models.atvsnet import multi_view_forward
from atvsnet_tpu.models.train import TrainState, jit_sharded_train_step, make_optimizer, train_step
from atvsnet_tpu.models.tvsnet import init_params
from atvsnet_tpu.parallel.mesh import auto_mesh_shape, make_mesh
from atvsnet_tpu.parallel.pipeline import jit_sharded_forward, multi_view_forward_spmd

from tests._utils import synthetic_scene

CFG = PipelineConfig(view_num=5, max_d=8, max_h=32, max_w=32)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def scene():
    images, cams = synthetic_scene(view_num=5, H=32, W=32, D=8)
    return jnp.asarray(images), jnp.asarray(cams)


class TestMeshShapes:
    def test_auto_mesh_shape(self):
        assert auto_mesh_shape(8, 4) == (2, 4)
        assert auto_mesh_shape(4, 4) == (1, 4)
        assert auto_mesh_shape(2, 4) == (1, 2)
        assert auto_mesh_shape(1, 4) == (1, 1)
        assert auto_mesh_shape(8, 7) == (8, 1)


class TestSPMDForward:
    def test_matches_scan_pipeline_unsharded(self, params, scene):
        images, cams = scene
        out_scan = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, CFG))(params, images, cams)
        out_vmap = jax.jit(lambda p, i, c: multi_view_forward_spmd(p, i, c, CFG))(params, images, cams)
        np.testing.assert_allclose(
            np.asarray(out_scan["depth"]), np.asarray(out_vmap["depth"]), rtol=5e-4, atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_scan["depth_views"]), np.asarray(out_vmap["depth_views"]),
            rtol=5e-4, atol=5e-5,
        )

    def test_matches_scan_pipeline_act_quant(self, params, scene):
        """SPMD == scan under act_quant too (both pipelines route through
        the same nn modules, so the quantized-link ops must not drift between
        them the way the softargmin impl once did — VERDICT r2 item 3). The
        quant mode arrives via PipelineConfig — the entry points install the
        numerics scope themselves."""
        images, cams = scene
        cfg = CFG.replace(act_quant="int8mxu")
        out_scan = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg))(params, images, cams)
        out_vmap = jax.jit(lambda p, i, c: multi_view_forward_spmd(p, i, c, cfg))(params, images, cams)
        np.testing.assert_allclose(
            np.asarray(out_scan["depth"]), np.asarray(out_vmap["depth"]), rtol=5e-4, atol=5e-5
        )
        assert np.isfinite(np.asarray(out_vmap["depth_up"])).all()

    def test_matches_scan_pipeline_reference_compat(self, params, scene):
        """reference_compat=True must produce the SAME visual-hull camera choice on
        both paths (review finding: the SPMD path used each pair's own view camera
        while the scan path pinned camera 1 like the reference)."""
        images, cams = scene
        cfg = CFG.replace(reference_compat=True)
        out_scan = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg))(params, images, cams)
        out_vmap = jax.jit(lambda p, i, c: multi_view_forward_spmd(p, i, c, cfg))(params, images, cams)
        np.testing.assert_allclose(
            np.asarray(out_scan["depth"]), np.asarray(out_vmap["depth"]), rtol=5e-4, atol=5e-5
        )

    def test_sharded_forward_matches_single_device(self, params, scene):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        images, cams = scene
        images2 = jnp.concatenate([images, images], axis=0)
        cams2 = jnp.concatenate([cams, cams], axis=0)
        mesh = make_mesh(2, 4)
        fwd = jit_sharded_forward(mesh, CFG)
        out = fwd(params, images2, cams2)
        single = jax.jit(lambda p, i, c: multi_view_forward_spmd(p, i, c, CFG))(params, images, cams)
        got = np.asarray(out["depth"])
        np.testing.assert_allclose(got[0], np.asarray(single["depth"])[0], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(got[1], got[0], rtol=1e-5, atol=1e-6)


class TestDepthSharding:
    def test_depth_sharded_forward_matches_unsharded(self, params, scene):
        """'depth' mesh axis (SURVEY §2.3 iii): D planes sharded over 4 devices,
        halo exchanges inserted by the partitioner, numerics preserved."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from jax.sharding import NamedSharding, PartitionSpec as P

        images, cams = scene
        mesh = make_mesh(1, 2, n_depth=4)
        assert mesh.axis_names == ("data", "view", "depth")
        fwd = jax.jit(
            lambda p, i, c: multi_view_forward_spmd(p, i, c, CFG, mesh),
            in_shardings=(NamedSharding(mesh, P()),) * 3,
        )
        out = fwd(params, images, cams)
        single = jax.jit(lambda p, i, c: multi_view_forward_spmd(p, i, c, CFG))(
            params, images, cams
        )
        np.testing.assert_allclose(
            np.asarray(out["depth"]), np.asarray(single["depth"]), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["depth_agg_initial"]), np.asarray(single["depth_agg_initial"]),
            rtol=1e-3, atol=1e-4,
        )


class TestTraining:
    def test_train_step_updates_params_and_finite(self, params, scene):
        images, cams = scene
        tcfg = TrainConfig(learning_rate=1e-3)
        tx = make_optimizer(tcfg)
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        rng = np.random.RandomState(0)
        gt = (0.5 + 0.3 * rng.rand(1, 8, 8, 1)).astype(np.float32)
        batch = {"images": images, "cams": cams, "depth_gt": jnp.asarray(gt)}
        step = jax.jit(lambda s, b: train_step(s, b, CFG, tcfg, tx))
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1
        # at least one weight moved
        w0 = np.asarray(params["crm"]["conv_b0_1_0"]["w"])
        w1 = np.asarray(state2.params["crm"]["conv_b0_1_0"]["w"])
        assert not np.allclose(w0, w1)

    def test_confidence_term_sharpens_loss_and_logs_metric(self, params, scene):
        """loss_weight_confidence adds w*(1 - mean conf) and a 'confidence'
        metric; the term must be strictly positive (conf < 1 at init) and
        carry gradient (weights move differently than without it)."""
        images, cams = scene
        rng = np.random.RandomState(0)
        gt = (0.5 + 0.3 * rng.rand(1, 8, 8, 1)).astype(np.float32)
        batch = {"images": images, "cams": cams, "depth_gt": jnp.asarray(gt)}

        tcfg0 = TrainConfig(learning_rate=1e-3)
        tcfg1 = TrainConfig(learning_rate=1e-3, loss_weight_confidence=0.5)
        tx = make_optimizer(tcfg0)
        s0 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        _, m0 = jax.jit(lambda s, b: train_step(s, b, CFG, tcfg0, tx))(s0, batch)
        s0 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        s1, m1 = jax.jit(lambda s, b: train_step(s, b, CFG, tcfg1, tx))(s0, batch)
        conf = float(m1["confidence"])
        assert 0.0 < conf < 1.0
        assert "confidence" not in m0
        np.testing.assert_allclose(
            float(m1["loss"]), float(m0["loss"]) + 0.5 * (1.0 - conf), rtol=1e-4
        )
        assert np.isfinite(float(m1["loss"]))

    def test_sharded_train_step_runs(self, scene):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(2, 4)
        tcfg = TrainConfig()
        tx = make_optimizer(tcfg)
        params = init_params(jax.random.PRNGKey(1), CFG)
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        images, cams = scene
        images2 = jnp.concatenate([images, images], axis=0)
        cams2 = jnp.concatenate([cams, cams], axis=0)
        rng = np.random.RandomState(1)
        gt = (0.5 + 0.3 * rng.rand(2, 8, 8, 1)).astype(np.float32)
        batch = {"images": images2, "cams": cams2, "depth_gt": jnp.asarray(gt)}
        step = jit_sharded_train_step(mesh, CFG, tcfg, tx)
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*[jnp.asarray(a) if isinstance(a, np.ndarray) else a for a in args])
        assert np.isfinite(np.asarray(out)).all()

    def test_dryrun_multichip(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestSPMDConfidence:
    def test_out_prob_map(self, params, scene):
        images, cams = scene
        out = jax.jit(
            lambda p, i, c: multi_view_forward_spmd(p, i, c, CFG, out_prob_map=True)
        )(params, images, cams)
        assert out["confidence"].shape == (1, 8, 8, 1)
        assert out["confidence_up"].shape == (1, 32, 32, 1)
        assert np.isfinite(np.asarray(out["confidence"])).all()


class TestRemat:
    def test_remat_train_step_matches(self, params, scene):
        """jax.checkpoint on the per-pair stages must not change gradients."""
        images, cams = scene
        tcfg = TrainConfig(learning_rate=1e-3)
        tx = make_optimizer(tcfg)
        rng = np.random.RandomState(0)
        gt = (0.5 + 0.3 * rng.rand(1, 8, 8, 1)).astype(np.float32)
        batch = {"images": images, "cams": cams, "depth_gt": jnp.asarray(gt)}

        cfg_r = CFG.replace(remat=True)
        s0 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        _, m_plain = jax.jit(lambda s, b: train_step(s, b, CFG, tcfg, tx))(s0, batch)
        s0 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        _, m_remat = jax.jit(lambda s, b: train_step(s, b, cfg_r, tcfg, tx))(s0, batch)
        np.testing.assert_allclose(
            float(m_plain["loss"]), float(m_remat["loss"]), rtol=1e-5
        )

class TestAuxViewLoss:
    def test_zero_for_perfect_consistent_depths(self):
        """Lateral-translation rig + constant-depth plane: view depths == gt in each
        frame, z unchanged by the translation -> aux term must be exactly zero."""
        from atvsnet_tpu.models.train import aux_view_loss
        from tests._utils import make_cam

        B, h, w, N = 1, 8, 8, 3
        K = np.array([[8.0, 0.0, 4.0], [0.0, 8.0, 4.0], [0.0, 0.0, 1.0]])
        cams = np.stack(
            [
                make_cam(K, np.eye(3), np.array([0.2 * v, 0.0, 0.0]),
                         depth_start=0.5, depth_interval=0.05, num_d=8)
                for v in range(N)
            ]
        )[None].astype(np.float32)
        inv_depth = 0.8  # constant plane, sweep (inverse-depth) space
        gt = np.full((B, h, w, 1), inv_depth, np.float32)
        depth_views = np.full((N - 1, B, h, w, 1), inv_depth, np.float32)
        aux = aux_view_loss(
            jnp.asarray(depth_views), jnp.asarray(cams), jnp.asarray(gt),
            jnp.array([0.05]), CFG,
        )
        assert float(aux) == 0.0

    def test_nonzero_for_wrong_depths(self):
        from atvsnet_tpu.models.train import aux_view_loss
        from tests._utils import synthetic_scene

        _, cams = synthetic_scene(view_num=3, H=32, W=32, D=8)
        B, h, w = 1, 8, 8
        gt = np.full((B, h, w, 1), 0.8, np.float32)
        depth_views = np.full((2, B, h, w, 1), 0.6, np.float32)
        aux = aux_view_loss(
            jnp.asarray(depth_views), jnp.asarray(cams), jnp.asarray(gt),
            jnp.array([0.05]), CFG,
        )
        assert float(aux) > 0.1
