"""DepthEstimator serving API: preprocessing parity, shapes, view padding, reuse."""

import numpy as np
import pytest

from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.serving import DepthEstimator
from tests._utils import synthetic_scene


def _scene_arrays(view_num, H, W, D, seed=3):
    """Raw (pre-normalization) images + metric-depth cams for the serving input."""
    rng = np.random.RandomState(seed)
    images = [rng.randint(0, 255, size=(H, W, 3)).astype(np.uint8) for _ in range(view_num)]
    cams = []
    for v in range(view_num):
        cam = np.zeros((2, 4, 4), np.float32)
        cam[0] = np.eye(4)
        cam[0, 0, 3] = 0.02 * v
        cam[1, :3, :3] = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]])
        cam[1, 3] = (1.0, 0.0, D, 4.0)  # metric range [1, 4], D planes
        cams.append(cam)
    return images, cams


@pytest.fixture(scope="module")
def estimator():
    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    return DepthEstimator(cfg)


class TestDepthEstimator:
    def test_predict_shapes_and_finiteness(self, estimator):
        cfg = estimator.cfg
        images, cams = _scene_arrays(3, 32, 32, cfg.max_d)
        out = estimator.predict(images, cams)
        assert out["depth"].shape == (8, 8)
        assert out["depth_up"].shape == (32, 32)
        assert out["confidence"].shape == (8, 8)
        assert out["confidence_up"].shape == (32, 32)
        assert np.isfinite(out["depth"]).all() and np.isfinite(out["depth_up"]).all()
        # metric depth within the sweep's metric range
        assert (out["depth"] >= 0).all() and (out["depth"] <= 4.0 + 1e-3).all()
        assert out["runtime_s"] > 0

    def test_view_padding_fallback(self, estimator):
        """Fewer views than cfg.view_num pad with the reference (eval_pointcloud.py:115-121)."""
        images, cams = _scene_arrays(2, 32, 32, estimator.cfg.max_d)
        out = estimator.predict(images, cams)
        assert np.isfinite(out["depth"]).all()

    def test_small_input_pad_and_mask(self, estimator):
        """Inputs smaller than the bucket run padded and come back cropped."""
        images, cams = _scene_arrays(3, 24, 24, estimator.cfg.max_d)
        out = estimator.predict(images, cams)
        assert out["depth_up"].shape == (24, 24)
        assert out["depth"].shape == (6, 6)

    def test_program_reuse(self, estimator):
        """Repeat calls hit the same compiled program (no retrace)."""
        images, cams = _scene_arrays(3, 32, 32, estimator.cfg.max_d, seed=5)
        a = estimator.predict(images, cams)
        b = estimator.predict(images, cams)
        np.testing.assert_array_equal(a["depth"], b["depth"])

    def test_matches_pipeline_on_preprocessed(self, estimator):
        """preprocessed=True bypasses host prep and matches multi_view_forward."""
        import jax
        import jax.numpy as jnp

        from atvsnet_tpu.models.atvsnet import multi_view_forward, sweep_to_depth

        cfg = estimator.cfg
        images, cams = synthetic_scene(view_num=3, H=32, W=32, D=cfg.max_d, seed=7)
        out = estimator.predict(list(images[0]), list(cams[0]), preprocessed=True)
        ref = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg, out_prob_map=True))(
            estimator.params, jnp.asarray(images), jnp.asarray(cams)
        )
        ref_depth = np.asarray(sweep_to_depth(np.asarray(ref["depth"], np.float32)), np.float32)
        np.testing.assert_allclose(out["depth"], ref_depth[0, ..., 0], rtol=1e-5, atol=1e-5)


def test_two_view_estimator():
    cfg = PipelineConfig(view_num=2, max_d=8, max_h=32, max_w=32)
    est = DepthEstimator(cfg)
    images, cams = _scene_arrays(2, 32, 32, 8)
    out = est.predict(images, cams)
    assert out["depth"].shape == (8, 8) and np.isfinite(out["depth_up"]).all()
    assert "confidence" not in out


def test_bucket_registry_routing():
    """Two registered resolution buckets: requests route to the smallest that fits
    (VERDICT r2 item 8); both reuse the one shared param tree."""
    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    est = DepthEstimator(cfg)
    big = est.add_bucket(max_h=64, max_w=64)
    assert big.max_h == 64 and len(est.buckets) == 2

    # 32x32 input -> 32-bucket; 48x48 -> padded up into the 64-bucket;
    # 96x96 -> no bucket fits, downscaled into the largest (64)
    images, cams = _scene_arrays(3, 32, 32, cfg.max_d)
    assert est.predict(images, cams)["bucket"] == (32, 32)
    images, cams = _scene_arrays(3, 48, 48, cfg.max_d)
    out = est.predict(images, cams)
    assert out["bucket"] == (64, 64)
    assert out["depth"].shape == (12, 12)  # cropped back to the valid 48x48 region
    images, cams = _scene_arrays(3, 96, 96, cfg.max_d)
    assert est.predict(images, cams)["bucket"] == (64, 64)

    # re-registering is a no-op
    est.add_bucket(max_h=64, max_w=64)
    assert len(est.buckets) == 2


def test_preprocessed_off_bucket_raises():
    """preprocessed=True with a shape no bucket compiles raises a clear error
    instead of a silent recompile or a deep shape failure (round-2 advisor)."""
    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    est = DepthEstimator(cfg)
    images, cams = synthetic_scene(view_num=3, H=64, W=64, D=8, seed=0)
    with pytest.raises(ValueError, match="registered buckets"):
        est.predict(list(images[0]), list(cams[0]), preprocessed=True)


def test_mesh_estimator_matches_single_device():
    """mesh='data=1,view=2': the SPMD serving program matches the scan pipeline."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    single = DepthEstimator(cfg, seed=0)
    meshed = DepthEstimator(cfg, seed=0, mesh="data=1,view=2")
    images, cams = _scene_arrays(3, 32, 32, cfg.max_d)
    a = single.predict(images, cams)
    b = meshed.predict(images, cams)
    np.testing.assert_allclose(b["depth"], a["depth"], rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(b["confidence"], a["confidence"], rtol=2e-4, atol=1e-4)


def test_mesh_data_axis_predict():
    """mesh with data>1: the single-sample predict() is replicated over 'data' and
    still matches the single-device pipeline (review finding: this used to raise
    an unshardable-batch error, making the advertised data axis unusable)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    single = DepthEstimator(cfg, seed=0)
    meshed = DepthEstimator(cfg, seed=0, mesh="data=2,view=2")
    assert meshed.warmup() > 0
    images, cams = _scene_arrays(3, 32, 32, cfg.max_d)
    a = single.predict(images, cams)
    b = meshed.predict(images, cams)
    assert b["depth"].shape == a["depth"].shape  # sample 0 only, not the replicas
    np.testing.assert_allclose(b["depth"], a["depth"], rtol=2e-4, atol=1e-4)


def test_two_view_mesh_estimator():
    """A meshed estimator's two-view bucket shards the batch over 'data' instead of
    silently ignoring the mesh (review finding)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg = PipelineConfig(view_num=2, max_d=8, max_h=32, max_w=32)
    single = DepthEstimator(cfg, seed=0)
    meshed = DepthEstimator(cfg, seed=0, mesh="data=2,view=1")
    images, cams = _scene_arrays(2, 32, 32, 8)
    a = single.predict(images, cams)
    b = meshed.predict(images, cams)
    np.testing.assert_allclose(b["depth"], a["depth"], rtol=2e-4, atol=1e-4)


def test_bucket_key_covers_all_config_fields():
    """add_bucket() with a non-shape override registers a DISTINCT bucket instead of
    silently returning the old program (review finding: the key used to cover only
    the shape fields, so e.g. inverse_depth=False was served by the
    inverse_depth=True program)."""
    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    est = DepthEstimator(cfg)
    c2 = est.add_bucket(inverse_depth=False)
    assert c2.inverse_depth is False
    assert len(est.buckets) == 2


def test_quant_mode_gets_distinct_bucket_and_program():
    """Two configs differing ONLY in a numerics field (act_quant) register
    distinct buckets AND trace distinct programs — the quantized bucket's output
    actually differs (VERDICT r3 item 2: the env-var knobs were invisible to the
    bucket registry; as PipelineConfig fields delivered via numerics.install_scope
    they key both the jit cache and the bucket identity)."""
    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    est = DepthEstimator(cfg)
    c2 = est.add_bucket(act_quant="int8s", warp_quant="int8")
    assert c2.act_quant == "int8s" and len(est.buckets) == 2

    # same shape, same params/seed, different numerics config -> the served
    # depth must actually differ (if the policy never reached the trace, the
    # two programs would be identical)
    images, cams = _scene_arrays(3, 32, 32, cfg.max_d, seed=5)
    base = est.predict(images, cams)
    est_q = DepthEstimator(cfg.replace(act_quant="int8s", warp_quant="int8"))
    quant = est_q.predict(images, cams)
    assert np.isfinite(quant["depth"]).all()
    assert np.abs(base["depth"] - quant["depth"]).max() > 0


def test_predict_many_matches_predict():
    """predict_many batches distinct requests through one forward and each result
    equals its single-request predict() (BN is per-sample, so batching is exact)."""
    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    est = DepthEstimator(cfg)
    reqs = [_scene_arrays(3, 32, 32, cfg.max_d, seed=s) for s in (1, 2, 3)]
    many = est.predict_many(reqs)
    assert len(many) == 3
    for (images, cams), got in zip(reqs, many):
        one = est.predict(images, cams)
        np.testing.assert_allclose(got["depth"], one["depth"], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got["confidence"], one["confidence"], rtol=1e-5, atol=1e-5)
    assert est.predict_many([]) == []


def test_predict_many_mesh_pads_to_data_extent():
    """With data=2, an odd request count pads the batch and returns only the real
    results, each matching the single-device pipeline."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    single = DepthEstimator(cfg, seed=0)
    meshed = DepthEstimator(cfg, seed=0, mesh="data=2,view=2")
    reqs = [_scene_arrays(3, 32, 32, cfg.max_d, seed=s) for s in (4, 5, 6)]
    many = meshed.predict_many(reqs)
    assert len(many) == 3
    for (images, cams), got in zip(reqs, many):
        one = single.predict(images, cams)
        np.testing.assert_allclose(got["depth"], one["depth"], rtol=2e-4, atol=1e-4)


def test_preprocessed_view_padding():
    """preprocessed=True also pads missing views (review finding)."""
    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    est = DepthEstimator(cfg)
    images, cams = synthetic_scene(view_num=3, H=32, W=32, D=8, seed=11)
    out = est.predict(list(images[0][:2]), list(cams[0][:2]), preprocessed=True)
    assert np.isfinite(out["depth"]).all() and out["depth"].shape == (8, 8)


def test_warmup_include_pre_compiles_both_wrappers():
    """warmup(include_pre=True) executes BOTH the raw and the preprocessed
    wrapper so a preprocessed=True deployment pays no first-request compile
    (ADVICE r4); both wrappers stay functional afterwards."""
    cfg = PipelineConfig(view_num=2, max_d=8, max_h=32, max_w=32)
    est = DepthEstimator(cfg)
    t = est.warmup(include_pre=True)
    assert t > 0
    images, cams = _scene_arrays(2, 32, 32, cfg.max_d)
    out_raw = est.predict(images, cams)
    assert np.isfinite(out_raw["depth"]).all()
    # the pre wrapper expects NORMALIZED frames (what prepare_mvs_sample emits);
    # synthetic_scene's [0,1) floats stand in for them
    simg, scams = synthetic_scene(view_num=2, H=32, W=32, D=cfg.max_d, seed=7)
    out_pre = est.predict(list(simg[0]), list(scams[0]), preprocessed=True)
    assert np.isfinite(out_pre["depth"]).all()
