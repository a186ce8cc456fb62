"""Utility tests: checkpoint roundtrip + TF name map, xlsx writer, stage timer."""

import os
import zipfile

import numpy as np
import jax
import pytest

from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.models.tvsnet import init_params
from atvsnet_tpu.utils.ckpt import load_params, load_tf_npz, save_params, tf_name_map, _flatten
from atvsnet_tpu.utils.profiling import StageTimer
from atvsnet_tpu.utils.xlsx import Workbook

CFG = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


class TestCkpt:
    def test_save_load_roundtrip(self, params, tmp_path):
        p = str(tmp_path / "model.npz")
        save_params(p, params)
        loaded = load_params(p)
        flat_a = _flatten(params)
        flat_b = _flatten(loaded)
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_array_equal(flat_a[k], flat_b[k])

    def test_tf_name_map_covers_every_leaf(self, params):
        mapping = tf_name_map(params)
        flat = _flatten(params)
        assert set(mapping.values()) == set(flat.keys())
        # spot-check canonical names (reference scope discipline, network.py:196,313)
        assert "conv0_0/conv2d/kernel" in mapping
        assert "conv_b0_1_0/conv3d/kernel" in mapping
        assert "conv_b0_4_0/conv3d_transpose/kernel" in mapping
        assert "fusion1/kernel" in mapping
        assert "conv0_x_0/conv1/weights" in mapping
        assert "conv0_x_0/conv1/biases" in mapping
        assert "conv0_x_0/preact/beta" in mapping
        assert "attention_aggregate/attention_activation/weight_unique" in mapping
        assert "attention_aggregate_refine/attention_activation/weight_shared" in mapping
        assert "global_refine_3dconv4_0/conv3d_transpose/kernel" in mapping
        assert "global_refined_cost_vol/kernel" in mapping

    def test_load_tf_npz_renames(self, params, tmp_path):
        mapping = tf_name_map(params)
        flat = _flatten(params)
        tf_dump = {tf: np.ones_like(flat[path]) for tf, path in mapping.items()}
        p = str(tmp_path / "tf.npz")
        np.savez(p, **tf_dump)
        loaded = load_tf_npz(params, p, strict=True)
        for v in _flatten(loaded).values():
            np.testing.assert_array_equal(v, np.ones_like(v))


class TestXlsx:
    def test_writes_valid_zip_with_values(self, tmp_path):
        p = str(tmp_path / "x.xlsx")
        wb = Workbook(p)
        ws = wb.add_worksheet("5_view")
        ws.write(0, 1, "err")
        ws.write(1, 0, "mae")
        ws.write(1, 1, 0.1966)
        wb.close()
        with zipfile.ZipFile(p) as z:
            names = z.namelist()
            assert "xl/worksheets/sheet1.xml" in names
            xml = z.read("xl/worksheets/sheet1.xml").decode()
            assert "mae" in xml and "0.1966" in xml
            assert "5_view" in z.read("xl/workbook.xml").decode()

    def test_error_report(self, tmp_path):
        from atvsnet_tpu.eval.errors import save_error_report

        errors = np.arange(14, dtype=np.float32)
        save_error_report(str(tmp_path / "error.xlsx"), errors)
        assert os.path.exists(tmp_path / "error.xlsx")
        assert os.path.exists(tmp_path / "error.json")


class TestStageTimer:
    def test_accumulates(self):
        t = StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2
        assert s["a"]["total_s"] >= 0


class TestTrainStateCkpt:
    def test_roundtrip(self, params, tmp_path):
        import jax.numpy as jnp
        import optax

        from atvsnet_tpu.config import TrainConfig
        from atvsnet_tpu.models.train import TrainState, make_optimizer
        from atvsnet_tpu.utils.ckpt import load_train_state, save_train_state

        tx = make_optimizer(TrainConfig())
        state = TrainState(params, tx.init(params), jnp.asarray(7))
        p = str(tmp_path / "state.npz")
        save_train_state(p, state)
        restored = load_train_state(p, state)
        assert int(restored.step) == 7
        a = jax.tree_util.tree_leaves(state)
        b = jax.tree_util.tree_leaves(restored)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_structure_mismatch_rejected(self, params, tmp_path):
        import jax.numpy as jnp
        import optax

        from atvsnet_tpu.config import TrainConfig
        from atvsnet_tpu.models.train import TrainState, make_optimizer
        from atvsnet_tpu.utils.ckpt import load_train_state, save_train_state

        tx = make_optimizer(TrainConfig())
        state = TrainState(params, tx.init(params), jnp.asarray(0))
        p = str(tmp_path / "state.npz")
        save_train_state(p, state)
        bad = TrainState({"only": jnp.zeros(3)}, tx.init({"only": jnp.zeros(3)}), jnp.asarray(0))
        with pytest.raises(ValueError):
            load_train_state(p, bad)


class TestOrbax:
    def test_params_roundtrip(self, params, tmp_path):
        from atvsnet_tpu.utils.ckpt import load_params_orbax, save_params_orbax

        p = str(tmp_path / "orbax_ck")
        save_params_orbax(p, params)
        loaded = load_params_orbax(p, params)
        a, b = _flatten(params), _flatten(loaded)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


class TestConfigValidation:
    def test_bad_max_d_rejected(self):
        import pytest
        from atvsnet_tpu.config import PipelineConfig

        with pytest.raises(ValueError, match="max_d"):
            PipelineConfig(max_d=100)
        with pytest.raises(ValueError, match="multiples of 32"):
            PipelineConfig(max_h=100)
        with pytest.raises(ValueError, match="view_num"):
            PipelineConfig(view_num=1)
        PipelineConfig(max_d=8, max_h=32, max_w=32)  # valid: no raise


class TestLrSchedule:
    """TrainConfig.lr_schedule (training extension; the reference ships no
    training at all, SURVEY.md §0)."""

    def test_cosine_warmup_then_decay(self):
        import jax.numpy as jnp
        import optax

        from atvsnet_tpu.config import TrainConfig
        from atvsnet_tpu.models.train import make_optimizer

        tcfg = TrainConfig(learning_rate=1e-2, lr_schedule="cosine",
                           warmup_steps=3, decay_steps=12, lr_final_fraction=0.1,
                           grad_clip_norm=None)
        tx = make_optimizer(tcfg)
        params = {"w": jnp.zeros(())}
        state = tx.init(params)
        grads = {"w": jnp.ones(())}
        steps = []
        for _ in range(12):
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            steps.append(abs(float(updates["w"])))
        # warmup: step size grows; tail: decays well below the peak
        assert steps[0] < steps[2]
        peak = max(steps)
        assert steps[-1] < 0.5 * peak

    def test_constant_is_flat(self):
        import jax.numpy as jnp
        import optax

        from atvsnet_tpu.config import TrainConfig
        from atvsnet_tpu.models.train import make_optimizer

        tx = make_optimizer(TrainConfig(learning_rate=1e-2, grad_clip_norm=None))
        params = {"w": jnp.zeros(())}
        state = tx.init(params)
        grads = {"w": jnp.ones(())}
        steps = []
        for _ in range(5):
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            steps.append(abs(float(updates["w"])))
        # Adam's bias correction wiggles f32 step sizes at ~1e-5 relative even
        # under a constant LR; "flat" here means no schedule-scale variation
        assert max(steps) - min(steps) < 1e-3 * max(steps)

    def test_invalid_schedule_rejected(self):
        import pytest

        from atvsnet_tpu.config import TrainConfig

        with pytest.raises(ValueError):
            TrainConfig(lr_schedule="linear")
