"""cfg.pair_batch equivalence: tower-batched CRM/refine passes == scanned passes.

pair_batch runs weight-shared sweeps through one set of convs with per-sweep BN
statistics (layers.batch_stat_norm groups). It is numerically the same computation —
only reduction/layout order differs — and is kept (default OFF) as a measured
alternative; see config.py for the end-to-end numbers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.models.atvsnet import multi_view_forward
from atvsnet_tpu.models.tvsnet import init_params, two_view_forward
from atvsnet_tpu.nn import layers as L
from tests._utils import synthetic_scene


def test_batch_stat_norm_groups_match_per_tower():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(6, 4, 5, 3).astype(np.float32))
    grouped = L.batch_stat_norm(x, groups=3)
    per_tower = jnp.concatenate(
        [L.batch_stat_norm(x[i * 2 : (i + 1) * 2]) for i in range(3)], axis=0
    )
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(per_tower), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("view_num,H,W,D", [(3, 32, 32, 8), (5, 64, 64, 16)])
def test_multiview_pair_batch_equivalence(view_num, H, W, D):
    cfg_b = PipelineConfig(view_num=view_num, max_d=D, max_h=H, max_w=W, pair_batch=True)
    cfg_s = cfg_b.replace(pair_batch=False)
    params = init_params(jax.random.PRNGKey(0), cfg_b)
    images, cams = synthetic_scene(view_num=view_num, H=H, W=W, D=D, seed=7)
    images, cams = jnp.asarray(images), jnp.asarray(cams)
    ob = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg_b))(params, images, cams)
    os_ = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg_s))(params, images, cams)
    for k in ("depth", "depth_up", "depth_agg_initial", "prob_volumes",
              "depth_views", "refined_prob_volumes"):
        np.testing.assert_allclose(
            np.asarray(ob[k], np.float32), np.asarray(os_[k], np.float32),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )


def test_twoview_pair_batch_equivalence():
    cfg_b = PipelineConfig(view_num=2, max_d=8, max_h=32, max_w=32, pair_batch=True)
    cfg_s = cfg_b.replace(pair_batch=False)
    params = init_params(jax.random.PRNGKey(0), cfg_b)
    images, cams = synthetic_scene(view_num=2, H=32, W=32, D=8, seed=7)
    images, cams = jnp.asarray(images), jnp.asarray(cams)
    ob = jax.jit(lambda p, i, c: two_view_forward(p, i, c, cfg_b))(params, images, cams)
    os_ = jax.jit(lambda p, i, c: two_view_forward(p, i, c, cfg_s))(params, images, cams)
    for k in ("depth", "depth_up", "depth_initial", "refined_prob_vol"):
        np.testing.assert_allclose(
            np.asarray(ob[k], np.float32), np.asarray(os_[k], np.float32),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )
